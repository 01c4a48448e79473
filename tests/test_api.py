"""Public-API tests: FishTTS, VoiceProfile, singleton, streaming thresholds.

These mirror the behaviors the reference's (broken) test scripts intended to
cover (SURVEY §4): singleton identity, reference management counts, VoiceProfile
round-trip, streaming chunking — done hermetically on the tiny model.
"""

import numpy as np
import pytest

import fish_tts_tpu
from fish_tts_tpu import FishTTS, VoiceProfile
from fish_tts_tpu.testing import make_tiny_tts


@pytest.fixture(scope="module")
def tts():
    return make_tiny_tts()


def test_voice_profile_npy_roundtrip(tmp_path):
    codes = np.random.randint(0, 48, (4, 30)).astype(np.int64)
    p = VoiceProfile(codes=codes, text="hello", name="test")
    path = tmp_path / "voice.npy"
    p.save(path)
    loaded = VoiceProfile.load(path, text="hello")
    np.testing.assert_array_equal(loaded.codes, codes)
    assert loaded.codes.dtype == np.int64
    assert loaded.name == "voice"  # stem default (reference synthesizer.py:63)


def test_gura_profile_loads():
    """The reference's shipped voice profile loads bit-identically."""
    p = VoiceProfile.load("/root/reference/gura_voice.npy", text="x")
    assert p.codes.shape == (10, 661)
    assert p.codes.dtype == np.int64
    assert 0 <= p.codes[0].min() and p.codes[0].max() < 4096
    assert p.codes[1:].max() < 1024


def test_synthesize_returns_wav(tts):
    wav = tts.synthesize("Hello world", max_tokens=24)
    assert wav[:4] == b"RIFF"
    assert wav[8:12] == b"WAVE"
    # 44.1 kHz mono 16-bit
    import io
    import wave

    with wave.open(io.BytesIO(wav)) as wf:
        assert wf.getframerate() == 44100
        assert wf.getnchannels() == 1
        assert wf.getsampwidth() == 2
        # sample count = frames * frame_length
        assert wf.getnframes() % tts._vocoder_cfg.frame_length == 0


def test_synthesize_with_references(tts):
    codes = np.random.randint(0, 24, (tts._cfg.num_codebooks, 12)).astype(np.int64)
    codes[0] = np.random.randint(0, 48, 12)
    prof = VoiceProfile(codes=codes, text="ref text")
    wav = tts.synthesize("cloned", references=[prof], max_tokens=16)
    assert wav[:4] == b"RIFF"


def test_reference_management(tts):
    tts.clear_references()
    assert tts.num_references == 0
    codes = np.random.randint(0, 24, (tts._cfg.num_codebooks, 8)).astype(np.int64)
    p1 = VoiceProfile(codes=codes, text="a", name="p1")
    p2 = VoiceProfile(codes=codes, text="b", name="p2")
    tts.set_references([p1])
    assert tts.num_references == 1
    assert tts._engine.has_prefix
    tts.add_reference(p2)
    assert tts.num_references == 2
    assert [p.name for p in tts.get_references()] == ["p1", "p2"]
    tts.clear_references()
    assert tts.num_references == 0
    assert not tts._engine.has_prefix


def test_prefix_cache_used_in_synthesize(tts):
    codes = np.random.randint(0, 24, (tts._cfg.num_codebooks, 8)).astype(np.int64)
    tts.set_references([VoiceProfile(codes=codes, text="ref")])
    wav = tts.synthesize("with prefix", max_tokens=16)
    assert wav[:4] == b"RIFF"
    tts.clear_references()


def test_streaming_yields_pcm_chunks(tts):
    chunks = list(tts.synthesize_stream("stream me", max_tokens=32))
    assert len(chunks) >= 1
    fl = tts._vocoder_cfg.frame_length
    # Each chunk is int16 PCM of whole frames; first chunk >= min_first_chunk
    # frames unless generation ended first.
    sizes = [len(c) // 2 for c in chunks]
    assert all(s % fl == 0 for s in sizes)
    total_frames = sum(s // fl for s in sizes)
    assert total_frames >= 1
    # Streaming includes the EOS frame (reference quirk): streaming total can
    # exceed batch mode's (which strips the final frame).


def test_streaming_first_chunk_threshold(tts):
    chunks = list(
        tts.synthesize_stream("threshold test", max_tokens=40, min_first_chunk=10)
    )
    fl = tts._vocoder_cfg.frame_length
    if len(chunks) >= 2:  # generation long enough to flush twice
        first_frames = len(chunks[0]) // 2 // fl
        assert first_frames >= 10


def test_synthesize_batch_tolerates_empty_stream(tts, monkeypatch):
    """A stream that EOS'd on its prefill frame yields an empty (header-only)
    WAV; the other streams' audio is NOT discarded.  All-empty still raises."""
    real = tts._engine.generate_batch

    def one_empty(texts, **kw):
        out = real(texts, **kw)
        out[0] = out[0][:, :0]
        return out

    monkeypatch.setattr(tts._engine, "generate_batch", one_empty)
    wavs = tts.synthesize_batch(["gone", "kept"], max_tokens=8)
    assert wavs[0][:4] == b"RIFF" and len(wavs[0]) == 44  # header only
    assert wavs[1][:4] == b"RIFF" and len(wavs[1]) > 44

    monkeypatch.setattr(
        tts._engine, "generate_batch",
        lambda texts, **kw: [c[:, :0] for c in real(texts, **kw)],
    )
    with pytest.raises(RuntimeError, match="No audio"):
        tts.synthesize_batch(["a", "b"], max_tokens=8)


def test_synthesize_batch_stream(tts):
    """Batched streaming: every yield is a length-B list of PCM/None; every
    stream eventually produces whole-frame audio; total per-stream frames
    are at least the single-frame minimum."""
    fl = tts._vocoder_cfg.frame_length
    texts = ["first stream text", "second"]
    got_frames = [0, 0]
    rounds = 0
    for chunk_list in tts.synthesize_batch_stream(texts, max_tokens=28):
        rounds += 1
        assert len(chunk_list) == 2
        for b, pcm in enumerate(chunk_list):
            if pcm is None:
                continue
            assert len(pcm) > 0 and (len(pcm) // 2) % fl == 0
            got_frames[b] += len(pcm) // 2 // fl
    assert rounds >= 1
    assert all(f >= 1 for f in got_frames)


def test_generate_batch_stream_matches_batch_frames(tts):
    """The streaming variant yields exactly the frames generate_batch
    collects (same seed), plus each stream's final frame (stripped in batch
    mode per the reference quirk, streamed per inference.py:271-274) — even
    though batch mode decodes in large chunks and streaming in small ones
    (per-frame keys are fold_in(base, step), chunk-schedule invariant)."""
    texts = ["alpha", "beta longer"]
    eng = tts._engine
    # 50 frames: batch mode uses one rounded 60-frame chunk, streaming uses
    # 20-frame chunks — genuinely different schedules
    eng.reseed(77)
    batch = eng.generate_batch(texts, max_new_tokens=50)
    eng.reseed(77)
    acc = [[] for _ in texts]
    for chunk in eng.generate_batch_stream(texts, max_new_tokens=50):
        for b, codes in enumerate(chunk):
            if codes is not None:
                acc[b].append(codes)
    streamed = [np.concatenate(a, axis=1) for a in acc]
    for b in range(len(texts)):
        assert streamed[b].shape[1] == batch[b].shape[1] + 1  # EOS/final frame
        np.testing.assert_array_equal(streamed[b][:, :-1], batch[b])


def test_single_stream_and_batch_mode_sample_identically(tts):
    """generate_long streaming (20-frame chunks) and non-streaming
    (batch_chunk-sized chunks) sample the same code sequence for the same
    seed; batch mode strips the final frame (inference.py:839)."""
    eng = tts._engine
    eng.reseed(42)
    batch = [
        r.codes for r in eng.generate_long("same codes", max_new_tokens=50)
        if r.action == "sample"
    ][0]
    eng.reseed(42)
    streamed = np.concatenate([
        r.codes for r in eng.generate_long(
            "same codes", max_new_tokens=50, streaming=True
        )
        if r.action == "sample"
    ], axis=1)
    assert streamed.shape[1] == batch.shape[1] + 1
    np.testing.assert_array_equal(streamed[:, :-1], batch)


def test_schedule_invariance_across_kv_buckets():
    """Streaming and batch schedules compute kv buckets from different
    dispatch bounds; with a small kv_bucket_step the same frame really does
    decode under a different attention read length R in the two modes.
    Codes must STILL be bit-identical (kv-bucket invariance composed with
    the fold_in key scheme — the property the docs claim)."""
    import jax
    import jax.numpy as jnp

    from fish_tts_tpu.config import EngineConfig, TINY_CONFIG
    from fish_tts_tpu.engine.generate import GenerationEngine, _kv_bucket
    from fish_tts_tpu.models import dual_ar
    from fish_tts_tpu.models.tokenizer import (
        FishTokenizer, tiny_special_tokens, write_tiny_vocab,
    )
    import tempfile
    from pathlib import Path

    d = Path(tempfile.mkdtemp())
    write_tiny_vocab(d / "tokenizer.tiktoken")
    tok = FishTokenizer(d / "tokenizer.tiktoken", tiny_special_tokens(48))
    params = dual_ar.init_params(
        jax.random.PRNGKey(3), TINY_CONFIG, dtype=jnp.float32
    )
    ecfg = EngineConfig(
        prompt_buckets=(32,), decode_chunk=8, first_chunk=4,
        batch_chunk=24, kv_bucket_step=16,
    )
    # sanity: the two schedules' bucket bounds genuinely differ somewhere
    cap = TINY_CONFIG.max_seq_len
    assert any(
        _kv_bucket(20 + disp + 8, 16, cap) != _kv_bucket(20 + disp + 24, 16, cap)
        for disp in range(0, 40, 8)
    )
    eng = GenerationEngine(params, TINY_CONFIG, tok, engine_cfg=ecfg, seed=13)
    batch = [
        r.codes for r in eng.generate_long("bucket cross", max_new_tokens=40)
        if r.action == "sample"
    ][0]
    eng.reseed(13)
    streamed = np.concatenate([
        r.codes for r in eng.generate_long(
            "bucket cross", max_new_tokens=40, streaming=True
        )
        if r.action == "sample"
    ], axis=1)
    np.testing.assert_array_equal(streamed[:, :-1], batch)


def test_context_buffer_windowing():
    """_ContextBuffer prepends exactly the last `context_frames` frames and
    trims history it can never serve again."""
    from fish_tts_tpu.synthesizer import _ContextBuffer

    K = 3

    def frames(lo, hi):  # identifiable codes: frame index in every row
        return np.tile(np.arange(lo, hi)[None], (K, 1))

    cb = _ContextBuffer(4)
    out, ctx = cb.take(frames(0, 3))
    assert ctx == 0
    np.testing.assert_array_equal(out, frames(0, 3))

    out, ctx = cb.take(frames(3, 10))
    assert ctx == 3  # only 3 frames of history exist yet
    np.testing.assert_array_equal(out, frames(0, 10))

    out, ctx = cb.take(frames(10, 13))
    assert ctx == 4  # full window now
    np.testing.assert_array_equal(out, frames(6, 13))

    # history never grows beyond what a window can use
    assert sum(h.shape[1] for h in cb._history) <= 4 + 7

    cb0 = _ContextBuffer(0)
    out, ctx = cb0.take(frames(0, 5))
    assert ctx == 0
    out, ctx = cb0.take(frames(5, 9))
    assert ctx == 0  # context disabled reproduces independent chunks
    np.testing.assert_array_equal(out, frames(5, 9))


def test_streaming_context_decode_is_prefix_exact(tts):
    """The codec is causal, so decoding a chunk with its full left context
    prepended and trimming the overlap reproduces the jointly-decoded
    waveform — the property the synthesize_stream(context_frames=...) path
    relies on (the reference decodes chunks independently and clicks)."""
    cfg = tts._vocoder_cfg
    rng = np.random.RandomState(0)
    codes = rng.randint(0, 24, (cfg.num_codebooks, 40)).astype(np.int64)
    codes[0] = rng.randint(0, 48, 40)
    fl = cfg.frame_length
    full = tts._decode_codes(codes)

    out = []
    for start, n in ((0, 10), (10, 15), (25, 15)):
        audio, m = tts._decode_codes_async(codes[:, : start + n])
        arr = np.asarray(audio, np.float32)[0, 0][start * fl:(start + n) * fl]
        out.append(arr)
    streamed = np.concatenate(out)
    np.testing.assert_allclose(streamed, full, atol=1e-4, rtol=1e-3)


def test_streaming_context_frames_total_audio(tts):
    """context_frames only changes boundary quality, never the amount or
    framing of the audio: same total samples as the context-free stream for
    the same token sequence."""
    def run(ctx):
        tts._engine.reseed(123)
        chunks = list(tts.synthesize_stream(
            "context stream check", max_tokens=36, context_frames=ctx
        ))
        return b"".join(chunks)

    base = run(0)
    with_ctx = run(8)
    assert len(with_ctx) == len(base) > 0


def test_singleton_identity(monkeypatch):
    import fish_tts_tpu.synthesizer as synth_mod

    synth_mod.reset_instance()
    created = []
    real_init = synth_mod.FishTTS.__init__

    def fake_init(self, *a, **k):
        from fish_tts_tpu.testing import make_tiny_bundle

        k["_testing_bundle"] = make_tiny_bundle()
        k["warmup"] = False
        created.append(1)
        real_init(self, *a, **k)

    monkeypatch.setattr(synth_mod.FishTTS, "__init__", fake_init)
    a = synth_mod.get_instance()
    b = synth_mod.get_instance()
    assert a is b
    assert len(created) == 1
    synth_mod.reset_instance()
    c = synth_mod.get_instance()
    assert c is not a
    synth_mod.reset_instance()


def test_encode_reference_roundtrip(tts):
    """WAV in -> VoiceProfile with (num_codebooks, n_frames) codes."""
    from fish_tts_tpu.utils.audio import to_wav_bytes

    fl = tts._vocoder_cfg.frame_length
    audio = np.sin(np.linspace(0, 440 * 2 * np.pi, 3 * fl)).astype(np.float32) * 0.5
    wav = to_wav_bytes(audio)
    prof = tts.encode_reference(wav, "test transcript")
    assert prof.codes.shape == (tts._vocoder_cfg.num_codebooks, 3)
    assert prof.codes.dtype == np.int64
    assert prof.text == "test transcript"
    assert prof.codes[0].max() < tts._vocoder_cfg.semantic_codebook_size
    assert prof.codes[1:].max() < tts._vocoder_cfg.residual_codebook_size


def test_synthesize_batch(tts):
    """Batched serving: every text gets its own WAV."""
    wavs = tts.synthesize_batch(["one", "two three", "four"], max_tokens=16)
    assert len(wavs) == 3
    for w in wavs:
        assert w[:4] == b"RIFF"
    assert tts.synthesize_batch([]) == []


def test_vocoder_long_utterance_buckets(tts, monkeypatch):
    """Beyond the static bucket list, vocoder decode lengths keep doubling —
    a long non-streaming synthesize compiles O(log n) variants, never one
    per exact length."""
    from fish_tts_tpu import synthesizer as synth_mod

    assert synth_mod._vocoder_bucket(2048) == 2048
    assert synth_mod._vocoder_bucket(2049) == 4096
    assert synth_mod._vocoder_bucket(5000) == 8192
    # Drive the real decode path through a doubled bucket by shrinking the
    # static list (a true >2048-frame decode is too slow for a CPU test).
    monkeypatch.setattr(synth_mod, "_VOCODER_BUCKETS", (4, 8))
    K = tts._vocoder_cfg.num_codebooks
    codes = np.random.randint(0, 24, (K, 11)).astype(np.int64)
    codes[0] = np.random.randint(0, 48, 11)
    audio = tts._decode_codes(codes)  # bucket 16 (8 -> 16), trimmed to 11
    assert len(audio) == 11 * tts._vocoder_cfg.frame_length


def test_public_exports():
    assert set(fish_tts_tpu.__all__) == {
        "FishTTS", "VoiceProfile", "get_instance", "reset_instance"
    }


def test_generate_long_num_samples(tts):
    """num_samples=N yields N (sample..., next) groups (reference
    inference.py:747, 799-800, 846)."""
    responses = list(
        tts._engine.generate_long(
            "multi", num_samples=3, max_new_tokens=8,
            temperature=0.7, top_p=0.8, repetition_penalty=1.1,
        )
    )
    nexts = [r for r in responses if r.action == "next"]
    samples = [r for r in responses if r.action == "sample"]
    assert len(nexts) == 3
    assert len(samples) >= 3
    # actions group as sample+ next, repeated
    actions = [r.action for r in responses]
    assert actions[-1] == "next"
    # every "next" is preceded by at least one "sample"
    for i, a in enumerate(actions):
        if a == "next":
            assert actions[i - 1] == "sample"


def test_synthesize_batch_uses_cached_references(tts):
    """Batched synthesis stays conditioned on references set via
    set_references by forking the cached KV prefix across the batch — the
    reference blocks are never re-passed (and never re-prefilled) per call."""
    from unittest.mock import patch

    codes = np.random.randint(0, 24, (tts._cfg.num_codebooks, 8)).astype(np.int64)
    codes[0] = np.random.randint(0, 48, 8)
    tts.set_references([VoiceProfile(codes=codes, text="batch ref")])
    try:
        with patch.object(
            tts._engine, "generate_batch", wraps=tts._engine.generate_batch
        ) as spy:
            wavs = tts.synthesize_batch(["conditioned", "streams"], max_tokens=12)
        assert len(wavs) == 2
        _, kwargs = spy.call_args
        assert kwargs["use_prefix_cache"] is True
        assert kwargs["prompt_text"] == []  # prefix KV carries the voice
        assert kwargs["prompt_tokens"] == []
        # explicit references still override the cached prefix
        with patch.object(
            tts._engine, "generate_batch", wraps=tts._engine.generate_batch
        ) as spy:
            tts.synthesize_batch(
                ["explicit"], max_tokens=12,
                references=[VoiceProfile(codes=codes, text="batch ref")],
            )
        _, kwargs = spy.call_args
        assert kwargs["use_prefix_cache"] is False
        assert kwargs["prompt_text"] == ["batch ref"]
    finally:
        tts.clear_references()


def test_streaming_rejects_unknown_kwargs(tts):
    """Unknown kwargs raise TypeError — the reference's stale ``pipeline=``
    **kwargs swallow (synthesizer.py:489) is deliberately not replicated, so
    a typo'd parameter (e.g. max_new_tokens instead of max_tokens) can never
    silently get its default."""
    with pytest.raises(TypeError):
        next(tts.synthesize_stream("x", max_new_tokens=8))
    with pytest.raises(TypeError):
        next(tts.synthesize_stream("x", pipeline=True))
    with pytest.raises(TypeError):
        next(tts.synthesize_batch_stream(["x"], pipeline=True))
    with pytest.raises(TypeError):
        next(tts.synthesize_batch_stream(["x"], rep_penalty=1.2))
    # the explicit spellings still work
    chunks = list(tts.synthesize_stream(
        "explicit kwargs", max_tokens=16, temperature=0.7, top_p=0.8,
        repetition_penalty=1.1,
    ))
    assert chunks


def test_fp16_precision_public_path():
    """precision='fp16' drives the whole public path.  Documented trade-off:
    fp16 has no TPU matmul advantage over bf16 and a narrower exponent; it
    exists for API parity with the reference's dtype surface
    (synthesizer.py:141) and must at least produce audio."""
    from fish_tts_tpu.synthesizer import FishTTS
    from fish_tts_tpu.testing import make_tiny_bundle

    import jax.numpy as jnp

    tts = FishTTS(precision="fp16", warmup=False,
                  _testing_bundle=make_tiny_bundle())
    assert tts._dtype == jnp.float16
    assert tts.precision == "fp16"
    wav = tts.synthesize("fp16 path", max_tokens=12)
    assert wav[:4] == b"RIFF"


def test_int8_precision_public_path():
    """precision='int8' drives the whole public path (XLA int8 on CPU)."""
    from fish_tts_tpu.synthesizer import FishTTS
    from fish_tts_tpu.testing import make_tiny_bundle
    from fish_tts_tpu.utils.quantize import is_quantized

    tts = FishTTS(precision="int8", warmup=False,
                  _testing_bundle=make_tiny_bundle())
    assert is_quantized(tts._engine.params["layers"]["wqkv"])
    wav = tts.synthesize("int8 path", max_tokens=16)
    assert wav[:4] == b"RIFF"
    chunks = list(tts.synthesize_stream("int8 stream", max_tokens=24))
    assert chunks


def test_engine_config_passthrough():
    """Serving knobs reach the engine through the public constructor."""
    from fish_tts_tpu.config import EngineConfig
    from fish_tts_tpu.synthesizer import FishTTS
    from fish_tts_tpu.testing import make_tiny_bundle

    cfg = EngineConfig(decode_chunk=8, sample_top_k=0)
    tts = FishTTS(precision="fp32", warmup=False, engine_config=cfg,
                  _testing_bundle=make_tiny_bundle())
    assert tts._engine.engine_cfg.decode_chunk == 8
    assert tts._engine.engine_cfg.sample_top_k == 0
    assert tts.synthesize("knobs", max_tokens=12)[:4] == b"RIFF"


def test_serve_session_audio(tts):
    """Top-level audio serving: staggered requests through FishTTS.serve
    produce whole-frame PCM whose per-request sample count matches the LM
    frames emitted, and the whole path is deterministic under pinned
    seeds (two identical sessions -> byte-identical audio)."""
    fl = tts._vocoder_cfg.frame_length

    def drive():
        sess = tts.serve(slots=2)
        rids = [sess.submit(f"serve req {i}", max_new_tokens=m, seed=60 + i)
                for i, m in enumerate((44, 39))]
        events = []
        for _ in range(2):  # get the pool genuinely mid-flight...
            events += sess.step()
        # ...then admit a third request into the running pool
        rids.append(sess.submit("late audio joiner",
                                max_new_tokens=11, seed=77))
        events += list(sess.run())
        pcm: dict[int, list[bytes]] = {}
        frames_total: dict[int, int] = {}
        done = set()
        for ev in events:
            pcm.setdefault(ev.request_id, []).append(ev.pcm)
            frames_total[ev.request_id] = ev.frames_total
            if ev.done:
                done.add(ev.request_id)
        assert set(rids) == done
        return {r: b"".join(pcm[r]) for r in rids}, frames_total

    audio, frames_total = drive()
    for rid, buf in audio.items():
        n_samples = len(buf) // 2
        assert n_samples == frames_total[rid] * fl  # every frame vocoded
        assert n_samples > 0
    # deterministic end to end: same seeds -> byte-identical audio
    audio2, _ = drive()
    assert {r: a for r, a in audio.items()} == audio2


def test_serve_session_cancel(tts):
    """Cancelling an audio-serving request stops its events (no done ever
    arrives), frees capacity for the queued successor, and co-tenant audio
    is byte-identical to an undisturbed session's."""
    def drive(do_cancel):
        sess = tts.serve(slots=1)
        r_keep = sess.submit("kept request", max_new_tokens=28, seed=91)
        events = list(sess.run())
        # second wave: one to cancel mid-flight, one queued successor
        r_gone = sess.submit("cancel me", max_new_tokens=40, seed=92)
        r_next = sess.submit("successor", max_new_tokens=9, seed=93)
        cancelled = not do_cancel
        while sess.busy:
            for ev in sess.step():
                events.append(ev)
                if not cancelled and ev.request_id == r_gone and ev.pcm:
                    sess.cancel(r_gone)
                    cancelled = True
        pcm: dict[int, bytearray] = {}
        done = set()
        for ev in events:
            pcm.setdefault(ev.request_id, bytearray()).extend(ev.pcm)
            if ev.done:
                done.add(ev.request_id)
        return (r_keep, r_gone, r_next), pcm, done

    (k1, g1, n1), pcm1, done1 = drive(do_cancel=True)
    assert g1 not in done1 and {k1, n1} <= done1
    assert len(pcm1.get(g1, b"")) < 40 * tts._vocoder_cfg.frame_length * 2
    (k2, g2, n2), pcm2, done2 = drive(do_cancel=False)
    assert {k2, g2, n2} <= done2
    # co-tenant + successor audio unaffected by the cancellation
    assert bytes(pcm1[k1]) == bytes(pcm2[k2])
    assert bytes(pcm1[n1]) == bytes(pcm2[n2])
    # what WAS delivered before the cancel is a prefix of the full stream
    assert bytes(pcm2[g2]).startswith(bytes(pcm1.get(g1, b"")))


def test_serve_requires_vocoder():
    from fish_tts_tpu.synthesizer import FishTTS
    from fish_tts_tpu.testing import make_tiny_bundle

    bundle = make_tiny_bundle()
    tts = FishTTS(precision="fp32", warmup=False,
                  _testing_bundle=(bundle[0], bundle[1], bundle[2],
                                   None, None))
    with pytest.raises(RuntimeError, match="vocoder"):
        tts.serve()


def test_serve_vocoder_device_disaggregation(tts):
    """Disaggregated serving: the pool vocoder on a SECOND device produces
    byte-identical audio to the single-device session (placement must not
    change math), with vocoder state resident off the LM device."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")

    def drive(vdev):
        sess = tts.serve(slots=2, vocoder_device=vdev)
        rids = [sess.submit(f"disagg {i}", max_new_tokens=m, seed=80 + i)
                for i, m in enumerate((40, 23))]
        pcm: dict[int, bytearray] = {}
        done = set()
        for ev in sess.run():
            pcm.setdefault(ev.request_id, bytearray()).extend(ev.pcm)
            if ev.done:
                done.add(ev.request_id)
        assert set(rids) == done
        if vdev is not None:
            assert all(
                d == vdev
                for leaf in jax.tree.leaves(sess._state)
                for d in leaf.devices()
            )
        return {i: bytes(pcm[r]) for i, r in enumerate(rids)}

    base = drive(None)
    disagg = drive(jax.devices()[1])
    assert base == disagg


def test_vocoderless_stream_raises_clean_error():
    """An instance loaded without codec weights must raise the same clean
    'Vocoder not loaded' from the default STATEFUL streaming path as the
    context path does (regression: it died tracing init_decode_state(None)
    with a TypeError)."""
    from fish_tts_tpu.synthesizer import FishTTS
    from fish_tts_tpu.testing import make_tiny_bundle

    cfg, params, tok, vcfg, _ = make_tiny_bundle(7)
    tts = FishTTS(device="cpu", precision="fp32", warmup=False,
                  _testing_bundle=(cfg, params, tok, vcfg, None))
    with pytest.raises(RuntimeError, match="Vocoder not loaded"):
        list(tts.synthesize_stream("hi", max_tokens=4))
    with pytest.raises(RuntimeError, match="Vocoder not loaded"):
        for _ in tts.synthesize_batch_stream(["hi", "ho"], max_tokens=4):
            pass


def test_device_cpu_after_foreign_backend_raises(monkeypatch):
    """device='cpu' cannot take effect once the process backend is live on
    an accelerator — the constructor must fail loudly instead of silently
    dispatching the 'cpu' instance to the accelerator."""
    import jax

    from fish_tts_tpu.synthesizer import FishTTS
    from fish_tts_tpu.testing import make_tiny_bundle

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    with pytest.raises(RuntimeError, match="already.*initialized"):
        FishTTS(device="cpu", precision="fp32", warmup=False,
                _testing_bundle=make_tiny_bundle(8))


def test_serve_warmup_compiles_pool_without_leaking_events(tts):
    """serve(warmup=True) drains its own tiny request: the session comes
    back idle, no warmup audio leaks to the caller, and a real request
    still serves normally."""
    sess = tts.serve(slots=1, warmup=True)
    assert not sess.busy
    rid = sess.submit("after warmup", max_new_tokens=4, seed=5)
    events = list(sess.run())
    assert {ev.request_id for ev in events} == {rid}
    assert sum(len(ev.pcm) for ev in events) > 0
