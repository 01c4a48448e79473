"""Decode-engine tests on the tiny config (CPU, random weights).

Covers the behaviors SURVEY §4 lists as the real test surface: prefill/step
KV-cache equivalence, EOS handling, frame layout, determinism under a fixed
key, and the window-buffer quirks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_tts_tpu.config import TINY_CONFIG
from fish_tts_tpu.engine import decode
from fish_tts_tpu.models import dual_ar
from fish_tts_tpu.models.dual_ar import TokenIds

CFG = TINY_CONFIG
IDS = TokenIds(semantic_begin=400, semantic_end=447, im_end=5)


@pytest.fixture(scope="module")
def setup():
    params = dual_ar.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    rope = dual_ar.make_rope_tables(CFG)
    return params, rope


def _scalar(x):
    return jnp.float32(x)


def _prompt(T, bucket=16, seed=0):
    rng = np.random.RandomState(seed)
    p = np.zeros((1, 1 + CFG.num_codebooks, bucket), np.int32)
    p[0, 0, :T] = rng.randint(0, 300, T)
    return jnp.asarray(p), jnp.asarray([T], jnp.int32)


def test_prefill_and_decode_shapes(setup):
    params, rope = setup
    state = decode.init_state(params, CFG, batch=1)
    prompt, lengths = _prompt(12)
    state, first = decode.prefill(
        params, rope, state, prompt, lengths, jax.random.PRNGKey(1),
        _scalar(0.7), _scalar(0.8), _scalar(1.1), cfg=CFG, ids=IDS,
    )
    assert first.shape == (1, 1 + CFG.num_codebooks)
    assert int(state["pos"][0]) == 12
    state, frames, emitted = decode.decode_chunk(
        params, rope, state, jax.random.PRNGKey(2),
        _scalar(0.7), _scalar(0.8), _scalar(1.1),
        cfg=CFG, ids=IDS, num_frames=6,
    )
    assert frames.shape == (1, 6, 1 + CFG.num_codebooks)
    assert emitted.shape == (1, 6)
    assert int(state["pos"][0]) == 18
    # row 1 (semantic code) in range, residual rows within residual size
    assert frames[:, :, 1].max() < CFG.codebook_size
    assert frames[:, :, 2:].max() < CFG.residual_codebook_size
    assert frames.min() >= 0


def test_determinism_under_fixed_key(setup):
    params, rope = setup

    def run():
        state = decode.init_state(params, CFG, batch=1)
        prompt, lengths = _prompt(10)
        state, first = decode.prefill(
            params, rope, state, prompt, lengths, jax.random.PRNGKey(7),
            _scalar(0.7), _scalar(0.8), _scalar(1.1), cfg=CFG, ids=IDS,
        )
        state, frames, _ = decode.decode_chunk(
            params, rope, state, jax.random.PRNGKey(8),
            _scalar(0.7), _scalar(0.8), _scalar(1.1),
            cfg=CFG, ids=IDS, num_frames=8,
        )
        return np.asarray(first), np.asarray(frames)

    f1, fr1 = run()
    f2, fr2 = run()
    np.testing.assert_array_equal(f1, f2)
    np.testing.assert_array_equal(fr1, fr2)


def test_padding_invariance_of_prefill(setup):
    """A prompt padded to a larger bucket must produce the same first-frame
    logits path (same sampled frame under the same key)."""
    params, rope = setup

    def run(bucket):
        state = decode.init_state(params, CFG, batch=1)
        prompt, lengths = _prompt(9, bucket=bucket)
        state, first = decode.prefill(
            params, rope, state, prompt, lengths, jax.random.PRNGKey(3),
            _scalar(0.7), _scalar(0.8), _scalar(1.1), cfg=CFG, ids=IDS,
        )
        return np.asarray(first)

    np.testing.assert_array_equal(run(16), run(32))


def test_decode_after_padding_matches_unpadded(setup):
    """Decoded continuation is identical whether the prompt was padded to 16
    or 32: stale padded KV slots must never be attended."""
    params, rope = setup

    def run(bucket):
        state = decode.init_state(params, CFG, batch=1)
        prompt, lengths = _prompt(9, bucket=bucket)
        state, _ = decode.prefill(
            params, rope, state, prompt, lengths, jax.random.PRNGKey(3),
            _scalar(0.7), _scalar(0.8), _scalar(1.1), cfg=CFG, ids=IDS,
        )
        state, frames, _ = decode.decode_chunk(
            params, rope, state, jax.random.PRNGKey(4),
            _scalar(0.7), _scalar(0.8), _scalar(1.1),
            cfg=CFG, ids=IDS, num_frames=10,
        )
        return np.asarray(frames)

    np.testing.assert_array_equal(run(16), run(32))


def test_eos_freezes_stream(setup):
    """Force EOS by making im_end the argmax: all later frames are masked."""
    params, rope = setup
    # Craft params whose LM head strongly favors im_end: zero embeddings
    # except a huge bias toward token IDS.im_end via the tied head.
    p = jax.tree_util.tree_map(lambda x: x, params)
    emb = np.zeros(params["embeddings"].shape, np.float32)
    emb[IDS.im_end] = 1.0  # tied head => logits = h @ emb.T peaks at im_end
    # make hidden states positive-ish: identity-ish won't hold, so just check
    # the done-flag mechanics with the real params instead: run until EOS by
    # sampling with temperature ~0 over crafted logits is brittle here; use
    # the state-machine directly.
    state = decode.init_state(params, CFG, batch=1)
    prompt, lengths = _prompt(8)
    state, _ = decode.prefill(
        params, rope, state, prompt, lengths, jax.random.PRNGKey(1),
        _scalar(0.7), _scalar(0.8), _scalar(1.1), cfg=CFG, ids=IDS,
    )
    # Mark the stream done manually and verify chunk decode emits nothing
    # and does not advance pos.
    state["done"] = jnp.ones((1,), bool)
    pos_before = int(state["pos"][0])
    state, frames, emitted = decode.decode_chunk(
        params, rope, state, jax.random.PRNGKey(2),
        _scalar(0.7), _scalar(0.8), _scalar(1.1),
        cfg=CFG, ids=IDS, num_frames=4,
    )
    assert not emitted.any()
    assert int(state["pos"][0]) == pos_before


def test_prefix_continuation_matches_joint_prefill(setup):
    """Prefilling [A] then [B at offset len(A)] must equal prefilling [A;B]:
    this is the KV-prefix-reuse contract behind set_references."""
    params, rope = setup
    promptA, lenA = _prompt(6, bucket=8, seed=1)
    promptB, lenB = _prompt(5, bucket=8, seed=2)

    # Joint prefill of A;B
    joint = np.zeros((1, 1 + CFG.num_codebooks, 16), np.int32)
    joint[:, :, :6] = np.asarray(promptA)[:, :, :6]
    joint[:, :, 6:11] = np.asarray(promptB)[:, :, :5]
    state_j = decode.init_state(params, CFG, batch=1)
    state_j, first_j = decode.prefill(
        params, rope, state_j, jnp.asarray(joint), jnp.asarray([11], jnp.int32),
        jax.random.PRNGKey(9), _scalar(0.7), _scalar(0.8), _scalar(1.1),
        cfg=CFG, ids=IDS,
    )

    # Split prefill: A first, then B at offset 6
    state_s = decode.init_state(params, CFG, batch=1)
    state_s, _ = decode.prefill(
        params, rope, state_s, promptA, lenA, jax.random.PRNGKey(11),
        _scalar(0.7), _scalar(0.8), _scalar(1.1), cfg=CFG, ids=IDS,
    )
    state_s, first_s = decode.prefill(
        params, rope, state_s, promptB, lenB, jax.random.PRNGKey(9),
        _scalar(0.7), _scalar(0.8), _scalar(1.1), cfg=CFG, ids=IDS,
    )
    np.testing.assert_array_equal(np.asarray(first_j), np.asarray(first_s))
    assert int(state_j["pos"][0]) == int(state_s["pos"][0]) == 11


def test_window_buffer_records_frames(setup):
    params, rope = setup
    state = decode.init_state(params, CFG, batch=1)
    prompt, lengths = _prompt(8)
    state, _ = decode.prefill(
        params, rope, state, prompt, lengths, jax.random.PRNGKey(1),
        _scalar(0.7), _scalar(0.8), _scalar(1.1), cfg=CFG, ids=IDS,
    )
    state, frames, _ = decode.decode_chunk(
        params, rope, state, jax.random.PRNGKey(2),
        _scalar(0.7), _scalar(0.8), _scalar(1.1),
        cfg=CFG, ids=IDS, num_frames=5,
    )
    # Slot i holds frame i for i < WINDOW (circular buffer, step counter 5).
    prev = np.asarray(state["prev"])  # (1, 1+K, 16)
    frames = np.asarray(frames)
    for i in range(5):
        np.testing.assert_array_equal(prev[0, :, i], frames[0, i])
    assert (np.asarray(state["step"]) == 5).all()


def test_penalty_column_matches_reference_window_rule():
    """Reference inference.py:185-189 + 110: for steps < 16 the penalized
    column is the step-0 frame (window = previous_tokens[:, :16]); for
    steps >= 16 it is the oldest frame in the sliding window (step - 16)."""
    W = decode.WINDOW
    B, K1 = 1, 3
    prev = jnp.zeros((B, K1, W), jnp.int32)
    # simulate steps 0..W-1 writing frames with value = step + 1 into slot step
    for j in range(W):
        prev = prev.at[:, :, j].set(j + 1)

    # early steps: column 0 = step-0 frame (value 1)
    for step in (1, 5, 15):
        col = np.asarray(decode.penalty_column(prev, jnp.full((B,), step, jnp.int32)))
        np.testing.assert_array_equal(col, np.full((B, K1), 1))
    # step 0: slot 0 not yet written in a real run — zeros
    fresh = jnp.zeros((B, K1, W), jnp.int32)
    col = np.asarray(decode.penalty_column(fresh, jnp.zeros((B,), jnp.int32)))
    np.testing.assert_array_equal(col, np.zeros((B, K1)))
    # steady state: slot step % W = frame from step - W (the oldest)
    for step in (16, 17, 33):
        col = np.asarray(decode.penalty_column(prev, jnp.full((B,), step, jnp.int32)))
        np.testing.assert_array_equal(col, np.full((B, K1), (step % W) + 1))


def test_kv_bucketed_decode_matches_full_cache(setup):
    """decode_chunk with a static kv_bucket covering all live positions is
    bit-identical to reading the full cache, for fresh and prefix states."""
    params, rope = setup
    args = (_scalar(0.7), _scalar(0.8), _scalar(1.1))

    def run(kv_bucket_prefill, kv_bucket_chunk):
        state = decode.init_state(params, CFG, batch=1)
        prompt, lengths = _prompt(12)
        state, first = decode.prefill(
            params, rope, state, prompt, lengths, jax.random.PRNGKey(1),
            *args, cfg=CFG, ids=IDS, kv_bucket=kv_bucket_prefill,
        )
        state, frames, emitted = decode.decode_chunk(
            params, rope, state, jax.random.PRNGKey(2), *args,
            cfg=CFG, ids=IDS, num_frames=6, kv_bucket=kv_bucket_chunk,
        )
        return np.asarray(first), np.asarray(frames), np.asarray(emitted)

    f_full, fr_full, em_full = run(None, None)
    # bucket 32 covers prompt 12 + 6 frames; bucket 0 prefill = fresh
    f_b, fr_b, em_b = run(0, 32)
    np.testing.assert_array_equal(f_b, f_full)
    np.testing.assert_array_equal(fr_b, fr_full)
    np.testing.assert_array_equal(em_b, em_full)
    # a larger bucket must give the same result too
    f_b2, fr_b2, _ = run(0, 64)
    np.testing.assert_array_equal(fr_b2, fr_full)


def test_kv_bucketed_prefix_continuation(setup):
    """Prefix-reuse prefill with kv_bucket = prefix bucket matches the
    full-cache path."""
    params, rope = setup
    args = (_scalar(0.7), _scalar(0.8), _scalar(1.1))
    prompt_a, len_a = _prompt(10, seed=3)

    def run(kv_bucket):
        state = decode.init_state(params, CFG, batch=1)
        state, _ = decode.prefill(
            params, rope, state, prompt_a, len_a, jax.random.PRNGKey(4),
            *args, cfg=CFG, ids=IDS, kv_bucket=0,
        )
        # continuation block at offset 10
        prompt_b, len_b = _prompt(5, bucket=8, seed=5)
        state, first = decode.prefill(
            params, rope, state, prompt_b, len_b, jax.random.PRNGKey(6),
            *args, cfg=CFG, ids=IDS, kv_bucket=kv_bucket,
        )
        return np.asarray(first)

    np.testing.assert_array_equal(run(None), run(16))


def test_rep_penalty_window_is_consumed(setup):
    """EngineConfig.rep_penalty_window sizes the state's circular buffer and
    changes which frame the slow-token penalty hits: with window W, the
    penalized column at step >= W is the frame from step - W."""
    params, rope = setup
    for W in (4, 16):
        state = decode.init_state(params, CFG, batch=1, window=W)
        assert state["prev"].shape == (1, 1 + CFG.num_codebooks, W)
        prompt, lengths = _prompt(8)
        state, _ = decode.prefill(
            params, rope, state, prompt, lengths, jax.random.PRNGKey(1),
            _scalar(0.7), _scalar(0.8), _scalar(1.1), cfg=CFG, ids=IDS,
        )
        state, frames, _ = decode.decode_chunk(
            params, rope, state, jax.random.PRNGKey(2),
            _scalar(0.7), _scalar(0.8), _scalar(1.1),
            cfg=CFG, ids=IDS, num_frames=W + 2,
        )
        # circular buffer wrapped: slot j holds the latest frame with
        # step % W == j
        prev = np.asarray(state["prev"])
        frames = np.asarray(frames)
        for j in range(W):
            steps = [s for s in range(W + 2) if s % W == j]
            np.testing.assert_array_equal(prev[0, :, j], frames[0, steps[-1]])
    # the engine-facing knob reaches init_state
    from fish_tts_tpu.config import EngineConfig

    assert EngineConfig(rep_penalty_window=8).rep_penalty_window == 8


def test_one_token_budget_is_prefill_only(tiny_tokenizer):
    """max_new_tokens=1: the prefill frame fills the budget; no decode frames
    are computed (prefill_chunk num_frames=0 path) and streaming yields the
    single frame."""
    from fish_tts_tpu.engine.generate import GenerationEngine

    params = dual_ar.init_params(jax.random.PRNGKey(3), CFG, dtype=jnp.float32)
    eng = GenerationEngine(params, CFG, tiny_tokenizer, seed=5)
    outs = [
        r.codes for r in eng.generate_long(
            "one", max_new_tokens=1, streaming=True,
            temperature=0.7, top_p=0.8, repetition_penalty=1.1,
        )
        if r.action == "sample"
    ]
    total = sum(c.shape[1] for c in outs)
    assert total == 1


def test_generation_invariant_to_kv_bucket_step(tiny_tokenizer):
    """Full generations crossing several kv-bucket boundaries are
    bit-identical to running with a single max-size bucket."""
    from fish_tts_tpu.config import EngineConfig
    from fish_tts_tpu.engine.generate import GenerationEngine

    params = dual_ar.init_params(jax.random.PRNGKey(3), CFG, dtype=jnp.float32)

    def run(step):
        eng = GenerationEngine(
            params, CFG, tiny_tokenizer,
            engine_cfg=EngineConfig(kv_bucket_step=step, decode_chunk=8,
                                    first_chunk=4),
            seed=11,
        )
        outs = []
        for resp in eng.generate_long(
            "cross the bucket boundary", max_new_tokens=48,
            temperature=0.7, top_p=0.8, repetition_penalty=1.1,
        ):
            if resp.action == "sample":
                outs.append(resp.codes)
        return np.concatenate(outs, axis=1)

    fine = run(16)       # buckets grow 16 -> 32 -> 48 ... during decode
    coarse = run(10**6)  # capped at max_seq_len: one full-cache bucket
    np.testing.assert_array_equal(fine, coarse)


# ---------------------------------------------------------------------------
# Batched serving (generate_batch)
# ---------------------------------------------------------------------------


def _spy_prefill(monkeypatch, calls):
    """Record every decode.prefill call's (batch, prompt width, start pos)."""
    real = decode.prefill

    def spy(params, rope, state, prompt, lengths, *a, **kw):
        calls.append(
            (prompt.shape[0], prompt.shape[2], int(np.asarray(state["pos"])[0]))
        )
        return real(params, rope, state, prompt, lengths, *a, **kw)

    monkeypatch.setattr(decode, "prefill", spy)


def test_generate_batch_forks_prefix(tiny_tokenizer, monkeypatch):
    """With a cached voice prefix, generate_batch must prefill ONLY each
    stream's text suffix (small bucket, starting at the prefix offset) —
    never the reference blocks again."""
    from fish_tts_tpu.config import EngineConfig
    from fish_tts_tpu.engine.generate import GenerationEngine

    params = dual_ar.init_params(jax.random.PRNGKey(3), CFG, dtype=jnp.float32)
    eng = GenerationEngine(
        params, CFG, tiny_tokenizer,
        engine_cfg=EngineConfig(prompt_buckets=(8, 16, 32), decode_chunk=4,
                                first_chunk=4, kv_bucket_step=32),
        seed=7,
    )
    ref = np.random.RandomState(0).randint(
        0, CFG.residual_codebook_size, (CFG.num_codebooks, 10)
    ).astype(np.int64)
    eng.set_prefix(["reference transcript"], [ref])
    prefix_len = int(np.asarray(eng._prefix_state["pos"])[0])
    assert prefix_len > 10

    calls = []
    _spy_prefill(monkeypatch, calls)
    outs = eng.generate_batch(["one", "two"], max_new_tokens=6)
    assert len(outs) == 2
    for c in outs:
        assert c.shape[0] == CFG.num_codebooks and c.min() >= 0
    # exactly one prefill over the 2-stream suffix batch, starting at the
    # prefix offset, padded only to the small suffix bucket
    assert len(calls) == 1
    B, width, start = calls[0]
    assert B == 2
    assert start == prefix_len
    # the suffix block ("one"/"two" + chat framing) fits the 16 bucket; a
    # reference-inclusive prompt (prefix_len + suffix) would need >= 32
    assert width == 16 < prefix_len + 16


def test_generate_batch_buckets_per_stream(tiny_tokenizer, monkeypatch):
    """Streams with very different prompt lengths prefill in separate bucket
    groups, and outputs come back in caller order."""
    from fish_tts_tpu.config import EngineConfig
    from fish_tts_tpu.engine.generate import GenerationEngine

    params = dual_ar.init_params(jax.random.PRNGKey(3), CFG, dtype=jnp.float32)
    eng = GenerationEngine(
        params, CFG, tiny_tokenizer,
        engine_cfg=EngineConfig(prompt_buckets=(8, 16, 32), decode_chunk=4,
                                first_chunk=4, kv_bucket_step=32),
        seed=7,
    )
    calls = []
    _spy_prefill(monkeypatch, calls)
    # byte-level tokenizer: ~1 token/char + 13 framing tokens ->
    # "longer text ok" lands in bucket 32, "hi" in bucket 16
    texts = ["longer text ok", "hi"]
    outs = eng.generate_batch(texts, max_new_tokens=6)
    assert len(outs) == 2
    assert len(calls) == 2  # one prefill per bucket group
    widths = sorted(c[1] for c in calls)
    assert widths[0] < widths[1]  # short stream did NOT pad to the long bucket


def test_generate_batch_per_stream_sampling_params(tiny_tokenizer):
    """Per-stream sampling params: a vector of identical values matches the
    scalar path bit-for-bit (uniform shortcut), and distinct per-stream
    values run end to end — including across bucket groups."""
    from fish_tts_tpu.config import EngineConfig
    from fish_tts_tpu.engine.generate import GenerationEngine

    params = dual_ar.init_params(jax.random.PRNGKey(3), CFG, dtype=jnp.float32)

    def make():
        return GenerationEngine(
            params, CFG, tiny_tokenizer,
            engine_cfg=EngineConfig(prompt_buckets=(8, 16, 32), decode_chunk=4,
                                    first_chunk=4, kv_bucket_step=32),
            seed=7,
        )

    texts = ["longer text ok", "hi"]
    scalar = make().generate_batch(texts, max_new_tokens=6, temperature=0.7)
    vector = make().generate_batch(
        texts, max_new_tokens=6, temperature=[0.7, 0.7]
    )
    for a, b in zip(scalar, vector):
        np.testing.assert_array_equal(a, b)

    mixed = make().generate_batch(
        texts, max_new_tokens=6,
        temperature=[0.5, 1.2], top_p=[0.6, 0.95], repetition_penalty=[1.0, 1.3],
    )
    assert len(mixed) == 2
    for c in mixed:
        assert c.shape[0] == CFG.num_codebooks and c.min() >= 0

    with pytest.raises(ValueError, match="temperature"):
        make().generate_batch(texts, temperature=[0.7])  # wrong length


def test_decode_chunk_early_exit_b1_matches_live(setup):
    """early_exit=True must not change a live B=1 chunk's outputs, and must
    skip the model once the stream is done (held frame replayed)."""
    params, rope = setup
    prompt, lengths = _prompt(12)

    def run(early_exit):
        state = decode.init_state(params, CFG, batch=1)
        state, _ = decode.prefill(
            params, rope, state, prompt, lengths, jax.random.PRNGKey(1),
            _scalar(0.7), _scalar(0.8), _scalar(1.1), cfg=CFG, ids=IDS,
        )
        state, frames, emitted = decode.decode_chunk(
            params, rope, state, jax.random.PRNGKey(2),
            _scalar(0.7), _scalar(0.8), _scalar(1.1),
            cfg=CFG, ids=IDS, num_frames=6, early_exit=early_exit,
        )
        return np.asarray(frames), np.asarray(emitted)

    f0, e0 = run(False)
    f1, e1 = run(True)
    np.testing.assert_array_equal(f0, f1)
    np.testing.assert_array_equal(e0, e1)

    # done stream: nothing emitted, held frame replayed
    state = decode.init_state(params, CFG, batch=1)
    state["done"] = jnp.ones((1,), jnp.bool_)
    state["frame"] = jnp.full((1, 1 + CFG.num_codebooks), 7, jnp.int32)
    state["pos"] = jnp.asarray([5], jnp.int32)
    state, frames, emitted = decode.decode_chunk(
        params, rope, state, jax.random.PRNGKey(3),
        _scalar(0.7), _scalar(0.8), _scalar(1.1),
        cfg=CFG, ids=IDS, num_frames=4, early_exit=True,
    )
    assert not np.asarray(emitted).any()
    assert (np.asarray(frames) == 7).all()
    assert int(np.asarray(state["pos"])[0]) == 5


def test_non_streaming_uses_large_chunks(tiny_tokenizer, monkeypatch):
    """Batch-mode generate_long decodes in batch_chunk-sized device calls
    (few fetches); streaming keeps decode_chunk-sized ones."""
    from fish_tts_tpu.config import EngineConfig
    from fish_tts_tpu.engine.generate import GenerationEngine

    params = dual_ar.init_params(jax.random.PRNGKey(3), CFG, dtype=jnp.float32)
    eng = GenerationEngine(
        params, CFG, tiny_tokenizer,
        engine_cfg=EngineConfig(prompt_buckets=(32,), decode_chunk=4,
                                first_chunk=4, batch_chunk=24,
                                kv_bucket_step=64),
        seed=7,
    )
    calls = []
    real = decode.decode_chunk

    def spy(*a, **kw):
        calls.append(kw["num_frames"])
        return real(*a, **kw)

    monkeypatch.setattr(decode, "decode_chunk", spy)

    list(eng.generate_long("hello", max_new_tokens=40))
    batch_sizes = list(calls)
    calls.clear()
    list(eng.generate_long("hello", max_new_tokens=40, streaming=True))
    stream_sizes = list(calls)

    assert max(batch_sizes) == 24  # large chunks in batch mode
    # after the fused prefill chunk (first_chunk-1 = 3 frames), chunks are
    # batch_chunk-sized with the final partial one a decode_chunk multiple
    assert batch_sizes[0] == 3
    assert all(s == 24 or s % 4 == 0 for s in batch_sizes[1:])
    assert len(batch_sizes) < len(stream_sizes)
    assert all(s in (3, 4) for s in stream_sizes)  # streaming stays small


def test_decode_chunk_skips_after_all_done(setup):
    """B>1 chunks stop running the model once every stream is done: the
    all-done state passes through unchanged and nothing is emitted."""
    params, rope = setup
    state = decode.init_state(params, CFG, batch=2)
    state["pos"] = jnp.asarray([9, 11], jnp.int32)
    state["done"] = jnp.ones((2,), jnp.bool_)
    state["frame"] = jnp.full((2, 1 + CFG.num_codebooks), 3, jnp.int32)
    before = jax.tree_util.tree_map(np.asarray, state)
    state, frames, emitted = decode.decode_chunk(
        params, rope, state, jax.random.PRNGKey(2),
        _scalar(0.7), _scalar(0.8), _scalar(1.1),
        cfg=CFG, ids=IDS, num_frames=4,
    )
    assert not emitted.any()
    np.testing.assert_array_equal(np.asarray(state["pos"]), before["pos"])
    np.testing.assert_array_equal(np.asarray(state["step"]), before["step"])
    np.testing.assert_array_equal(
        np.asarray(state["kv"]["k"]), before["kv"]["k"]
    )
    # the held frame is replayed, never a fresh sample
    assert (np.asarray(frames) == 3).all()


def test_generate_batch_per_stream_budgets(tiny_tokenizer):
    """Each stream's generation budget is bounded by ITS OWN prompt's
    headroom (matching its solo run), not by the longest prompt in the
    batch — a short-prompt stream must not be silently truncated just
    because a long-prompt co-stream shares the batch."""
    from fish_tts_tpu.config import EngineConfig
    from fish_tts_tpu.engine.generate import GenerationEngine

    params = dual_ar.init_params(jax.random.PRNGKey(3), CFG, dtype=jnp.float32)

    def make():
        return GenerationEngine(
            params, CFG, tiny_tokenizer,
            engine_cfg=EngineConfig(prompt_buckets=(8, 16, 32, 64),
                                    decode_chunk=4, first_chunk=4,
                                    kv_bucket_step=32),
            seed=7,
        )

    short, long = "hi", "a much longer text that eats context room here"
    # unbounded request: budgets come from max_seq_len - own prompt
    batch = make().generate_batch([short, long], max_new_tokens=0)
    solo_short = np.concatenate(
        [np.asarray(r.codes)
         for r in make().generate_long(short, max_new_tokens=0)
         if r.action == "sample"], axis=1,
    )
    # the long stream's headroom is strictly smaller than the short one's;
    # under the old shared cap the short stream would stop at the long
    # stream's budget
    assert batch[1].shape[1] < batch[0].shape[1]
    assert batch[0].shape[1] == solo_short.shape[1]


# ---------------------------------------------------------------------------
# Cache allocation bucketing (decode.resize_cache / generate._cache_bucket)
# ---------------------------------------------------------------------------


def test_decode_invariant_to_cache_allocation(setup):
    """Frames are bit-identical whether the KV cache is allocated at the
    full context or at a small bucket covering the request extent — the
    allocation length is storage, never math (reads go through the
    kv_bucket window, writes land below the extent)."""
    params, rope = setup
    prompt, lengths = _prompt(12)
    outs = []
    for S in (CFG.max_seq_len, 32):
        state = decode.init_state(params, CFG, batch=1, max_seq_len=S)
        state, first = decode.prefill(
            params, rope, state, prompt, lengths, jax.random.PRNGKey(1),
            _scalar(0.7), _scalar(0.8), _scalar(1.1), cfg=CFG, ids=IDS,
            kv_bucket=0,
        )
        state, frames, _ = decode.decode_chunk(
            params, rope, state, jax.random.PRNGKey(2),
            _scalar(0.7), _scalar(0.8), _scalar(1.1),
            cfg=CFG, ids=IDS, num_frames=6, kv_bucket=32,
        )
        outs.append((np.asarray(first), np.asarray(frames)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])


def test_resize_cache_grow_shrink(setup):
    """Growing pads zeros above the live rows; shrinking drops only the
    rows at and above the new length.  Non-KV fields pass through."""
    params, rope = setup
    state = decode.init_state(params, CFG, batch=2, max_seq_len=32)
    rng = np.random.RandomState(0)
    k0 = rng.randn(*state["kv"]["k"].shape).astype(np.float32)
    state["kv"]["k"] = jnp.asarray(k0)
    state["pos"] = jnp.asarray([7, 3], jnp.int32)

    grown = decode.resize_cache(state, new_len=64)
    assert grown["kv"]["k"].shape[3] == 64
    np.testing.assert_array_equal(np.asarray(grown["kv"]["k"])[:, :, :, :32], k0)
    assert float(jnp.abs(grown["kv"]["k"][:, :, :, 32:]).max()) == 0.0
    np.testing.assert_array_equal(np.asarray(grown["pos"]), [7, 3])

    shrunk = decode.resize_cache(grown, new_len=16)
    assert shrunk["kv"]["k"].shape[3] == 16
    np.testing.assert_array_equal(
        np.asarray(shrunk["kv"]["k"]), k0[:, :, :, :16]
    )


def test_cache_bucket_helper():
    from fish_tts_tpu.engine.generate import CACHE_FLOOR, _cache_bucket

    cap = 4096
    assert _cache_bucket(1, cap) == CACHE_FLOOR
    assert _cache_bucket(CACHE_FLOOR, cap) == CACHE_FLOOR
    assert _cache_bucket(CACHE_FLOOR + 1, cap) == 2 * CACHE_FLOOR
    assert _cache_bucket(4000, cap) == 4096
    assert _cache_bucket(9999, cap) == 4096  # over-cap callers clamp
    # small test configs: the cap wins over the floor (full-size states,
    # so tiny-config behavior is unchanged by allocation bucketing)
    assert _cache_bucket(1, 128) == 128
    assert _cache_bucket(200, 128) == 128


def test_generation_invariant_to_cache_floor(tiny_tokenizer, monkeypatch):
    """Full generations are bit-identical whether states are allocated at
    tiny buckets (grown per request extent) or at the full context."""
    from fish_tts_tpu.config import EngineConfig
    from fish_tts_tpu.engine import generate as generate_mod
    from fish_tts_tpu.engine.generate import GenerationEngine

    params = dual_ar.init_params(jax.random.PRNGKey(3), CFG, dtype=jnp.float32)

    def run(floor):
        monkeypatch.setattr(generate_mod, "CACHE_FLOOR", floor)
        eng = GenerationEngine(
            params, CFG, tiny_tokenizer,
            engine_cfg=EngineConfig(kv_bucket_step=16, decode_chunk=8,
                                    first_chunk=4),
            seed=11,
        )
        outs = []
        for resp in eng.generate_long(
            "cross the bucket boundary", max_new_tokens=24,
            temperature=0.7, top_p=0.8, repetition_penalty=1.1,
        ):
            if resp.action == "sample":
                outs.append(resp.codes)
        return np.concatenate(outs, axis=1)

    small = run(8)                 # request state at a sub-context bucket
    full = run(CFG.max_seq_len)    # full-context allocation
    np.testing.assert_array_equal(small, full)
