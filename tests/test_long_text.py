"""Long-form synthesis: sentence-aware chunking + rolling carry context.

Green-field surface (the reference rejects prompts beyond
``max_seq_len - 2048``, inference.py:794-795, and one call cannot exceed one
context of audio): ``utils/text.split_text`` and
``FishTTS.synthesize_long(_stream)``.
"""

import re

import numpy as np
import pytest

from fish_tts_tpu.utils.text import split_text


# ---------------------------------------------------------------------------
# split_text
# ---------------------------------------------------------------------------


def _squash(s: str) -> str:
    return re.sub(r"\s+", "", s)


@pytest.mark.parametrize("max_chars", [12, 40, 200])
def test_split_preserves_content_and_bound(max_chars):
    text = ("First sentence here. Second one follows!  A third, with a "
            "clause; and more?  Final bit without terminal punctuation")
    chunks = split_text(text, max_chars)
    assert all(len(c) <= max_chars for c in chunks)
    assert _squash("".join(chunks)) == _squash(text)
    assert all(c == c.strip() and c for c in chunks)


def test_split_prefers_sentence_boundaries():
    chunks = split_text("One. Two. Three.", 8)
    assert chunks == ["One.", "Two.", "Three."]
    # sentences pack together when they fit
    assert split_text("One. Two. Three.", 80) == ["One. Two. Three."]


def test_split_cjk_enders_and_newlines():
    chunks = split_text("你好世界。第二句！\n\n第三句？", 6)
    assert chunks == ["你好世界。", "第二句！", "第三句？"]


def test_split_oversize_sentence_degrades():
    # one long sentence: clause split, then whitespace, then hard cut
    text = "alpha beta gamma, delta epsilon zeta; eta theta iota"
    chunks = split_text(text, 20)
    assert all(len(c) <= 20 for c in chunks)
    assert _squash("".join(chunks)) == _squash(text)
    # a single unbroken token still gets hard-cut
    chunks = split_text("x" * 50, 16)
    assert all(len(c) <= 16 for c in chunks)
    assert "".join(chunks) == "x" * 50


def test_split_empty_and_validation():
    assert split_text("", 100) == []
    assert split_text("   \n  ", 100) == []
    with pytest.raises(ValueError):
        split_text("hi", 0)


# ---------------------------------------------------------------------------
# FishTTS.synthesize_long(_stream)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tts():
    from fish_tts_tpu.testing import make_tiny_tts

    return make_tiny_tts()


LONG_TEXT = "One two. Three four! Five six? Seven."


def test_synthesize_long_multi_chunk_wav(tts):
    """The text splits into several chunks; one valid WAV comes back whose
    sample count is a whole number of vocoder frames."""
    wav = tts.synthesize_long(
        LONG_TEXT, max_chars=12, carry_frames=4, max_tokens_per_chunk=8,
    )
    assert wav[:4] == b"RIFF"
    n_samples = (len(wav) - 44) // 2
    assert n_samples > 0
    assert n_samples % tts._vocoder_cfg.frame_length == 0


def test_synthesize_long_stream_yields_across_chunks(tts):
    pcm_chunks = list(tts.synthesize_long_stream(
        LONG_TEXT, max_chars=12, carry_frames=4, max_tokens_per_chunk=8,
        min_first_chunk=2, chunk_tokens=4,
    ))
    assert len(pcm_chunks) >= 2
    assert all(isinstance(c, bytes) and c for c in pcm_chunks)


def test_carry_context_threads_between_chunks(tts, monkeypatch):
    """Chunk i>0 must be prompted with (chunk[i-1] text, its trailing
    generated codes) as an extra reference pair — the voice-continuity
    contract."""
    calls = []
    real = tts._engine.generate_long

    def spy(text, **kw):
        calls.append((text, [np.asarray(c) for c in kw["prompt_tokens"]],
                      list(kw["prompt_text"])))
        return real(text, **kw)

    monkeypatch.setattr(tts._engine, "generate_long", spy)
    tts.synthesize_long(
        LONG_TEXT, max_chars=12, carry_frames=4, max_tokens_per_chunk=8,
    )
    assert len(calls) >= 2
    first_text = calls[0][0]
    assert calls[0][1] == []  # no carry on the first chunk
    _, tokens, texts = calls[1]
    assert texts[-1] == first_text  # previous chunk's text rides along
    carry = tokens[-1]
    assert carry.shape[0] == tts._cfg.num_codebooks
    assert 1 <= carry.shape[1] <= 4  # bounded by carry_frames
    assert carry.dtype == np.int64


def test_serve_long_request_chains(tts):
    """A long=True serving request decodes as a chain of pool segments but
    the consumer sees ONE stream: every event carries the external id, PCM
    arrives across segments, and exactly one final done event lands."""
    sess = tts.serve(slots=2)
    n_prepares = [0]
    real_prepare = sess._srv.prepare

    def spy(text, **kw):
        n_prepares[0] += 1
        return real_prepare(text, **kw)

    sess._srv.prepare = spy
    try:
        rid = sess.submit(LONG_TEXT, long=True, max_chars=12,
                          carry_frames=4, max_new_tokens=6, seed=9)
        # a co-tenant rides the same pool while the chain progresses
        other = sess.submit("co tenant", max_new_tokens=6, seed=10)
        events = list(sess.run())
    finally:
        sess._srv.prepare = real_prepare
    assert {ev.request_id for ev in events} == {rid, other}
    mine = [ev for ev in events if ev.request_id == rid]
    assert sum(ev.done for ev in mine) == 1 and mine[-1].done
    assert sum(len(ev.pcm) for ev in mine) > 0
    assert n_prepares[0] >= 3  # >= 2 chain segments + the co-tenant
    assert not sess.busy and not sess._chains and not sess._alias
    # frames_total accumulates across segments
    assert mine[-1].frames_total >= 2


def test_serve_long_cancel_mid_chain(tts):
    """Cancelling the external id aborts the WHOLE chain: no further
    events, no orphan segments left running, bookkeeping drained."""
    sess = tts.serve(slots=1)
    rid = sess.submit(LONG_TEXT, long=True, max_chars=12, carry_frames=4,
                      max_new_tokens=6, seed=11)
    got_pcm = False
    for ev in sess.run():
        if ev.request_id == rid and ev.pcm:
            got_pcm = True
            sess.cancel(rid)
            break
    tail = list(sess.run())  # drain whatever was in flight
    assert got_pcm
    assert all(ev.request_id != rid for ev in tail)  # cancel is silent
    assert not sess.busy and not sess._chains and not sess._alias


def test_serve_long_expiry_while_queued(tts):
    """A long request whose deadline passes before admission ends with one
    frame-less done event (the chain never starts)."""
    import time as _t

    sess = tts.serve(slots=1)
    blocker = sess.submit("holds the only slot", max_new_tokens=20, seed=12)
    rid = sess.submit(LONG_TEXT, long=True, max_chars=12, carry_frames=4,
                      max_new_tokens=6, timeout_s=0.05, priority=-1)
    _t.sleep(0.1)
    events = list(sess.run())
    mine = [ev for ev in events if ev.request_id == rid]
    assert mine and mine[-1].done and all(not ev.pcm for ev in mine)
    assert any(ev.request_id == blocker and ev.done for ev in events)
    assert not sess._chains and not sess._alias


def test_long_respects_explicit_references(tts, monkeypatch):
    """Explicit references are the base of every chunk's prompt; the carry
    pair is appended after them."""
    from fish_tts_tpu.synthesizer import VoiceProfile

    ref = VoiceProfile(
        codes=np.random.RandomState(3).randint(
            0, tts._cfg.codebook_size // 2,
            (tts._cfg.num_codebooks, 2)).astype(np.int64),
        text="r",
    )
    calls = []
    real = tts._engine.generate_long

    def spy(text, **kw):
        calls.append((list(kw["prompt_text"]), kw["use_prefix_cache"]))
        return real(text, **kw)

    monkeypatch.setattr(tts._engine, "generate_long", spy)
    # short text/carry: base ref + carry pair + chunk must fit the tiny
    # config's 64-token prompt cap
    wav = tts.synthesize_long(
        "Aa bb. Cc dd.", references=[ref], max_chars=8, carry_frames=2,
        max_tokens_per_chunk=6,
    )
    assert wav[:4] == b"RIFF"
    assert len(calls) >= 2
    assert calls[0][0] == ["r"] and not calls[0][1]
    assert calls[1][0][0] == "r" and len(calls[1][0]) == 2


def test_serve_long_chain_retries_on_queue_full(tts):
    """Transient queue backpressure at a segment boundary must NOT end the
    chain: the prepared successor (carry context already consumed) is kept
    and re-enqueued on a later round, and the full text still decodes."""
    sess = tts.serve(slots=1)
    rid = sess.submit(LONG_TEXT, long=True, max_chars=12,
                      carry_frames=4, max_new_tokens=6, seed=21)
    # every prepare/enqueue from here on raises QueueFull (max_queue=-1
    # makes len(queue) >= max_queue always true) until we lift it: the
    # chain boundary MUST retry instead of ending the stream early
    sess._srv.max_queue = -1
    events = []
    retry_rounds = 0
    try:
        while sess.busy:
            if sess._chain_retry:
                retry_rounds += 1
            if retry_rounds >= 3:
                sess._srv.max_queue = 0  # lift the backpressure
            events.extend(sess.step())
    finally:
        sess._srv.max_queue = 0
    assert retry_rounds >= 3, "test did not exercise backpressure"
    mine = [ev for ev in events if ev.request_id == rid]
    assert sum(ev.done for ev in mine) == 1 and mine[-1].done
    assert sum(len(ev.pcm) for ev in mine) > 0
    # the chain decoded EVERY chunk despite the transient QueueFull
    from fish_tts_tpu.utils.text import split_text

    n_chunks = len(split_text(LONG_TEXT, 12))
    assert n_chunks >= 2
    assert mine[-1].frames_total >= n_chunks  # >= 1 frame per segment
    assert not sess.busy and not sess._chains and not sess._chain_retry


def test_serve_long_chain_does_not_pin_other_streams(tts, monkeypatch):
    """A chain holds its vocoder lane for its whole life; a co-tenant
    arriving mid-chain must get a DIFFERENT lane (and finish long before
    the chain does) instead of queueing behind the entire chain."""
    from fish_tts_tpu import synthesizer as syn

    long_text = ("One two. Three four! Five six? Seven eight. "
                 "Nine ten. Eleven twelve!")
    sess = tts.serve(slots=2)
    # lane assignment is only observable at creation time (short streams
    # are created, flushed, and popped within one step): spy on stream
    # creation and the lane pick, which happen back-to-back per stream
    created, picked = [], []
    orig_init = syn._SlotAudioStream.__init__

    def init_spy(self, rid):
        created.append(rid)
        orig_init(self, rid)

    monkeypatch.setattr(syn._SlotAudioStream, "__init__", init_spy)
    orig_pick = sess._pick_lane

    def pick_spy():
        lane = orig_pick()
        picked.append(lane)
        return lane

    sess._pick_lane = pick_spy
    rid = sess.submit(long_text, long=True, max_chars=10, carry_frames=4,
                      max_new_tokens=5, seed=31)
    co = None
    events = []
    while sess.busy:
        events.extend(sess.step())
        with sess._cancel_lock:
            chain = sess._chains.get(rid)
        if co is None and chain is not None and chain.idx >= 2:
            # mid-chain: the chain's audio lane is held, LM slots recycle
            co = sess.submit("quick co tenant", max_new_tokens=4, seed=33)
    assert co is not None, "chain finished before a co-tenant could join"
    lanes = dict(zip(created, picked))
    assert rid in lanes and co in lanes
    assert lanes[co] != lanes[rid], "co-tenant queued behind the chain's lane"
    order = [ev.request_id for ev in events if ev.done]
    assert order.index(co) < order.index(rid), (
        "co-tenant audio was starved until the chain finished"
    )


def test_carry_frames_zero_disables_carry(tts, monkeypatch):
    """carry_frames=0 means NO rolling context: later chunks are prompted
    with the base references alone.  (Regression: ``codes[:, -0:]`` is the
    whole array, so 0 used to inline the ENTIRE previous chunk and blow the
    prompt budget.)"""
    from fish_tts_tpu.synthesizer import VoiceProfile

    ref = VoiceProfile(
        codes=np.random.RandomState(5).randint(
            0, tts._cfg.codebook_size // 2,
            (tts._cfg.num_codebooks, 2)).astype(np.int64),
        text="r",
    )
    calls = []
    real = tts._engine.generate_long

    def spy(text, **kw):
        calls.append((list(kw["prompt_text"] or []),
                      [np.asarray(c) for c in (kw["prompt_tokens"] or [])]))
        return real(text, **kw)

    monkeypatch.setattr(tts._engine, "generate_long", spy)
    wav = tts.synthesize_long(
        "Aa bb. Cc dd.", references=[ref], max_chars=8, carry_frames=0,
        max_tokens_per_chunk=6,
    )
    assert wav[:4] == b"RIFF"
    assert len(calls) >= 2
    for texts, tokens in calls:
        assert texts == ["r"], "carry pair must not be appended"
        assert len(tokens) == 1 and tokens[0].shape[1] == 2


def test_take_carry_zero_frames_returns_none():
    """_LongChain.take_carry with carry_frames=0 yields no carry (not the
    EOS frame via ``[:, -0:]``)."""
    from fish_tts_tpu.synthesizer import _LongChain

    chain = _LongChain(["a", "b"], [], [], 0, {}, None, 0.0)
    chain.feed(np.ones((4, 3), np.int32))
    assert chain.take_carry() is None
    assert chain.tail is None  # consumed


def test_chain_keeps_base_refs_when_segment_has_no_carry(tts):
    """A segment that produced no carry codes (e.g. EOS on its first frame)
    must NOT drop the base voice references for the rest of the chain."""
    sess = tts.serve(slots=1)
    from fish_tts_tpu.synthesizer import _LongChain

    base_codes = [np.zeros((tts._cfg.num_codebooks, 2), np.int64)]
    chain = _LongChain(["seg a.", "seg b."], ["r"], base_codes,
                       4, {"max_new_tokens": 4}, None, 0.0)
    chain.tail = None  # the finished segment emitted nothing

    seen = {}

    def prepare_spy(text, **kw):
        seen["text"], seen["kw"] = text, kw
        raise ValueError("stop before touching scheduler state")

    sess._srv.prepare = prepare_spy
    assert sess._chain_next(77, chain) == "end"
    assert seen["text"] == "seg b."
    assert seen["kw"]["prompt_text"] == ["r"]
    assert [c.shape for c in seen["kw"]["prompt_tokens"]] == [(4, 2)]
