"""Continuous-batching scheduler tests (tiny config, CPU).

The load-bearing property: a request admitted into a RUNNING pool samples
bit-identical codes to a solo ``generate_long`` run with the same seed —
per-slot steps + per-request keys make decode invariant to co-tenants and
admission time.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_tts_tpu.config import EngineConfig, TINY_CONFIG
from fish_tts_tpu.engine.generate import GenerationEngine
from fish_tts_tpu.engine.serve import ContinuousBatcher
from fish_tts_tpu.models import dual_ar


@pytest.fixture(scope="module", autouse=True)
def _fresh_jax_state():
    """XLA:CPU has segfaulted compiling this module's programs late in a
    long single-process suite (hundreds of live executables); dropping the
    in-process caches first has been reliable.  Cheap — this module compiles
    its own shapes either way."""
    jax.clear_caches()
    yield


@pytest.fixture(scope="module")
def engine(tiny_tokenizer):
    params = dual_ar.init_params(
        jax.random.PRNGKey(0), TINY_CONFIG, dtype=jnp.float32
    )
    ecfg = EngineConfig(prompt_buckets=(32,), decode_chunk=8, first_chunk=4)
    return GenerationEngine(
        params, TINY_CONFIG, tiny_tokenizer, engine_cfg=ecfg, seed=0
    )


def _solo_codes(engine, text, seed, max_new):
    """Reference answer: solo streaming generate_long with a pinned seed."""
    engine.reseed(seed)
    chunks = [
        r.codes for r in engine.generate_long(
            text, max_new_tokens=max_new, streaming=True,
            temperature=0.7, top_p=0.8, repetition_penalty=1.1,
        ) if r.action == "sample"
    ]
    return np.concatenate(chunks, axis=1)


def _collect(events):
    out: dict[int, list[np.ndarray]] = {}
    done: set[int] = set()
    for ev in events:
        out.setdefault(ev.request_id, []).append(ev.codes)
        if ev.done:
            done.add(ev.request_id)
    return {k: np.concatenate(v, axis=1) for k, v in out.items()}, done


def test_single_request_matches_solo(engine):
    solo = _solo_codes(engine, "hello pool", seed=5, max_new=20)
    srv = ContinuousBatcher(engine, slots=3)
    rid = srv.submit(
        "hello pool", max_new_tokens=20, seed=5,
        temperature=0.7, top_p=0.8, repetition_penalty=1.1,
    )
    codes, done = _collect(srv.run())
    assert rid in done
    np.testing.assert_array_equal(codes[rid], solo)


def test_midflight_admission_matches_solo(engine):
    """A request admitted while other slots are mid-decode produces codes
    identical to its solo run — THE continuous-batching correctness bar."""
    solo_a = _solo_codes(engine, "first request text", seed=11, max_new=30)
    solo_b = _solo_codes(engine, "late joiner", seed=22, max_new=18)

    srv = ContinuousBatcher(engine, slots=2)
    rid_a = srv.submit("first request text", max_new_tokens=30, seed=11,
                       temperature=0.7, top_p=0.8, repetition_penalty=1.1)
    events = []
    # run a few rounds so request A is genuinely mid-flight...
    for _ in range(2):
        events += srv.step()
    # ...then admit B into the running pool
    rid_b = srv.submit("late joiner", max_new_tokens=18, seed=22,
                       temperature=0.7, top_p=0.8, repetition_penalty=1.1)
    events += list(srv.run())
    codes, done = _collect(events)
    assert {rid_a, rid_b} <= done
    np.testing.assert_array_equal(codes[rid_a], solo_a)
    np.testing.assert_array_equal(codes[rid_b], solo_b)


def test_more_requests_than_slots(engine):
    """Queueing: 5 requests through 2 slots all finish with per-request
    budgets respected and every request's codes matching its solo run."""
    texts = [f"req number {i}" for i in range(5)]
    solos = [
        _solo_codes(engine, t, seed=100 + i, max_new=10)
        for i, t in enumerate(texts)
    ]
    srv = ContinuousBatcher(engine, slots=2)
    rids = [
        srv.submit(t, max_new_tokens=10, seed=100 + i,
                   temperature=0.7, top_p=0.8, repetition_penalty=1.1)
        for i, t in enumerate(texts)
    ]
    codes, done = _collect(srv.run())
    assert set(rids) <= done
    for rid, solo in zip(rids, solos):
        np.testing.assert_array_equal(codes[rid], solo)
        assert codes[rid].shape[1] <= 10


def test_cancel_queued_request(engine):
    """A request cancelled while still queued never decodes; co-tenants are
    unaffected (bit-identical to their solo runs)."""
    solo = _solo_codes(engine, "keeps running", seed=31, max_new=16)
    srv = ContinuousBatcher(engine, slots=1)
    r_keep = srv.submit("keeps running", max_new_tokens=16, seed=31,
                        temperature=0.7, top_p=0.8, repetition_penalty=1.1)
    r_gone = srv.submit("never admitted", max_new_tokens=16, seed=32,
                        temperature=0.7, top_p=0.8, repetition_penalty=1.1)
    srv.cancel(r_gone)
    codes, done = _collect(srv.run())
    assert r_gone not in codes and r_gone not in done
    np.testing.assert_array_equal(codes[r_keep], solo)


def test_cancel_running_request_frees_slot(engine):
    """Cancelling mid-decode stops the request's events, frees its slot for
    the queued successor, and already-emitted frames are a prefix of the
    solo run.  The co-tenant stream is untouched."""
    solo_a = _solo_codes(engine, "long co-tenant", seed=41, max_new=32)
    solo_c = _solo_codes(engine, "successor", seed=43, max_new=8)
    srv = ContinuousBatcher(engine, slots=2)
    r_a = srv.submit("long co-tenant", max_new_tokens=32, seed=41,
                     temperature=0.7, top_p=0.8, repetition_penalty=1.1)
    r_b = srv.submit("to be cancelled", max_new_tokens=32, seed=42,
                     temperature=0.7, top_p=0.8, repetition_penalty=1.1)
    r_c = srv.submit("successor", max_new_tokens=8, seed=43,
                     temperature=0.7, top_p=0.8, repetition_penalty=1.1)
    events = []
    rounds = 0
    cancelled_at = None
    while srv.busy:
        evs = srv.step()
        events += evs
        rounds += 1
        if cancelled_at is None and any(
            e.request_id == r_b and e.codes.shape[1] for e in events
        ):
            srv.cancel(r_b)
            cancelled_at = rounds
    assert cancelled_at is not None, "r_b never started emitting"
    codes, done = _collect(events)
    # no events for r_b after the cancel round lands (one in-flight round
    # may still have been snapshot-dropped); its emitted codes are a solo
    # prefix and it never reached its budget
    assert r_b not in done
    assert codes[r_b].shape[1] < 32
    solo_b = _solo_codes(engine, "to be cancelled", seed=42, max_new=32)
    np.testing.assert_array_equal(
        codes[r_b], solo_b[:, : codes[r_b].shape[1]]
    )
    # co-tenant and successor (admitted into the freed slot) are exact
    np.testing.assert_array_equal(codes[r_a], solo_a)
    np.testing.assert_array_equal(codes[r_c], solo_c)
    assert {r_a, r_c} <= done


def test_per_request_voice_references(engine):
    """A request carrying its own voice references samples bit-identically
    to a solo generate_long with the same references + seed, while a
    no-reference co-tenant is unaffected."""
    rng = np.random.RandomState(3)
    ref_codes = rng.randint(0, 24, (TINY_CONFIG.num_codebooks, 7)).astype(
        np.int64)

    def solo(text, seed, with_refs):
        engine.reseed(seed)
        kw = ({"prompt_text": ["ref transcript"],
               "prompt_tokens": [ref_codes]} if with_refs else {})
        chunks = [
            r.codes for r in engine.generate_long(
                text, max_new_tokens=14, streaming=True,
                temperature=0.7, top_p=0.8, repetition_penalty=1.1, **kw,
            ) if r.action == "sample"
        ]
        return np.concatenate(chunks, axis=1)

    s_voiced = solo("voiced request", 61, True)
    s_plain = solo("plain request", 62, False)
    srv = ContinuousBatcher(engine, slots=2)
    r_v = srv.submit("voiced request", max_new_tokens=14, seed=61,
                     temperature=0.7, top_p=0.8, repetition_penalty=1.1,
                     prompt_text=["ref transcript"],
                     prompt_tokens=[ref_codes])
    r_p = srv.submit("plain request", max_new_tokens=14, seed=62,
                     temperature=0.7, top_p=0.8, repetition_penalty=1.1)
    codes, done = _collect(srv.run())
    assert {r_v, r_p} <= done
    np.testing.assert_array_equal(codes[r_v], s_voiced)
    np.testing.assert_array_equal(codes[r_p], s_plain)


def test_per_request_refs_conflict_with_session_prefix(engine):
    """Per-request references are rejected while a session prefix is set."""
    ref_codes = np.zeros((TINY_CONFIG.num_codebooks, 4), np.int64)
    engine.set_prefix(["session voice"], [ref_codes])
    try:
        srv = ContinuousBatcher(engine, slots=1)
        with pytest.raises(ValueError, match="prefix"):
            srv.submit("x", max_new_tokens=4, seed=1,
                       temperature=0.7, top_p=0.8, repetition_penalty=1.1,
                       prompt_text=["v"], prompt_tokens=[ref_codes])
    finally:
        engine.clear_prefix()


def test_priority_admission_order(engine):
    """With one slot, a high-priority late submission admits before earlier
    normal ones (FIFO within a level); every request still matches its solo
    run (scheduling never changes sampling)."""
    solos = {i: _solo_codes(engine, f"prio {i}", seed=70 + i, max_new=6)
             for i in range(3)}
    srv = ContinuousBatcher(engine, slots=1)
    rids = {}
    # occupy the slot so the next three all queue
    r0 = srv.submit("occupier", max_new_tokens=6, seed=69,
                    temperature=0.7, top_p=0.8, repetition_penalty=1.1)
    for i in range(3):
        rids[i] = srv.submit(
            f"prio {i}", max_new_tokens=6, seed=70 + i,
            temperature=0.7, top_p=0.8, repetition_penalty=1.1,
            priority=10 if i == 2 else 0,
        )
    order = []
    events = []
    for ev in srv.run():
        events.append(ev)
        if ev.request_id not in order and ev.request_id != r0:
            order.append(ev.request_id)
    assert order[0] == rids[2], "high-priority request did not admit first"
    assert order[1:] == [rids[0], rids[1]]  # FIFO within the normal level
    codes, done = _collect(events)
    for i in range(3):
        np.testing.assert_array_equal(codes[rids[i]], solos[i])


def test_deadline_auto_cancels(engine):
    """A request whose timeout_s expires while queued is auto-cancelled with
    ONE final empty done event (consumers see the stream end — unlike an
    explicit cancel, which is silent); one with a generous deadline
    completes."""
    srv = ContinuousBatcher(engine, slots=1)
    r_slow = srv.submit("long occupier", max_new_tokens=24, seed=81,
                        temperature=0.7, top_p=0.8, repetition_penalty=1.1)
    r_dead = srv.submit("will expire", max_new_tokens=8, seed=82,
                        temperature=0.7, top_p=0.8, repetition_penalty=1.1,
                        timeout_s=1e-6)
    r_ok = srv.submit("will finish", max_new_tokens=8, seed=83,
                      temperature=0.7, top_p=0.8, repetition_penalty=1.1,
                      timeout_s=600.0)
    events = list(srv.run())
    dead_evs = [e for e in events if e.request_id == r_dead]
    assert len(dead_evs) == 1 and dead_evs[0].done
    assert dead_evs[0].codes.shape[1] == 0
    codes, done = _collect(events)
    assert {r_slow, r_ok, r_dead} <= done


def test_queue_backpressure_and_stats(engine):
    """max_queue bounds unadmitted requests (QueueFull raised at the cap);
    stats() reports completions with sane latency ordering."""
    from fish_tts_tpu.engine.serve import QueueFull

    srv = ContinuousBatcher(engine, slots=1, max_queue=2)
    rids = [srv.submit(f"bp {i}", max_new_tokens=6, seed=50 + i,
                       temperature=0.7, top_p=0.8, repetition_penalty=1.1)
            for i in range(2)]  # both queued (nothing admits until step)
    with pytest.raises(QueueFull):
        srv.submit("over the cap", max_new_tokens=6, seed=59,
                   temperature=0.7, top_p=0.8, repetition_penalty=1.1)
    codes, done = _collect(srv.run())
    assert set(rids) <= done
    st = srv.stats()
    assert st["completed"] == 2 and st["queue_depth"] == 0
    assert st["live_slots"] == 0 and st["slots"] == 1
    # TTFT includes queue wait; the second request waited for the first
    assert 0 <= st["queue_wait_p50_s"] <= st["queue_wait_p95_s"]
    assert st["ttft_p50_s"] >= st["queue_wait_p50_s"]
    assert st["frames_per_request_s"] > 0


def test_per_request_sampling_params(engine):
    """Params are per-slot: two co-tenant requests with different
    temperatures each match their solo runs at those temperatures."""
    def solo(text, seed, temp):
        engine.reseed(seed)
        chunks = [
            r.codes for r in engine.generate_long(
                text, max_new_tokens=12, streaming=True,
                temperature=temp, top_p=0.8, repetition_penalty=1.1,
            ) if r.action == "sample"
        ]
        return np.concatenate(chunks, axis=1)

    s1 = solo("cool stream", 7, 0.5)
    s2 = solo("hot stream", 8, 1.3)
    srv = ContinuousBatcher(engine, slots=2)
    r1 = srv.submit("cool stream", max_new_tokens=12, seed=7,
                    temperature=0.5, top_p=0.8, repetition_penalty=1.1)
    r2 = srv.submit("hot stream", max_new_tokens=12, seed=8,
                    temperature=1.3, top_p=0.8, repetition_penalty=1.1)
    codes, done = _collect(srv.run())
    np.testing.assert_array_equal(codes[r1], s1)
    np.testing.assert_array_equal(codes[r2], s2)


def test_mixed_bucket_group_admission(tiny_tokenizer):
    """Two requests admitted in the SAME round whose prompts land in
    different buckets: the group prefills at the larger shared bucket, and
    exact padding invariance keeps both bit-identical to their solo runs
    (which pad to their own buckets)."""
    params = dual_ar.init_params(
        jax.random.PRNGKey(0), TINY_CONFIG, dtype=jnp.float32
    )
    ecfg = EngineConfig(prompt_buckets=(16, 32), decode_chunk=8,
                        first_chunk=4)
    eng = GenerationEngine(
        params, TINY_CONFIG, tiny_tokenizer, engine_cfg=ecfg, seed=0
    )
    short_text = "hi"
    long_text = "bucket two here"  # 29 prompt tokens -> bucket 32; short=16
    solo_s = _solo_codes(eng, short_text, seed=41, max_new=12)
    solo_l = _solo_codes(eng, long_text, seed=42, max_new=12)

    srv = ContinuousBatcher(eng, slots=2)
    r_s = srv.submit(short_text, max_new_tokens=12, seed=41,
                     temperature=0.7, top_p=0.8, repetition_penalty=1.1)
    r_l = srv.submit(long_text, max_new_tokens=12, seed=42,
                     temperature=0.7, top_p=0.8, repetition_penalty=1.1)
    codes, done = _collect(srv.run())
    assert {r_s, r_l} <= done
    np.testing.assert_array_equal(codes[r_s], solo_s)
    np.testing.assert_array_equal(codes[r_l], solo_l)


def test_serve_with_voice_prefix(engine):
    """Admission forks the engine's cached voice-profile prefix: the served
    codes match a solo run conditioned on the same references."""
    rng = np.random.RandomState(3)
    codes_ref = rng.randint(0, 24, (TINY_CONFIG.num_codebooks, 8)).astype(np.int64)
    codes_ref[0] = rng.randint(0, 48, 8)
    engine.set_prefix(["ref text"], [codes_ref])
    try:
        solo = _solo_codes(engine, "with a voice", seed=31, max_new=14)
        srv = ContinuousBatcher(engine, slots=2)
        rid = srv.submit("with a voice", max_new_tokens=14, seed=31,
                         temperature=0.7, top_p=0.8, repetition_penalty=1.1)
        codes, done = _collect(srv.run())
        assert rid in done
        np.testing.assert_array_equal(codes[rid], solo)
    finally:
        engine.clear_prefix()


def test_scheduler_soak_random_interleaving(engine):
    """Randomized soak over a 3-slot pool: staggered submits with mixed
    priorities and budgets, random mid-flight cancels.  Invariants held
    throughout: the pool fully drains; every un-cancelled request emits
    exactly one done event and codes bit-identical to its solo run; a
    cancelled id emits nothing after the cancel lands (+1 pipelined round)
    and what it did emit is a prefix of its solo run; per-event
    ``frames_total`` matches the cumulative column count."""
    rng = np.random.RandomState(1234)
    plans = [
        {"text": f"soak request {i}", "seed": 500 + i,
         "max_new": int(rng.randint(4, 20)),
         "priority": int(rng.randint(0, 3))}
        for i in range(12)
    ]
    solos = {
        p["seed"]: _solo_codes(engine, p["text"], p["seed"], p["max_new"])
        for p in plans
    }

    srv = ContinuousBatcher(engine, slots=3, max_queue=64)
    pending = list(plans)
    submitted: dict[int, dict] = {}
    cancelled_at: dict[int, int] = {}
    frames_seen: dict[int, int] = {}
    codes_parts: dict[int, list] = {}
    done_ids: set[int] = set()
    round_i = 0
    while pending or srv.busy:
        for _ in range(int(rng.randint(0, 3))):
            if not pending:
                break
            p = pending.pop()
            rid = srv.submit(
                p["text"], max_new_tokens=p["max_new"], seed=p["seed"],
                temperature=0.7, top_p=0.8, repetition_penalty=1.1,
                priority=p["priority"],
            )
            submitted[rid] = p
        live = [r for r in submitted
                if r not in done_ids and r not in cancelled_at]
        if live and (rng.rand() < 0.2 or (round_i == 4 and not cancelled_at)):
            victim = live[int(rng.randint(len(live)))]
            srv.cancel(victim)
            cancelled_at[victim] = round_i
        if srv.busy:
            for ev in srv.step():
                rid = ev.request_id
                assert rid in submitted
                assert rid not in done_ids, "event after done"
                if rid in cancelled_at:
                    assert round_i <= cancelled_at[rid] + 1, \
                        f"event {round_i} rounds after cancel " \
                        f"at {cancelled_at[rid]}"
                if ev.codes.shape[1]:
                    codes_parts.setdefault(rid, []).append(ev.codes)
                    frames_seen[rid] = (
                        frames_seen.get(rid, 0) + ev.codes.shape[1])
                    assert ev.frames_total == frames_seen[rid]
                if ev.done:
                    done_ids.add(rid)
        round_i += 1
        assert round_i < 2000, "soak did not converge"

    # drained: no live slots, nothing queued
    st = srv.stats()
    assert not srv.busy and st["live_slots"] == 0 and st["queue_depth"] == 0
    # every un-cancelled request finished, bit-identical to its solo run;
    # cancelled ones never finished and emitted a solo prefix
    for rid, p in submitted.items():
        solo = solos[p["seed"]]
        if rid in done_ids:
            # completed (a same-round cancel may have raced completion —
            # then the done event simply won)
            got = np.concatenate(codes_parts[rid], axis=1)
            np.testing.assert_array_equal(got, solo)
        elif rid in cancelled_at:
            if rid in codes_parts:
                got = np.concatenate(codes_parts[rid], axis=1)
                np.testing.assert_array_equal(
                    got, solo[:, : got.shape[1]])
        else:
            raise AssertionError(f"request {rid} never finished")
    assert len(done_ids) >= 1 and len(cancelled_at) >= 1  # soak exercised both


def test_prepare_input_validation(engine):
    """Out-of-range sampling params and negative budgets raise real
    ValueErrors (not asserts, which python -O would drop)."""
    srv = ContinuousBatcher(engine, slots=1)
    for kw in ({"temperature": 0.0}, {"top_p": 5.0},
               {"repetition_penalty": 2.5}, {"max_new_tokens": -3}):
        with pytest.raises(ValueError):
            srv.prepare("x", **kw)


def test_concurrent_prepares_get_distinct_keys(engine):
    """Unseeded prepares from many threads must draw DISTINCT request keys
    (the engine key split is locked; a race would hand two requests the
    same RNG stream -> identical 'random' audio)."""
    import threading as th

    srv = ContinuousBatcher(engine, slots=1)
    keys, errs = [], []
    lock = th.Lock()

    def worker():
        try:
            req = srv.prepare("key race probe")
            with lock:
                keys.append(tuple(np.asarray(req.key).tolist()))
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [th.Thread(target=worker) for _ in range(32)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert not errs
    assert len(set(keys)) == 32


def test_cancel_then_expiry_stays_silent(engine):
    """An explicitly cancelled request whose deadline later passes emits
    NO event (cancel is silent by contract; expiry must not resurrect
    one)."""
    srv = ContinuousBatcher(engine, slots=1)
    r_live = srv.submit("keeps the pool busy", max_new_tokens=30, seed=70,
                        temperature=0.7, top_p=0.8, repetition_penalty=1.1)
    r_gone = srv.submit("cancelled then expires", max_new_tokens=30, seed=71,
                        temperature=0.7, top_p=0.8, repetition_penalty=1.1,
                        timeout_s=0.15)
    srv.cancel(r_gone)
    import time as _t
    _t.sleep(0.2)  # deadline passes before the next step
    events = list(srv.run())
    assert all(ev.request_id != r_gone for ev in events)
    assert any(ev.request_id == r_live and ev.done for ev in events)


def test_prefix_change_between_prepare_and_admission_fails_request(engine):
    """set_prefix between prepare() and admission makes the prepared
    encoding stale: the request must FAIL (final done event, slot freed)
    instead of decoding a corrupted context; co-tenants are unaffected."""
    import numpy as _np

    solo = _solo_codes(engine, "healthy co-tenant", seed=81, max_new=12)
    srv = ContinuousBatcher(engine, slots=2)
    stale = srv.prepare("prepared before prefix", max_new_tokens=12, seed=80)
    # engine gains a prefix AFTER the prepare
    codes = _np.random.RandomState(0).randint(
        0, engine.cfg.codebook_size // 2,
        (engine.cfg.num_codebooks, 4)).astype(_np.int64)
    engine.set_prefix(["ref transcript"], [codes])
    try:
        srv.enqueue(stale)
        ok = srv.submit("healthy co-tenant", max_new_tokens=12, seed=81,
                        temperature=0.7, top_p=0.8, repetition_penalty=1.1)
        codes_by_id, done = _collect(srv.run())
        assert stale.id in done  # failed with a final done event...
        assert stale.id not in codes_by_id or \
            codes_by_id[stale.id].shape[1] == 0  # ...and no audio
        assert ok in done
        # the co-tenant decodes against the NEW prefix — identical to a
        # solo run with the same seed under that prefix
        solo_pfx = _solo_codes(engine, "healthy co-tenant", seed=81,
                               max_new=12)
        np.testing.assert_array_equal(codes_by_id[ok], solo_pfx)
    finally:
        engine.clear_prefix()
    # without the prefix, the same seed gives different codes (sanity that
    # the prefix actually changed the decode context above)
    assert solo.shape != solo_pfx.shape or not np.array_equal(solo, solo_pfx)


def test_rejected_admission_onto_dirty_slot_forces_finish(engine):
    """A stale-prefix rejection landing on a predictively-retired slot must
    NOT clear that slot's pending force-finish: the device done flag is
    still set and the pool drains (no zombie slot decoding forever)."""
    import numpy as _np

    srv = ContinuousBatcher(engine, slots=1)
    # occupy the single slot with a budget-bound request; once its final
    # chunk dispatches, the slot is predictively retired (marked dirty)
    first = srv.submit("budget bound occupant", max_new_tokens=6, seed=90,
                       temperature=0.7, top_p=0.8, repetition_penalty=1.1)
    ev1 = srv.step()  # admit + dispatch chunk 1 (dispatched 1+8 >= 6: dirty)
    assert srv._dirty == {0}
    # the slot is now free; a stale request (prepared pre-prefix) gets it
    stale = srv.prepare("stale against new prefix", max_new_tokens=6,
                        seed=91)
    codes = _np.random.RandomState(1).randint(
        0, engine.cfg.codebook_size // 2,
        (engine.cfg.num_codebooks, 4)).astype(_np.int64)
    engine.set_prefix(["ref transcript"], [codes])
    try:
        srv.enqueue(stale)
        events = ev1 + list(srv.run())
    finally:
        engine.clear_prefix()
    by_id, done = _collect(events)
    assert first in done and stale.id in done
    # the force-finish survived the rejection: nothing left running
    assert not srv.busy and srv._dirty == set()
    assert bool(np.asarray(srv._state["done"]).all())


def test_same_length_prefix_swap_fails_request(engine):
    """A prefix swapped for a DIFFERENT one of identical token length
    between prepare() and admission must also fail the stale request:
    the guard compares prefix generations, not lengths (a same-length
    swap garbles audio just the same)."""
    import numpy as _np

    def mk(seed):
        return _np.random.RandomState(seed).randint(
            0, engine.cfg.codebook_size // 2,
            (engine.cfg.num_codebooks, 4)).astype(_np.int64)

    engine.set_prefix(["ref transcript"], [mk(0)])
    try:
        len_a = int(engine._prefix_state["pos"][0])
        srv = ContinuousBatcher(engine, slots=2)
        stale = srv.prepare("vs A", max_new_tokens=8, seed=85)
        engine.set_prefix(["ref transcript"], [mk(1)])  # same shape/length
        assert int(engine._prefix_state["pos"][0]) == len_a  # same LENGTH
        srv.enqueue(stale)
        codes_by_id, done = _collect(srv.run())
        assert stale.id in done
        assert stale.id not in codes_by_id or \
            codes_by_id[stale.id].shape[1] == 0
    finally:
        engine.clear_prefix()


def test_reset_recovers_from_poisoned_pool_state(engine):
    """After a runtime step failure the donated pool state can be gone;
    reset() must rebuild it, drop live/queued requests, and leave the
    batcher serving new requests normally (no zombie server)."""
    solo = _solo_codes(engine, "after the reset", seed=95, max_new=8)
    srv = ContinuousBatcher(engine, slots=2)
    srv.submit("doomed live request", max_new_tokens=20, seed=93,
               temperature=0.7, top_p=0.8, repetition_penalty=1.1)
    srv.step()  # admit + dispatch: state is now mid-flight
    # simulate the post-donation wreckage of a failed device step
    jax.tree_util.tree_map(
        lambda x: x.delete() if hasattr(x, "delete") else None,
        srv._state,
    )
    srv.reset()
    assert not srv.busy
    assert srv.stats()["live_slots"] == 0
    ok = srv.submit("after the reset", max_new_tokens=8, seed=95,
                    temperature=0.7, top_p=0.8, repetition_penalty=1.1)
    codes_by_id, done = _collect(srv.run())
    assert ok in done
    np.testing.assert_array_equal(codes_by_id[ok], solo)


def test_pool_pcm_matches_host_path():
    """The pool vocoder program emits int16 PCM on device (the D2H audio
    fetch was ~45% of the serving round's wall when transferred as float —
    scripts/profile_serving.py).  The device conversion must be BIT-EXACT
    vs the host path (``to_pcm_bytes`` on the float audio): the decoder's
    tanh bounds samples inside (-1, 1) so ``*32767`` cannot overflow, and
    XLA's float->int convert truncates toward zero like numpy astype."""
    import jax.numpy as _jnp

    from fish_tts_tpu.models import vocoder_stream as vs
    from fish_tts_tpu.testing import make_tiny_tts
    from fish_tts_tpu.utils.audio import to_pcm_bytes

    tts = make_tiny_tts()
    vcfg = tts._vocoder_cfg
    B = 3
    init, dec = tts._pool_vocoder_fns(B)
    st = init(tts._vocoder_params)
    rng = np.random.RandomState(0)
    codes = rng.randint(
        0, vcfg.residual_codebook_size, (B, vcfg.num_codebooks, 6)
    ).astype(np.int32)
    active = _jnp.asarray(np.array([True, True, False]))
    reset = _jnp.zeros((B,), bool)
    _, pcm = dec(tts._vocoder_params, st, _jnp.asarray(codes), active, reset)
    assert np.asarray(pcm).dtype == np.int16

    # host path: float audio from the same fresh state, converted on host
    st_f = vs.init_decode_state(tts._vocoder_params, vcfg, batch=B)
    _, audio = vs.decode_chunk_pool(
        tts._vocoder_params, vcfg, st_f, _jnp.asarray(codes), active, reset
    )
    expect = to_pcm_bytes(np.asarray(audio, dtype=np.float32))
    assert np.asarray(pcm).tobytes() == expect


def test_pool_cache_grows_and_shrinks_with_load(engine, monkeypatch):
    """With a tiny CACHE_FLOOR the pool KV allocation starts small, grows
    as a stream's extent crosses bucket boundaries, shrinks back after it
    retires — and the served codes stay bit-identical to the solo run
    (allocation length is storage, never math)."""
    from fish_tts_tpu.engine import generate as generate_mod

    monkeypatch.setattr(generate_mod, "CACHE_FLOOR", 8)
    solo = _solo_codes(engine, "grow the pool", seed=9, max_new=24)

    srv = ContinuousBatcher(engine, slots=2)
    sizes = [srv._state["kv"]["k"].shape[3]]
    assert sizes[0] < TINY_CONFIG.max_seq_len  # started at a small bucket
    rid = srv.submit(
        "grow the pool", max_new_tokens=24, seed=9,
        temperature=0.7, top_p=0.8, repetition_penalty=1.1,
    )
    events = []
    while srv.busy:
        events += srv.step()
        sizes.append(srv._state["kv"]["k"].shape[3])
    codes, done = _collect(events)
    assert rid in done
    np.testing.assert_array_equal(codes[rid], solo)
    assert max(sizes) > sizes[0]  # grew with the live extent
    # idle rounds after retirement shrink the allocation back down
    srv.step()
    assert srv._state["kv"]["k"].shape[3] <= max(sizes)
