"""Continuous batching: slot-based serving on top of the batched decoder.

The reference has no batching at all (batch hard-coded 1,
/root/reference/fish_tts/models/inference.py:314, 676) and ``generate_batch``
is a *static* batch — all streams start together.  Real serving needs
requests to JOIN a running decode: this module keeps a fixed pool of B slots
decoding in one device program and admits queued requests into free slots
between chunks, without disturbing the other slots.

Design (TPU-shaped):
- ONE persistent batched decode state (``decode.init_state(B)``).  Free
  slots sit with ``done=True`` so the decode program holds them (no position
  advance, no emission) at negligible cost.
- Admission = ONE device program per scheduler round (:func:`_admit_group`):
  a pool-sized batched prefill over every request admitted this round
  (padded with sentinel rows — prefill is weight-bound, so spare rows are
  nearly free and the compile set stays one program per prompt bucket)
  followed by a scatter-install of the prefilled KV rows into the slots.
  The other slots' caches are untouched; they resume decoding in the very
  next chunk.  On the tunneled platform this matters enormously: the
  per-request path cost ~45-60 ms of dispatch overhead per admission
  (~500 ms pool stall per 8-request wave); the group program is one
  dispatch per wave.
- Reproducibility: every request carries its own PRNG key, and the decode
  state keeps PER-SLOT step counters (decode.init_state) with per-slot
  ``fold_in(key, step)`` frame keys — a request's sampled codes are
  bit-identical to a solo ``generate_long`` run with the same seed, no
  matter when it was admitted or who its co-tenants are (tested in
  tests/test_serve.py).
- The decode chunk is dispatched over the full pool; per-slot EOS uses the
  existing on-device ``done`` flags.  Token budgets are enforced by
  *predictive retirement*: the host knows ``max_new`` up front, so a slot
  whose dispatched frames will exhaust it is freed at dispatch time — its
  successor admits the next round (device-ordered after the final chunk)
  and budget-bound turnover wastes zero decode work.  Only device-side EOS
  pays the one speculative in-flight chunk.

Events are streaming-semantics (each emitted frame including the EOS frame,
like the reference's streaming path, inference.py:271-274); callers that
want batch semantics drop the final frame.
"""

from __future__ import annotations

import itertools
import logging
import threading
import time
from collections import deque
from dataclasses import dataclass
from functools import partial
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from fish_tts_tpu.engine import decode as decode_mod
from fish_tts_tpu.engine.generate import (
    GenerationEngine, _cache_bucket, _kv_bucket, _pick_bucket,
)

logger = logging.getLogger(__name__)


class QueueFull(RuntimeError):
    """Raised by ``submit`` when the request queue is at ``max_queue``
    (backpressure: the caller should retry later or shed load)."""


@dataclass
class Event:
    """One scheduler-round outcome for one request."""

    request_id: int
    codes: np.ndarray  # (num_codebooks, m) new vocoder rows this round
    done: bool
    frames_total: int  # cumulative emitted frames for this request
    slot: int = -1  # pool slot that decoded this chunk (stable per request)


@dataclass
class _Request:
    id: int
    values: np.ndarray  # (1+K, T) prompt matrix
    max_new: int
    temperature: float
    top_p: float
    repetition_penalty: float
    key: jax.Array  # slot base key (fold_in(request_key, 0))
    produced: int = 0
    prompt_len: int = 0  # full context length (prefix + prompt)
    prefix_len: int = 0  # engine prefix length at prepare() time (0 = none)
    prefix_gen: int = 0  # engine prefix GENERATION at prepare() time
    priority: int = 0  # higher admits first (FIFO within a priority)
    deadline: float = 0.0  # time.monotonic() deadline; 0 = none
    # observability timestamps (time.monotonic)
    t_submit: float = 0.0
    t_admit: float = 0.0
    t_first: float = 0.0  # first frames delivered to the consumer
    # frames that will exist once every in-flight chunk lands (prefill frame
    # counts 1; each dispatched chunk adds ``chunk``): the scheduler's
    # budget lookahead — when it reaches max_new at dispatch, the slot is
    # retired immediately instead of waiting a round for the fetch to
    # confirm what the host already knows (predictive retirement)
    dispatched: int = 1
    finished: bool = False  # done event emitted; drop any late frames
    # prefill-sampled first frame, still on device: fetched together with
    # the request's first decode chunk so admission never blocks on a
    # device->host round trip of its own
    first_dev: object = None


@partial(
    jax.jit,
    static_argnames=("cfg", "ids", "top_k", "approx", "kv_pre", "rows",
                     "scratch_seq", "window", "fast_kernel"),
    donate_argnames=("state",),
)
def _admit_group(
    params, rope, state, prefix_kv, prefix_pos, padded, lengths, keys,
    t, p, r, slots, *, cfg, ids, top_k, approx, kv_pre: int, rows: int,
    scratch_seq: int, window: int, fast_kernel: bool = False,
):
    """ONE device program admitting a whole group of requests.

    Zero-initializes a G-row scratch state *inside* the jit (``scratch_seq``
    rows — just enough for the padded write extent), runs the batched
    prefill, then scatter-installs every row into its pool slot.  The old
    per-request path (B=1 prefill + install + ~8 small reset/transfer
    dispatches) cost ~45-60 ms *per request* on the tunneled platform —
    nearly all of it per-dispatch overhead, not compute; a wave of 8
    admissions stalled the pool for ~500 ms.  As one program the whole wave
    is a single dispatch (prefill at G rows costs about the same HBM
    traffic as at 1 — it is weight-bound).

    ``slots`` may contain the sentinel ``num_slots`` for padding rows
    (groups are always G = pool size so the compile set stays one program
    per (bucket, rows)): their updates drop out of the scatter
    (``mode="drop"``) and the pool is untouched.

    With a cached voice prefix, ``prefix_kv`` is the (layers, 1, heads, S,
    d) prefix cache and ``kv_pre`` its bucketed row count: the scratch
    forks the prefix rows and prefill continues at position ``kv_pre``
    reading them.  Without one, ``prefix_kv`` is None and ``kv_pre`` 0.

    The slot's step restarts at 0 (per-slot frame counter) and its penalty
    window clears — exactly the state a solo decode would have right after
    prefill, so served codes stay bit-identical to solo runs.
    """
    G = padded.shape[0]
    adm = decode_mod.init_state(
        params, cfg, batch=G, max_seq_len=scratch_seq, window=window
    )
    if prefix_kv is not None:
        def fork(vv):
            sl = vv[:, :, :, :scratch_seq]
            return jnp.broadcast_to(sl, (sl.shape[0], G) + sl.shape[2:])

        adm["kv"] = {kk: fork(vv) for kk, vv in prefix_kv.items()}
        # true write offset (NOT the kv_pre bucket): prefill's cache_bias
        # validates rows < pos only
        adm["pos"] = jnp.broadcast_to(prefix_pos, (G,)).astype(jnp.int32)
    adm, first = decode_mod.prefill(
        params, rope, adm, padded, lengths, keys, t, p, r,
        cfg=cfg, ids=ids, top_k=top_k, approx=approx, kv_bucket=kv_pre,
        # same first-frame path as the solo prefill_chunk (TTFA) route, so
        # served first frames stay consistent with solo streaming on TPU
        fast_kernel=fast_kernel,
    )
    k = state["kv"]["k"].at[:, slots, :, :rows].set(
        adm["kv"]["k"][:, :, :, :rows], mode="drop"
    )
    v = state["kv"]["v"].at[:, slots, :, :rows].set(
        adm["kv"]["v"][:, :, :, :rows], mode="drop"
    )
    return {
        "kv": {"k": k, "v": v},
        "frame": state["frame"].at[slots].set(adm["frame"], mode="drop"),
        "pos": state["pos"].at[slots].set(adm["pos"], mode="drop"),
        "prev": state["prev"].at[slots].set(
            jnp.zeros((G,) + state["prev"].shape[1:], state["prev"].dtype),
            mode="drop",
        ),
        "step": state["step"].at[slots].set(
            jnp.zeros((G,), jnp.int32), mode="drop"
        ),
        "done": state["done"].at[slots].set(adm["done"], mode="drop"),
    }, first


@partial(jax.jit, donate_argnames=("state",))
def _mark_done(state, mask):
    """Force-finish slots (budget exhausted / freed) on device."""
    return {**state, "done": state["done"] | mask}


class ContinuousBatcher:
    """Slot scheduler over one batched decode program.

    >>> srv = ContinuousBatcher(engine, slots=4)
    >>> rid = srv.submit("hello world", max_new_tokens=200)
    >>> for ev in srv.run():
    ...     consume(ev.request_id, ev.codes, ev.done)

    ``submit`` is thread-safe (a host thread can keep feeding requests while
    another drives ``run``/``step``); the device work is all dispatched from
    the thread calling ``step``.
    """

    def __init__(
        self,
        engine: GenerationEngine,
        slots: int = 8,
        chunk: int | None = None,
        max_queue: int = 0,
    ):
        self.engine = engine
        self.slots = slots
        self.chunk = chunk or engine.engine_cfg.decode_chunk
        #: queue backpressure bound; 0 = unbounded.  ``submit`` raises
        #: :class:`QueueFull` when the bound is hit.
        self.max_queue = max_queue
        self._lock = threading.Lock()
        self._queue: deque[_Request] = deque()
        self._cancelled: set[int] = set()
        self._done_stats: deque[dict] = deque(maxlen=1024)
        self._n_expired = 0  # lifetime deadline expiries (driver thread only)
        self._ids = itertools.count()
        self._slot_req: list[_Request | None] = [None] * slots
        # pool state: free slots are done=True so decode holds them.  The KV
        # allocation starts at the smallest bucket and is re-sized per round
        # to the live workload's extent (_pool_resize) — decode cost is
        # ~linear in the ALLOCATED cache length (decode.resize_cache), so a
        # full-context pool would tax every request with the longest
        # possible request's cost.  Mesh pools stay full-size (no sharded
        # resize path).
        state = engine._init_state(slots, seq_len=self._pool_floor())
        self._state = _mark_done(state, jnp.ones((slots,), bool))
        # slots retired at dispatch time (predictive budget retirement):
        # the device state is still mid-decode on the request's final chunk
        # but the slot is admit-eligible next round; if admission does not
        # take it, it is force-finished so it stops burning decode work
        self._dirty: set[int] = set()
        # per-slot sampling params + base keys, mirrored on host; the
        # device copies are cached and rebuilt only on admission (they are
        # otherwise re-uploaded every ~130 ms decode round for nothing)
        self._t = np.full((slots, 1), 0.7, np.float32)
        self._p = np.full((slots, 1), 0.8, np.float32)
        self._r = np.full((slots, 1), 1.1, np.float32)
        base = jax.random.PRNGKey(0)
        self._keys = [jax.random.fold_in(base, i) for i in range(slots)]
        self._dev_cache: tuple | None = None
        # one in-flight decode chunk: (frames_dev, emitted_dev, snapshot of
        # slot->request at dispatch time).  Chunk k+1 is dispatched before
        # chunk k's outputs are fetched, so the device never idles on the
        # host's per-chunk fetch round trip (the same pipelining the
        # single-stream engine uses).
        self._pending = None

    # -- pool cache allocation ----------------------------------------------

    def _pool_floor(self) -> int | None:
        """Initial pool KV allocation: the smallest cache bucket (None =
        full context on a mesh, where resize is not plumbed)."""
        if self.engine.mesh is not None:
            return None
        return _cache_bucket(1, self.engine.cfg.max_seq_len)

    def _pool_resize(self, min_rows: int, grow_only: bool = False) -> None:
        """Re-allocate the pool cache to the bucket of ``min_rows`` (the
        caller's live-extent bound: every live slot's rows must sit below
        it).  Admission passes ``grow_only`` — its bound covers only the
        incoming prompts, and live streams may reach further."""
        if self.engine.mesh is not None:
            return
        alloc = _cache_bucket(min_rows, self.engine.cfg.max_seq_len)
        cur = self._state["kv"]["k"].shape[3]
        if alloc > cur or (alloc < cur and not grow_only):
            self._state = decode_mod.resize_cache(self._state, new_len=alloc)

    # -- submission --------------------------------------------------------

    def submit(self, text: str, **kw) -> int:
        """``prepare`` + ``enqueue`` in one call; see :meth:`prepare` for
        the parameters.  Thread-safe."""
        return self.enqueue(self.prepare(text, **kw))

    def prepare(
        self,
        text: str,
        *,
        max_new_tokens: int = 2048,
        temperature: float = 0.7,
        top_p: float = 0.8,
        repetition_penalty: float = 1.1,
        seed: int | None = None,
        key: jax.Array | None = None,
        prompt_text: list[str] | None = None,
        prompt_tokens: list[np.ndarray] | None = None,
        priority: int = 0,
        timeout_s: float = 0.0,
    ) -> _Request:
        """Build a request (host-side tokenize/prompt/key work, no
        scheduler state touched); returns a ``_Request`` to hand to
        :meth:`enqueue`.  ``seed``/``key`` pin the request's RNG: with
        ``seed``, the served codes are bit-identical to
        ``engine.reseed(seed)`` followed by a solo ``generate_long`` (the
        seed goes through the same one split the engine's key schedule
        performs).

        ``prompt_text``/``prompt_tokens``: PER-REQUEST voice references
        (transcripts + ``(K, T)`` code arrays), inlined into the request's
        prompt exactly like a solo ``generate_long(prompt_text=...,
        prompt_tokens=...)`` — different requests in the same pool can speak
        with different voices.  Mutually exclusive with a session-level
        cached KV prefix (``engine.set_prefix``): the pool's admission
        program forks ONE shared prefix, so per-request voices require the
        engine to have no prefix set.

        ``priority``: higher-priority requests admit first (FIFO within a
        priority level; running requests are never preempted).
        ``timeout_s``: wall-clock deadline from submission — a request
        still queued or decoding past it is auto-cancelled with one final
        ``done`` event (empty codes), unlike an explicit ``cancel`` which
        is silent (the caller initiated it).

        ``prepare`` does the expensive host-side work (tokenize, prompt
        assembly, key derivation) WITHOUT touching scheduler state, so
        callers can keep their own locks narrow; :meth:`enqueue` is the
        cheap thread-safe hand-off.  Raises ``QueueFull`` eagerly when the
        queue is already at ``max_queue`` so shed load costs no encode."""
        temperature = float(temperature)
        top_p = float(top_p)
        repetition_penalty = float(repetition_penalty)
        priority = int(priority)
        timeout_s = float(timeout_s)
        max_new_tokens = int(max_new_tokens)
        # reference ranges, inference.py:763-765.  Real raises (not assert:
        # python -O would silently drop the server's 400 rejections)
        if not (0 < top_p <= 1 and 0 < repetition_penalty < 2
                and 0 < temperature < 2):
            raise ValueError(
                "sampling params out of range: need 0 < top_p <= 1, "
                "0 < repetition_penalty < 2, 0 < temperature < 2"
            )
        if max_new_tokens < 0:
            raise ValueError("max_new_tokens must be >= 0 (0 = unlimited)")
        with self._lock:
            self._check_queue_bound()
        eng = self.engine
        if key is None:
            key = (
                jax.random.split(jax.random.PRNGKey(seed))[1]
                if seed is not None else eng._next_key()
            )
        # slot base key = fold_in(request_key, 0): exactly what a solo B=1
        # generate_long derives for its one slot (decode.normalize_keys)
        slot_key = jax.random.fold_in(key, 0)
        has_refs = bool(prompt_text) or bool(prompt_tokens)
        # ONE consistent snapshot: a concurrent set_prefix/clear_prefix
        # between a has_prefix check and the state read must not crash or
        # mix epochs (admission re-checks the generation)
        prefix_state, prefix_gen = eng._prefix_ref
        if has_refs and prefix_state is not None:
            raise ValueError(
                "per-request references cannot be combined with a "
                "session-level cached prefix (engine.set_prefix); clear "
                "the prefix or drop the per-request references"
            )
        if prefix_state is not None:
            enc = eng._encode_suffix(text)
            prefix_len = int(prefix_state["pos"][0])
        else:
            from fish_tts_tpu.models.prompt import build_prompt

            enc = build_prompt(
                eng.tokenizer, text, eng.cfg.num_codebooks,
                prompt_texts=prompt_text or [],
                prompt_codes=prompt_tokens or [],
            )
            prefix_len = 0
        prompt_len = prefix_len + enc.values.shape[1]
        cfg = eng.cfg
        reserve = min(2048, cfg.max_seq_len // 2)
        if prompt_len > cfg.max_seq_len - reserve:
            raise ValueError(f"Prompt is too long: {prompt_len}")
        max_new = min(max_new_tokens, cfg.max_seq_len - prompt_len) \
            if max_new_tokens else cfg.max_seq_len - prompt_len
        return _Request(
            id=next(self._ids), values=enc.values, max_new=max_new,
            temperature=temperature, top_p=top_p,
            repetition_penalty=repetition_penalty, key=slot_key,
            prompt_len=prompt_len, prefix_len=prefix_len,
            prefix_gen=prefix_gen,
            t_submit=time.monotonic(),
            priority=priority,
            deadline=(time.monotonic() + timeout_s) if timeout_s else 0.0,
        )

    def _check_queue_bound(self) -> None:
        """Raise ``QueueFull`` at the ``max_queue`` bound.  Caller must
        hold ``self._lock``."""
        if self.max_queue and len(self._queue) >= self.max_queue:
            raise QueueFull(
                f"serve queue is full ({self.max_queue} requests)"
            )

    def enqueue(self, req: _Request) -> int:
        """Queue a prepared request (cheap, thread-safe); returns its id."""
        with self._lock:
            self._check_queue_bound()
            self._queue.append(req)
        return req.id

    def cancel(self, request_id: int) -> None:
        """Abort a request.  Thread-safe; takes effect at the next scheduler
        round.  A queued request is dropped before admission; a running one
        stops decoding (its slot frees for the next admission).  No further
        events are emitted for a cancelled request — frames already
        delivered remain valid, late in-flight frames are dropped."""
        with self._lock:
            self._cancelled.add(request_id)

    def _apply_cancels(self) -> None:
        with self._lock:
            if not self._cancelled:
                return
            cancelled, self._cancelled = self._cancelled, set()
            self._queue = deque(
                r for r in self._queue if r.id not in cancelled
            )
        for i, req in enumerate(self._slot_req):
            if req is not None and req.id in cancelled:
                req.finished = True  # drop this request's in-flight frames
                self._slot_req[i] = None
                self._dirty.add(i)  # force the device done flag unless a
                # successor claims the slot first
        if self._pending is not None:
            # a predictively-retired request's final chunk is only reachable
            # through the in-flight snapshot (its slot is already free)
            for req in self._pending[2].values():
                if req is not None and req.id in cancelled:
                    req.finished = True

    # -- internals ---------------------------------------------------------

    def _free_slots(self) -> list[int]:
        return [i for i, r in enumerate(self._slot_req) if r is None]

    def _admit_many(
        self, slot_ids: list[int], reqs: list[_Request],
    ) -> tuple[list[_Request], list[int]]:
        """Prefill a group of requests into their slots in ONE device
        program (:func:`_admit_group`).  Each prefill-sampled first frame
        stays on device (``req.first_dev``) and is emitted with the
        request's first processed chunk — admission dispatches only, so it
        costs no host round trip.

        The group is always padded to G = pool size with sentinel rows
        (dropped by the install scatter) so the compile set stays one
        program per (prompt bucket, install rows) pair — prefill is
        weight-bound, so the padding rows are nearly free.

        Returns ``(rejected, rejected_slots)``: requests REJECTED at
        admission (the engine prefix changed between ``prepare`` and now,
        so their prompt encoding is stale) and the slots they briefly held.
        Those slots are freed WITHOUT reinstalling device state, so the
        caller must re-mark them dirty (a predictively-retired or cancelled
        previous occupant still needs its force-finish) and fail the
        requests."""
        now = time.monotonic()
        for req in reqs:
            req.t_admit = now
        eng = self.engine
        cfg, ecfg = eng.cfg, eng.engine_cfg
        G = self.slots
        # ONE consistent snapshot (a racing set_prefix/clear_prefix between
        # a has_prefix check and the state read must not crash the driver)
        prefix, prefix_gen = eng._prefix_ref
        if prefix is not None:
            prefix_len = int(prefix["pos"][0])
            kv_pre = _kv_bucket(
                prefix_len, ecfg.kv_bucket_step, cfg.max_seq_len
            )
            prefix_kv, prefix_pos = prefix["kv"], prefix["pos"][0]
        else:
            prefix_len, kv_pre = 0, 0
            prefix_kv, prefix_pos = None, jnp.int32(0)

        # a request encoded against a DIFFERENT prefix epoch than the one
        # being forked now would decode against a wrong/truncated context
        # (set_prefix/clear_prefix raced prepare->admission): fail it loudly
        # instead of producing silently garbled audio.  Generations, not
        # lengths — a same-length prefix swap is just as garbling.
        rejected = [r for r in reqs if r.prefix_gen != prefix_gen]
        rejected_slots: list[int] = []
        if rejected:
            logger.error(
                "serve: engine prefix changed between prepare and "
                "admission (now %d) for request(s) %s; failing them",
                prefix_len, [r.id for r in rejected],
            )
            keep = [(s, r) for s, r in zip(slot_ids, reqs)
                    if r.prefix_gen == prefix_gen]
            for s, r in zip(slot_ids, reqs):
                if r.prefix_gen != prefix_gen:
                    self._slot_req[s] = None
                    rejected_slots.append(s)
            slot_ids = [s for s, _ in keep]
            reqs = [r for _, r in keep]
            if not reqs:
                return rejected, rejected_slots

        cap = cfg.max_seq_len - 1
        # shared prompt bucket: max member bucket (padding invariance is
        # exact, so short members sample identically to their own bucket)
        bucket = max(
            _pick_bucket(ecfg.prompt_buckets, r.prompt_len - prefix_len, cap)
            for r in reqs
        )
        rows = _kv_bucket(
            max(r.prompt_len for r in reqs),
            ecfg.kv_bucket_step, cfg.max_seq_len,
        )
        # scratch covers the whole padded write extent (prefill writes all
        # bucket rows; short scratch would clamp the KV block writes)
        scratch_seq = _kv_bucket(
            kv_pre + bucket + 1, ecfg.kv_bucket_step, cfg.max_seq_len
        )

        # the install scatter writes [:rows] into every admitted slot: grow
        # the pool allocation first (live streams may already reach further,
        # so never shrink here — step()'s full-extent bound handles that)
        self._pool_resize(rows + 1, grow_only=True)

        padded = np.zeros((G, 1 + cfg.num_codebooks, bucket), np.int32)
        lengths = np.ones((G,), np.int32)
        slots_arr = np.full((G,), self.slots, np.int32)  # sentinel: dropped
        keys = [jax.random.PRNGKey(0)] * G
        t = np.full((G, 1), 0.7, np.float32)
        p = np.full((G, 1), 0.8, np.float32)
        r_ = np.full((G, 1), 1.1, np.float32)
        for g, (slot, req) in enumerate(zip(slot_ids, reqs)):
            vals = req.values
            padded[g, :, : vals.shape[1]] = vals
            lengths[g] = vals.shape[1]
            slots_arr[g] = slot
            # the same prefill-frame key a solo prefill_chunk would fold
            # (step index 0x7FFFFFFF)
            keys[g] = jax.random.fold_in(req.key, 0x7FFFFFFF)
            t[g, 0] = req.temperature
            p[g, 0] = req.top_p
            r_[g, 0] = req.repetition_penalty

        self._state, first = _admit_group(
            eng.params, eng.rope, self._state, prefix_kv, prefix_pos,
            jnp.asarray(padded), jnp.asarray(lengths), jnp.stack(keys),
            jnp.asarray(t), jnp.asarray(p), jnp.asarray(r_),
            jnp.asarray(slots_arr),
            cfg=cfg, ids=eng.ids, top_k=ecfg.sample_top_k,
            approx=ecfg.approx_top_k, kv_pre=kv_pre, rows=rows,
            scratch_seq=scratch_seq, window=ecfg.rep_penalty_window,
            fast_kernel=eng._fast_kernel,
        )
        for g, (slot, req) in enumerate(zip(slot_ids, reqs)):
            self._slot_req[slot] = req
            self._t[slot, 0] = req.temperature
            self._p[slot, 0] = req.top_p
            self._r[slot, 0] = req.repetition_penalty
            self._keys[slot] = req.key
            req.first_dev = (first, g)  # (G, 1+K) row g, fetched at _process
        self._dev_cache = None  # per-slot params changed
        return rejected, rejected_slots

    def step(self) -> list[Event]:
        """One scheduler round: admit queued requests into free slots,
        dispatch the next decode chunk for the pool, then process the
        PREVIOUS chunk's (already in-flight) outputs.  The dispatch-before-
        fetch order keeps the device busy across the host's fetch latency.

        Budget-bound turnover is gapless: the host knows ``max_new`` ahead
        of time, so when the chunk being dispatched will exhaust a
        request's budget the slot is retired *at dispatch* — its successor
        admits in the very next round, device-ordered after the final chunk
        (one program stream), with zero wasted speculative decode.  Only
        device-side EOS (unknowable ahead) still costs the one in-flight
        speculative chunk, whose frames are dropped via the snapshot
        mapping exactly like the engine's speculative post-EOS chunk."""
        events: list[Event] = []
        now = time.monotonic()
        with self._lock:
            pending = list(self._queue)
            already_cancelled = set(self._cancelled)
        expired = [
            req
            for req in list(self._slot_req) + pending
            if req is not None and req.deadline and now > req.deadline
            and not req.finished
            # an explicit cancel is SILENT by contract — expiry must not
            # resurrect an event for an id the caller already cancelled
            and req.id not in already_cancelled
        ]
        if expired:
            ids = [r.id for r in expired]
            logger.info("serve: %d request(s) past deadline, cancelling: %s",
                        len(ids), ids)
            with self._lock:
                self._cancelled.update(ids)
            # unlike an explicit cancel (silent — the caller initiated it),
            # expiry emits one final done event so consumers see the stream
            # END instead of hanging on a request that silently vanished
            K = self.engine.cfg.num_codebooks
            for req in expired:
                # expired requests count toward stats like any other
                # completion — they are exactly the worst-latency tail, and
                # omitting them would make p95 queue_wait/TTFT look healthy
                # precisely when the scheduler is overloaded
                req.finished = True
                self._record_done(req)
                self._n_expired += 1
                events.append(Event(req.id, np.zeros((K, 0), np.int64),
                                    True, req.produced, -1))
        self._apply_cancels()
        with self._lock:
            queued = len(self._queue)
        if queued:
            free = self._free_slots()
            take: list[_Request] = []
            with self._lock:
                if len(self._queue) > len(free) and any(
                    r.priority for r in self._queue
                ):
                    # stable sort: highest priority first, FIFO within level
                    ordered = sorted(
                        self._queue, key=lambda r: -r.priority
                    )
                    take = ordered[: len(free)]
                    taken_ids = {r.id for r in take}
                    self._queue = deque(
                        r for r in self._queue if r.id not in taken_ids
                    )
                else:
                    while self._queue and len(take) < len(free):
                        take.append(self._queue.popleft())
                # claim the slots ATOMICALLY with the pop (same lock):
                # otherwise a popped request is in neither the queue nor a
                # slot for the whole multi-second admission program, and a
                # concurrent ``busy`` reader sees an idle scheduler with
                # work in flight (a drain loop would stop mid-admission)
                for slot, req in zip(free, take):
                    self._slot_req[slot] = req
            if take:
                taken = free[: len(take)]
                rejected, rejected_slots = self._admit_many(taken, take)
                self._dirty -= set(taken)
                # a rejected request's slot got NO state reinstall — its
                # previous occupant (predictively retired or cancelled)
                # still needs the force-finish, else the slot decodes
                # garbage alongside live slots until some later admission
                self._dirty |= set(rejected_slots)
                K = self.engine.cfg.num_codebooks
                for req in rejected:  # stale-prefix encodes: fail loudly
                    req.finished = True
                    self._record_done(req)
                    events.append(Event(
                        req.id, np.zeros((K, 0), np.int64), True,
                        req.produced, -1,
                    ))
        if self._dirty:
            # retired slots no successor claimed: force-finish so they stop
            # decoding past their request's budget (ordered after the
            # in-flight final chunk, which still lands intact)
            mask = np.zeros((self.slots,), bool)
            mask[list(self._dirty)] = True
            self._state = _mark_done(self._state, jnp.asarray(mask))
            self._dirty.clear()

        live = [i for i, r in enumerate(self._slot_req) if r is not None]
        nxt = None
        if live:
            eng = self.engine
            cfg, ecfg = eng.cfg, eng.engine_cfg
            # attention read bound: max live context after this chunk
            need = max(
                self._slot_req[i].prompt_len + self._slot_req[i].produced
                + self.chunk
                for i in live
            ) + self.chunk  # +1 extra chunk: results land one round late
            kv_b = _kv_bucket(need, ecfg.kv_bucket_step, cfg.max_seq_len)
            # allocation bucket follows the same live extent: grows as
            # streams lengthen (one O(cache) copy per bucket crossing),
            # shrinks back when long streams retire.  ``need`` bounds every
            # live slot's rows incl. this chunk, so a shrink drops only
            # dead rows; the kv_bucket read window always fits (a power-of-
            # two round-up is >= the 256-step round-up of the same bound).
            self._pool_resize(need)
            # the read window never exceeds the allocation (alloc >= need
            # covers every live row; kv_bucket_step rounding can overshoot
            # a small allocation when the floor is below the step)
            kv_b = min(kv_b, int(self._state["kv"]["k"].shape[3]))
            if self._dev_cache is None:
                self._dev_cache = (
                    jnp.stack(self._keys), jnp.asarray(self._t),
                    jnp.asarray(self._p), jnp.asarray(self._r),
                )
            keys, t_dev, p_dev, r_dev = self._dev_cache
            self._state, frames, emitted = decode_mod.decode_chunk(
                eng.params, eng.rope, self._state, keys,
                t_dev, p_dev, r_dev,
                cfg=cfg, ids=eng.ids, num_frames=self.chunk,
                top_k=ecfg.sample_top_k, approx=ecfg.approx_top_k,
                kv_bucket=kv_b, fast_kernel=eng._fast_kernel,
            )
            nxt = (frames, emitted, dict(enumerate(self._slot_req)))
            for i in live:  # predictive retirement (after snapshot)
                req = self._slot_req[i]
                req.dispatched += self.chunk
                if req.dispatched >= req.max_new:
                    self._slot_req[i] = None
                    self._dirty.add(i)

        if self._pending is not None:
            events += self._process(*self._pending)
        self._pending = nxt
        return events

    def _process(self, frames, emitted, snapshot) -> list[Event]:
        """Fetch one decoded chunk and route frames to the requests that
        owned each slot when it was dispatched."""
        eng = self.engine
        cfg = eng.cfg
        frames_np = np.asarray(frames)
        emitted_np = np.asarray(emitted)
        events: list[Event] = []
        # host-side mask, one device transfer at the end (per-slot
        # .at[].set dispatches would pay a tunnel round trip each)
        budget_done = np.zeros((self.slots,), bool)
        any_budget_done = False
        n_tokens = 0
        for slot, req in snapshot.items():
            if req is None or req.finished:
                continue  # slot was free, or this is a speculative
                # post-EOS chunk for an already-finished request
            em = emitted_np[slot]
            fs = frames_np[slot][em]  # (m, 1+K)
            if req.first_dev is not None:
                # the admission's prefill frame rides this fetch (it always
                # emits; solo decode emits it too — inference.py:721)
                arr, g = req.first_dev  # (G, 1+K) group frames, row g
                first_np = np.asarray(arr)[g:g + 1]
                req.first_dev = None
                fs = np.concatenate([first_np, fs], axis=0)
            if fs.shape[0] and not req.t_first:
                req.t_first = time.monotonic()
            room = req.max_new - req.produced
            fs = fs[:room]
            n_tokens += fs.shape[0]  # after truncation: only delivered frames
            req.produced += fs.shape[0]
            eos = fs.shape[0] > 0 and bool(fs[-1, 0] == eng.ids.im_end)
            done = (not bool(em[-1])) or eos or req.produced >= req.max_new
            if fs.shape[0]:
                codes = np.maximum(fs[:, 1:], 0).T.astype(np.int64)
                events.append(Event(req.id, codes, done, req.produced, slot))
            elif done:
                events.append(
                    Event(req.id, np.zeros((cfg.num_codebooks, 0), np.int64),
                          True, req.produced, slot)
                )
            if done:
                req.finished = True
                self._record_done(req)
                if self._slot_req[slot] is req:
                    # EOS before the predicted budget: free the slot now
                    # (predictively retired slots are already free, and may
                    # even host a successor by the time this chunk lands)
                    self._slot_req[slot] = None
                    if not eos:  # device flag not set — force it
                        budget_done[slot] = True
                        any_budget_done = True
        eng.metrics.record_tokens(n_tokens)
        if any_budget_done:
            self._state = _mark_done(self._state, jnp.asarray(budget_done))
        return events

    def reset(self) -> None:
        """Rebuild the pool after a failed ``step()``.  The decode program
        donates ``self._state``; a RUNTIME failure mid-step (not a trace
        error) can leave those buffers deleted, after which every further
        step raises 'array has been deleted' forever — a zombie server.
        Drops all queued and live requests (the caller has already failed
        their consumers), clears in-flight bookkeeping, and reinstalls a
        fresh all-done device state so new requests admit normally."""
        with self._lock:
            dropped = list(self._queue)
            self._queue.clear()
            self._cancelled.clear()
        dropped += [r for r in self._slot_req if r is not None]
        for req in dropped:
            req.finished = True
            self._record_done(req)
        self._slot_req = [None] * self.slots
        self._pending = None
        self._dirty.clear()
        self._dev_cache = None
        self._state = _mark_done(
            self.engine._init_state(self.slots, seq_len=self._pool_floor()),
            jnp.ones((self.slots,), bool),
        )
        logger.warning(
            "serve: pool state rebuilt after step failure (%d request(s) "
            "dropped)", len(dropped),
        )

    def _record_done(self, req: _Request) -> None:
        now = time.monotonic()
        self._done_stats.append({
            "request_id": req.id,
            "frames": req.produced,
            "queue_wait_s": (req.t_admit or now) - req.t_submit,
            # consumer-visible time to first frames (includes queue wait)
            "ttft_s": (req.t_first or now) - req.t_submit,
            "total_s": now - req.t_submit,
        })

    def stats(self) -> dict:
        """Aggregate serving stats over the last completed requests
        (window of 1024): p50/p95 queue wait and consumer-visible TTFT,
        mean per-request frame rate, plus instantaneous queue depth and
        live-slot count.  Cheap — host-side bookkeeping only."""
        with self._lock:
            depth = len(self._queue)
        recs = list(self._done_stats)
        out = {
            "completed": len(recs),
            "expired": self._n_expired,
            "queue_depth": depth,
            "live_slots": sum(r is not None for r in self._slot_req),
            "slots": self.slots,
        }
        if recs:
            qw = np.sort([r["queue_wait_s"] for r in recs])
            tf = np.sort([r["ttft_s"] for r in recs])
            out["queue_wait_p50_s"] = float(np.percentile(qw, 50))
            out["queue_wait_p95_s"] = float(np.percentile(qw, 95))
            out["ttft_p50_s"] = float(np.percentile(tf, 50))
            out["ttft_p95_s"] = float(np.percentile(tf, 95))
            tot = sum(r["total_s"] for r in recs)
            out["frames_per_request_s"] = (
                sum(r["frames"] for r in recs) / tot if tot else 0.0
            )
        return out

    @property
    def busy(self) -> bool:
        with self._lock:
            q = bool(self._queue)
        return (
            q
            or any(r is not None for r in self._slot_req)
            or self._pending is not None
        )

    def run(self) -> Iterator[Event]:
        """Drive the scheduler until the queue and all slots drain."""
        while self.busy:
            yield from self.step()
