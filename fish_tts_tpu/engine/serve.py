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
- Admission = a B=1 prefill into a reusable scratch state (bucketed prompt,
  so the compile set stays closed) + a jitted "install" that copies the
  prefix KV rows into the slot and resets the slot's per-slot fields.  The
  other slots' caches are untouched; they resume decoding in the very next
  chunk.
- Reproducibility: every request carries its own PRNG key, and the decode
  state keeps PER-SLOT step counters (decode.init_state) with per-slot
  ``fold_in(key, step)`` frame keys — a request's sampled codes are
  bit-identical to a solo ``generate_long`` run with the same seed, no
  matter when it was admitted or who its co-tenants are (tested in
  tests/test_serve.py).
- The decode chunk is dispatched over the full pool; per-slot EOS uses the
  existing on-device ``done`` flags, and the host enforces per-request token
  budgets by force-finishing slots.

Events are streaming-semantics (each emitted frame including the EOS frame,
like the reference's streaming path, inference.py:271-274); callers that
want batch semantics drop the final frame.
"""

from __future__ import annotations

import itertools
import logging
import threading
from collections import deque
from dataclasses import dataclass
from functools import partial
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from fish_tts_tpu.engine import decode as decode_mod
from fish_tts_tpu.engine.generate import GenerationEngine, _kv_bucket

logger = logging.getLogger(__name__)


@dataclass
class Event:
    """One scheduler-round outcome for one request."""

    request_id: int
    codes: np.ndarray  # (num_codebooks, m) new vocoder rows this round
    done: bool
    frames_total: int  # cumulative emitted frames for this request


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
    # prefill-sampled first frame, still on device: fetched together with
    # the request's first decode chunk so admission never blocks on a
    # device->host round trip of its own
    first_dev: object = None


@partial(jax.jit, static_argnames=("rows",), donate_argnames=("state",))
def _install_slot(state, adm, slot, rows: int):
    """Copy an admitted B=1 state into slot ``slot`` of the pool state.

    Only the first ``rows`` KV rows (the admitted context, rounded to its
    bucket) are copied; the other slots' arrays are untouched outside row
    ``slot``.  The slot's step restarts at 0 (per-slot frame counter) and
    its penalty window clears — exactly the state a solo decode would have
    right after prefill.
    """
    k = jax.lax.dynamic_update_slice(
        state["kv"]["k"], adm["kv"]["k"][:, :, :, :rows], (0, slot, 0, 0, 0)
    )
    v = jax.lax.dynamic_update_slice(
        state["kv"]["v"], adm["kv"]["v"][:, :, :, :rows], (0, slot, 0, 0, 0)
    )
    return {
        "kv": {"k": k, "v": v},
        "frame": state["frame"].at[slot].set(adm["frame"][0]),
        "pos": state["pos"].at[slot].set(adm["pos"][0]),
        "prev": state["prev"].at[slot].set(jnp.zeros_like(adm["prev"][0])),
        "step": state["step"].at[slot].set(0),
        "done": state["done"].at[slot].set(adm["done"][0]),
    }


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
    ):
        self.engine = engine
        self.slots = slots
        self.chunk = chunk or engine.engine_cfg.decode_chunk
        self._lock = threading.Lock()
        self._queue: deque[_Request] = deque()
        self._ids = itertools.count()
        self._slot_req: list[_Request | None] = [None] * slots
        # pool state: free slots are done=True so decode holds them
        state = engine._init_state(slots)
        self._state = _mark_done(state, jnp.ones((slots,), bool))
        # reusable B=1 admission scratch (prefill target); rebuilt lazily
        # after each admission consumes (donates) it
        self._adm_state = None
        # per-slot sampling params + base keys, mirrored on host
        self._t = np.full((slots, 1), 0.7, np.float32)
        self._p = np.full((slots, 1), 0.8, np.float32)
        self._r = np.full((slots, 1), 1.1, np.float32)
        base = jax.random.PRNGKey(0)
        self._keys = [jax.random.fold_in(base, i) for i in range(slots)]
        # one in-flight decode chunk: (frames_dev, emitted_dev, snapshot of
        # slot->request at dispatch time).  Chunk k+1 is dispatched before
        # chunk k's outputs are fetched, so the device never idles on the
        # host's per-chunk fetch round trip (the same pipelining the
        # single-stream engine uses).
        self._pending = None

    # -- submission --------------------------------------------------------

    def submit(
        self,
        text: str,
        *,
        max_new_tokens: int = 2048,
        temperature: float = 0.7,
        top_p: float = 0.8,
        repetition_penalty: float = 1.1,
        seed: int | None = None,
        key: jax.Array | None = None,
    ) -> int:
        """Queue a request; returns its id.  ``seed``/``key`` pin the
        request's RNG: with ``seed``, the served codes are bit-identical to
        ``engine.reseed(seed)`` followed by a solo ``generate_long`` (the
        seed goes through the same one split the engine's key schedule
        performs)."""
        assert 0 < top_p <= 1 and 0 < repetition_penalty < 2 \
            and 0 < temperature < 2  # reference ranges, inference.py:763-765
        eng = self.engine
        if key is None:
            key = (
                jax.random.split(jax.random.PRNGKey(seed))[1]
                if seed is not None else eng._next_key()
            )
        # slot base key = fold_in(request_key, 0): exactly what a solo B=1
        # generate_long derives for its one slot (decode.normalize_keys)
        slot_key = jax.random.fold_in(key, 0)
        if eng.has_prefix:
            enc = eng._encode_suffix(text)
            prefix_len = int(eng._prefix_state["pos"][0])
        else:
            from fish_tts_tpu.models.prompt import build_prompt

            enc = build_prompt(eng.tokenizer, text, eng.cfg.num_codebooks)
            prefix_len = 0
        prompt_len = prefix_len + enc.values.shape[1]
        cfg = eng.cfg
        reserve = min(2048, cfg.max_seq_len // 2)
        if prompt_len > cfg.max_seq_len - reserve:
            raise ValueError(f"Prompt is too long: {prompt_len}")
        max_new = min(max_new_tokens, cfg.max_seq_len - prompt_len) \
            if max_new_tokens else cfg.max_seq_len - prompt_len
        req = _Request(
            id=next(self._ids), values=enc.values, max_new=max_new,
            temperature=temperature, top_p=top_p,
            repetition_penalty=repetition_penalty, key=slot_key,
            prompt_len=prompt_len,
        )
        with self._lock:
            self._queue.append(req)
        return req.id

    # -- internals ---------------------------------------------------------

    def _free_slots(self) -> list[int]:
        return [i for i, r in enumerate(self._slot_req) if r is None]

    def _admit(self, slot: int, req: _Request) -> None:
        """Prefill ``req`` into ``slot``.  The prefill-sampled first frame
        stays on device (``req.first_dev``) and is emitted with the
        request's first processed chunk — admission dispatches only, so it
        costs no host round trip."""
        eng = self.engine
        cfg, ecfg = eng.cfg, eng.engine_cfg
        if eng.has_prefix:
            adm = eng._fork_prefix()
            prefix_len = int(adm["pos"][0])
        else:
            adm = self._adm_state
            self._adm_state = None  # consumed by prefill's donation below
            if adm is None:
                adm = eng._init_state(1)
            else:
                # reuse the scratch: only the small per-call fields need
                # clearing — stale KV rows at positions >= pos are never
                # attended (cache_bias masks them) and get overwritten by
                # future writes, so the ~470 MB cache skips the round trip
                adm = {
                    "kv": adm["kv"],
                    "frame": jnp.zeros_like(adm["frame"]),
                    "pos": jnp.zeros_like(adm["pos"]),
                    "prev": jnp.zeros_like(adm["prev"]),
                    "step": jnp.zeros_like(adm["step"]),
                    "done": jnp.zeros_like(adm["done"]),
                }
            prefix_len = 0
        padded, T = eng._pad_prompt(req.values)
        kv_pre = (
            0 if prefix_len == 0
            else _kv_bucket(prefix_len, ecfg.kv_bucket_step, cfg.max_seq_len)
        )
        adm, first = decode_mod.prefill(
            eng.params, eng.rope, adm,
            jnp.asarray(padded), jnp.asarray([T], jnp.int32),
            # (1,)-shaped key batch: the same prefill-frame key a solo
            # prefill_chunk would fold (step index 0x7FFFFFFF)
            jax.random.fold_in(req.key, 0x7FFFFFFF)[None],
            jnp.float32(req.temperature), jnp.float32(req.top_p),
            jnp.float32(req.repetition_penalty),
            cfg=cfg, ids=eng.ids, top_k=ecfg.sample_top_k,
            approx=ecfg.approx_top_k, kv_bucket=kv_pre,
        )
        rows = _kv_bucket(req.prompt_len, ecfg.kv_bucket_step, cfg.max_seq_len)
        self._state = _install_slot(
            self._state, adm, jnp.int32(slot), rows=rows
        )
        if not eng.has_prefix:
            self._adm_state = adm  # reusable after install's copy
        self._slot_req[slot] = req
        self._t[slot, 0] = req.temperature
        self._p[slot, 0] = req.top_p
        self._r[slot, 0] = req.repetition_penalty
        self._keys[slot] = req.key
        req.first_dev = first  # (1, 1+K), fetched at first _process

    def _release(self, slot: int) -> None:
        self._slot_req[slot] = None
        self._state = _mark_done(
            self._state,
            jnp.zeros((self.slots,), bool).at[slot].set(True),
        )

    def step(self) -> list[Event]:
        """One scheduler round: admit queued requests into free slots,
        dispatch the next decode chunk for the pool, then process the
        PREVIOUS chunk's (already in-flight) outputs.  The dispatch-before-
        fetch order keeps the device busy across the host's fetch latency;
        the cost is that a slot released this round decodes one speculative
        chunk before its successor admits (those frames are dropped via the
        snapshot mapping, exactly like the engine's speculative post-EOS
        chunk)."""
        events: list[Event] = []
        with self._lock:
            queued = len(self._queue)
        if queued:
            for slot in self._free_slots():
                with self._lock:
                    if not self._queue:
                        break
                    req = self._queue.popleft()
                self._admit(slot, req)

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
            keys = jnp.stack(self._keys)
            self._state, frames, emitted = decode_mod.decode_chunk(
                eng.params, eng.rope, self._state, keys,
                jnp.asarray(self._t), jnp.asarray(self._p),
                jnp.asarray(self._r),
                cfg=cfg, ids=eng.ids, num_frames=self.chunk,
                top_k=ecfg.sample_top_k, approx=ecfg.approx_top_k,
                kv_bucket=kv_b, fast_kernel=eng._fast_kernel,
            )
            nxt = (frames, emitted, dict(enumerate(self._slot_req)))

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
        budget_done = jnp.zeros((self.slots,), bool)
        any_budget_done = False
        n_tokens = 0
        for slot, req in snapshot.items():
            if req is None or self._slot_req[slot] is not req:
                continue  # slot was free, or released before this chunk
            em = emitted_np[slot]
            fs = frames_np[slot][em]  # (m, 1+K)
            if req.first_dev is not None:
                # the admission's prefill frame rides this fetch (it always
                # emits; solo decode emits it too — inference.py:721)
                first_np = np.asarray(req.first_dev)[:1]  # (1, 1+K)
                req.first_dev = None
                fs = np.concatenate([first_np, fs], axis=0)
            n_tokens += fs.shape[0]
            room = req.max_new - req.produced
            fs = fs[:room]
            req.produced += fs.shape[0]
            eos = fs.shape[0] > 0 and bool(fs[-1, 0] == eng.ids.im_end)
            done = (not bool(em[-1])) or eos or req.produced >= req.max_new
            if fs.shape[0]:
                codes = np.maximum(fs[:, 1:], 0).T.astype(np.int64)
                events.append(Event(req.id, codes, done, req.produced))
            elif done:
                events.append(
                    Event(req.id, np.zeros((cfg.num_codebooks, 0), np.int64),
                          True, req.produced)
                )
            if done:
                self._slot_req[slot] = None
                if not eos:  # device flag not set — force it
                    budget_done = budget_done.at[slot].set(True)
                    any_budget_done = True
        eng.metrics.record_tokens(n_tokens)
        if any_budget_done:
            self._state = _mark_done(self._state, budget_done)
        return events

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
