"""Generation orchestration: the TPU analog of the reference's
``generate_long`` (/root/reference/fish_tts/models/inference.py:741-846).

``GenerationEngine`` owns the jitted prefill/decode functions plus their
static configs and drives them from the host:

- prompt matrices are right-padded to the smallest configured bucket so the
  number of compiled prefill variants is bounded (the reference instead eats
  an Inductor recompile per shape),
- decode runs in fixed-size chunks (first ``first_chunk`` frames, then
  ``decode_chunk``) — these are exactly the reference's streaming flush
  thresholds (synthesizer.py:497-498: min_first_chunk=10, chunk_tokens=20),
  so streaming consumers get one vocoder chunk per device call,
- EOS is checked on the host once per chunk (vs every token at
  inference.py:210),
- ``set_prefix``/``clear_prefix`` implement voice-profile KV-prefix reuse:
  the reference re-encodes and re-prefills the full reference prompt on every
  synthesize call (inference.py:779-795); here the reference blocks are
  prefilled once and later calls only prefill the target-text suffix at the
  stored offset.

Sampling parameter validation matches generate_long (inference.py:763-765),
and the prompt-length guard matches inference.py:794-795.
"""

from __future__ import annotations

import itertools
import logging
import threading
from dataclasses import dataclass
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from fish_tts_tpu.config import DualARConfig, EngineConfig
from fish_tts_tpu.engine import decode as decode_mod
from fish_tts_tpu.models.dual_ar import Params, TokenIds, make_rope_tables
from fish_tts_tpu.models.prompt import build_prompt, ContentSequence, TextPart
from fish_tts_tpu.models.tokenizer import FishTokenizer
from fish_tts_tpu.utils.profiling import Metrics

logger = logging.getLogger(__name__)


@dataclass
class GenerateResponse:
    """Mirror of the reference GenerateResponse (inference.py:417-421)."""

    action: str  # "sample" | "next"
    codes: np.ndarray | None = None  # (num_codebooks, n) — vocoder rows only
    text: str | None = None


def _pick_bucket(buckets: tuple[int, ...], n: int, cap: int) -> int:
    for b in buckets:
        if b >= n and b <= cap:
            return b
    if n <= cap:
        return cap
    raise ValueError(f"Prompt length {n} exceeds maximum {cap}")


def _kv_bucket(n: int, step: int, cap: int) -> int:
    """Smallest multiple of ``step`` >= n, capped at the cache length."""
    return min(cap, -(-n // step) * step)


# Cache *allocation* floor (rows).  Decode cost grows ~linearly with the
# allocated cache length (see decode.resize_cache), so states are allocated
# at the smallest power-of-two bucket >= the request's worst-case extent
# instead of cfg.max_seq_len.  Power-of-two buckets (512/1024/2048/4096 at
# the production config) bound the compile-variant count; the floor keeps
# short requests from fragmenting into many tiny variants.
CACHE_FLOOR = 512


def _cache_bucket(n: int, cap: int) -> int:
    """Smallest power-of-two allocation bucket >= n (>= CACHE_FLOOR),
    capped at ``cap`` (the model context).  ``n > cap`` callers rely on the
    decode-position clamp + host budget truncation, exactly as before."""
    b = min(CACHE_FLOOR, cap)
    while b < min(n, cap):
        b *= 2
    return min(b, cap)


def _chunk_len(remaining: int, chunk: int, decode_chunk: int) -> int:
    """Frames for the next decode dispatch: a full ``chunk``, or — for the
    final partial one — the remainder rounded up to a ``decode_chunk``
    multiple, so the compile-variant count stays bounded while small budgets
    don't pay for a full large chunk.

    The round-up means up to ``decode_chunk - 1`` frames beyond the budget
    are decoded (on top of the one speculative post-EOS chunk).  Output stays
    correct only because of TWO guards that must both survive refactors:
    ``_decode_one`` clamps ``pos`` to the cache end (so the overshoot cannot
    write out of bounds), and every dispatch site truncates fetched frames to
    the remaining budget on the host (the ``room`` / ``max_new - produced``
    caps)."""
    if remaining >= chunk:
        return chunk
    return max(decode_chunk, -(-remaining // decode_chunk) * decode_chunk)


class GenerationEngine:
    """Host-side driver for the jitted DualAR decode pipeline."""

    def __init__(
        self,
        params: Params,
        cfg: DualARConfig,
        tokenizer: FishTokenizer,
        engine_cfg: EngineConfig | None = None,
        seed: int = 0,
    ):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.engine_cfg = engine_cfg or EngineConfig()
        self.ids = TokenIds(
            semantic_begin=tokenizer.semantic_begin_id,
            semantic_end=tokenizer.semantic_end_id,
            im_end=tokenizer.im_end_id,
        )
        self.rope = make_rope_tables(cfg)
        # (dp, tp) device mesh: built iff EngineConfig asks for more than one
        # device.  Params/rope are placed with the GSPMD TP specs once here;
        # decode states are sharded per call in _init_state.  The reference
        # has no distributed support at all (SURVEY §2) — this is the
        # TPU-native scaling path.
        self.mesh = None
        ecfg = self.engine_cfg
        if ecfg.tp_size * ecfg.dp_size > 1:
            from fish_tts_tpu.parallel import mesh as mesh_mod
            from fish_tts_tpu.parallel import sharding

            self.mesh = mesh_mod.make_mesh(tp=ecfg.tp_size, dp=ecfg.dp_size)
            self.params = params = sharding.shard_params(params, cfg, self.mesh)
            self.rope = sharding.shard_rope(self.rope, self.mesh)
            logger.info(
                "LM sharded over mesh(dp=%d, tp=%d)", ecfg.dp_size, ecfg.tp_size
            )
        # Fused Pallas fast-decoder: TPU-only (interpret mode would crawl on
        # CPU) and single-device only (the kernels run outside GSPMD); decode
        # falls back per-call when params/batch do not qualify.
        self._fast_kernel = (
            self.engine_cfg.fast_kernel
            and jax.default_backend() == "tpu"
            and self.mesh is None
        )
        if self._fast_kernel:
            from fish_tts_tpu.ops import slow_stack

            if slow_stack.supports(cfg, params, 1):
                # pre-pad the tied LM head into vocab tiles so the fused
                # slow-stack kernel can stream it (one-time cost)
                self.params = params = slow_stack.prepare_head(params, cfg)
            if self.engine_cfg.sample_top_k > 0:
                # decode gates the fused fast-decoder off when top_k > 0 so
                # sampler settings behave uniformly across paths — surface
                # the perf cliff instead of silently eating it
                logger.info(
                    "sample_top_k=%d disables the fused fast-decoder kernel "
                    "(residual books take the XLA path; the slow-stack "
                    "kernel still runs)", self.engine_cfg.sample_top_k,
                )
        self._key = jax.random.PRNGKey(seed)
        # serving entry points derive request keys from handler threads;
        # an unlocked read-split-write would let two concurrent requests
        # draw the SAME key (identical "random" audio for identical text)
        self._key_lock = threading.Lock()
        self.metrics = Metrics()
        # Prefix (voice-profile) cache: state snapshot after prefilling the
        # reference blocks, shared across synthesize calls.  Held as ONE
        # (state, generation) tuple so concurrent readers (the serve driver)
        # get a consistent snapshot via a single attribute read, and every
        # write bumps the generation — serving admission compares
        # generations to reject requests prepared against a prefix that was
        # swapped (even for a same-length one) or cleared in between.
        self._prefix_counter = itertools.count(1)
        self._prefix_ref: tuple[decode_mod.State | None, int] = (None, 0)

    # -- rng ---------------------------------------------------------------

    def _next_key(self) -> jax.Array:
        with self._key_lock:
            self._key, sub = jax.random.split(self._key)
        return sub

    @property
    def _large_chunk(self) -> int:
        """Frames per device call for non-streaming decode (fetch-latency
        bound paths); never below the streaming chunk."""
        return max(self.engine_cfg.batch_chunk, self.engine_cfg.decode_chunk)

    def _init_state(
        self, batch: int, seq_len: int | None = None
    ) -> decode_mod.State:
        """Fresh decode state, placed on the mesh when one is configured
        (KV over (dp batch, tp KV-heads); batch axis replicated when it does
        not divide dp — e.g. a single generate_long stream on a dp>1 mesh).

        ``seq_len`` sizes the KV-cache *allocation* (callers pass the
        ``_cache_bucket`` of their worst-case extent; ``None`` = full
        context).  Smaller allocations decode faster — see
        decode.resize_cache."""
        state = decode_mod.init_state(
            self.params, self.cfg, batch=batch, max_seq_len=seq_len,
            window=self.engine_cfg.rep_penalty_window,
        )
        if self.mesh is not None:
            from fish_tts_tpu.parallel import sharding

            state = sharding.shard_state(state, self.mesh)
        return state

    def reseed(self, seed: int) -> None:
        # under the key lock: a concurrent _next_key mid read-split-write
        # would otherwise overwrite the new seed with a split of the old key
        with self._key_lock:
            self._key = jax.random.PRNGKey(seed)

    # -- prefix (voice profile) caching ------------------------------------

    def set_prefix(
        self, prompt_texts: list[str], prompt_codes: list[np.ndarray]
    ) -> None:
        """Prefill the reference blocks once; later calls start from here.

        The prefix is the prompt up to (but not including) the final
        ``[speaker, target-text]`` block of the reference layout
        (inference.py:779-789).
        """
        if not prompt_texts:
            self._prefix_state = None
            return
        seq = ContentSequence(modality="interleave")
        from fish_tts_tpu.models.prompt import VQPart

        for t, c in zip(prompt_texts, prompt_codes):
            seq.append([TextPart(text=t), VQPart(codes=c)], add_end=True, speaker=0)
        enc = seq.encode_for_inference(self.tokenizer, self.cfg.num_codebooks)

        state = self._init_state(batch=1)
        state = self._prefill_padded(state, enc.values, sample=False)
        # The frame sampled off the prefix end is meaningless — reset the
        # per-call fields so only the KV cache and position survive.
        state["done"] = jnp.zeros_like(state["done"])
        state["frame"] = jnp.zeros_like(state["frame"])
        state["step"] = jnp.zeros_like(state["step"])
        self._prefix_state = state
        logger.info(
            "Cached KV prefix of %d tokens for %d reference(s)",
            enc.values.shape[1], len(prompt_texts),
        )

    def clear_prefix(self) -> None:
        self._prefix_state = None

    @property
    def _prefix_state(self) -> "decode_mod.State | None":
        return self._prefix_ref[0]

    @_prefix_state.setter
    def _prefix_state(self, state: "decode_mod.State | None") -> None:
        self._prefix_ref = (state, next(self._prefix_counter))

    @property
    def has_prefix(self) -> bool:
        return self._prefix_ref[0] is not None

    def _fork_prefix(self, s: decode_mod.State,
                     seq_len: int | None = None) -> decode_mod.State:
        """Copy a prefix-state SNAPSHOT so donation can't consume it.

        Callers must pass the one-time ``_prefix_ref[0]`` snapshot they
        gated on — re-reading ``self._prefix_state`` here would race a
        concurrent ``set_prefix``/``clear_prefix`` (mixed prefix epochs, or
        a TypeError on a cleared prefix).  serve.py takes the same
        single-read snapshot for the same reason.

        ``seq_len`` re-sizes the fork's KV allocation to the request's
        bucket (decode.resize_cache rationale: decode cost is ~linear in
        the allocated length).  Ignored on a mesh — a sharded resize is not
        plumbed, and the full-size state is always correct.
        """
        kv = self._fork_kv(s["kv"], seq_len)
        out = {k: jnp.copy(v) for k, v in s.items() if k != "kv"}
        out["kv"] = kv
        return out

    def _fork_kv(self, kv: Params, seq_len: int | None) -> Params:
        """Copy a prefix KV, re-allocated to ``seq_len`` rows (None / mesh:
        same-size copy).  Slices drop only dead rows (callers size
        ``seq_len`` above the prefix extent); grows pad zeros."""
        S = kv["k"].shape[3]
        if seq_len is None or self.mesh is not None or seq_len == S:
            return jax.tree_util.tree_map(jnp.copy, kv)
        if seq_len < S:
            return {k: v[:, :, :, :seq_len] for k, v in kv.items()}
        pad = [(0, 0)] * 5
        pad[3] = (0, seq_len - S)
        return {k: jnp.pad(v, pad) for k, v in kv.items()}

    def _fork_prefix_batch(self, s: decode_mod.State, batch: int,
                           seq_len: int | None = None) -> decode_mod.State:
        """Broadcast a B=1 prefix-state SNAPSHOT across ``batch`` streams
        (same snapshot contract as :meth:`_fork_prefix`).

        The voice references are prefilled ONCE (set_prefix); batched serving
        forks that KV prefix instead of re-prefilling the reference blocks
        per stream (the reference re-encodes and re-forwards the full prompt
        on every call, inference.py:779-795 — and has no batching at all).

        ``seq_len`` re-sizes the group's KV allocation (see _fork_prefix).
        """
        kv_src = self._fork_kv(s["kv"], seq_len)
        state = {
            "kv": {k: jnp.repeat(v, batch, axis=1) for k, v in kv_src.items()},
            "frame": jnp.repeat(s["frame"], batch, axis=0),
            "pos": jnp.repeat(s["pos"], batch, axis=0),
            "prev": jnp.repeat(s["prev"], batch, axis=0),
            "step": jnp.repeat(s["step"], batch, axis=0),
            "done": jnp.repeat(s["done"], batch, axis=0),
        }
        if self.mesh is not None:
            from fish_tts_tpu.parallel import sharding

            state = sharding.shard_state(state, self.mesh)
        return state

    def _encode_suffix(self, text: str):
        """Encode only the target-text block (the part after the cached
        reference prefix in the reference layout, inference.py:779-789)."""
        seq = ContentSequence(modality=None)
        seq.append([TextPart(text=text)], add_end=False, speaker=0)
        return seq.encode_for_inference(self.tokenizer, self.cfg.num_codebooks)

    # -- prefill helper ----------------------------------------------------

    def _pad_prompt(self, values: np.ndarray) -> tuple[np.ndarray, int]:
        """Right-pad a (1+K, T) prompt matrix to the smallest bucket.

        The single place that owns the padding contract (bucket list capped
        at max_seq_len - 1, zero padding) for both the plain prefill and the
        fused prefill+first-chunk path.
        """
        T = values.shape[1]
        if T == 0:
            raise ValueError("Empty prompt")
        cap = self.cfg.max_seq_len - 1
        bucket = _pick_bucket(self.engine_cfg.prompt_buckets, T, cap)
        padded = np.zeros((1, values.shape[0], bucket), np.int32)
        padded[0, :, :T] = values
        return padded, T

    def _prefill_padded(
        self,
        state: decode_mod.State,
        values: np.ndarray,  # (1+K, T)
        temperature: float = 0.7,
        top_p: float = 0.8,
        repetition_penalty: float = 1.1,
        sample: bool = True,
    ):
        """Pad to a bucket and run jitted prefill over a fresh sequence
        (kv_bucket=0: no live cache rows — used by set_prefix).  Returns the
        new state (and the first frame when ``sample``)."""
        padded, T = self._pad_prompt(values)

        state, first = decode_mod.prefill(
            self.params, self.rope, state,
            jnp.asarray(padded), jnp.asarray([T], jnp.int32),
            self._next_key(),
            jnp.float32(temperature), jnp.float32(top_p),
            jnp.float32(repetition_penalty),
            cfg=self.cfg, ids=self.ids, top_k=self.engine_cfg.sample_top_k,
            approx=self.engine_cfg.approx_top_k, kv_bucket=0,
            # prefill samples one frame: the fused kernel would only save one
            # fast-loop pass but costs a Mosaic compile per prompt bucket
            fast_kernel=False,
        )
        if sample:
            return state, first
        return state

    # -- main entry --------------------------------------------------------

    def generate_long(
        self,
        text: str,
        *,
        num_samples: int = 1,
        max_new_tokens: int = 0,
        top_p: float = 0.8,
        repetition_penalty: float = 1.1,
        temperature: float = 0.8,
        prompt_text: list[str] | None = None,
        prompt_tokens: list[np.ndarray] | None = None,
        streaming: bool = False,
        use_prefix_cache: bool = True,
        show_progress: bool = False,
    ) -> Iterator[GenerateResponse]:
        """Generate vocoder codes for ``text`` (reference generate_long,
        inference.py:741-846).

        Yields ``GenerateResponse(action="sample", codes=...)`` chunks then an
        ``action="next"`` — once per sample when ``num_samples > 1``, matching
        the reference's per-sample loop (inference.py:747, 799-800, 846).  In
        batch mode a single "sample" carries all codes with the final frame
        stripped (inference.py:839); in streaming mode every chunk is yielded
        including the EOS frame (inference.py:271-274).
        """
        # real raises, not asserts: python -O strips asserts, and these
        # ranges guard the sampler against division by zero / degenerate
        # nuclei (the reference asserts, inference.py:763-765; serving's
        # prepare() raises for the same reason, serve.py)
        if not 0 < top_p <= 1:
            raise ValueError("top_p must be in (0, 1]")
        if not 0 < repetition_penalty < 2:
            raise ValueError("repetition_penalty must be in (0, 2)")
        if not 0 < temperature < 2:
            raise ValueError("temperature must be in (0, 2)")
        for _ in range(num_samples):
            yield from self._generate_one(
                text,
                max_new_tokens=max_new_tokens,
                top_p=top_p,
                repetition_penalty=repetition_penalty,
                temperature=temperature,
                prompt_text=prompt_text,
                prompt_tokens=prompt_tokens,
                streaming=streaming,
                use_prefix_cache=use_prefix_cache,
                show_progress=show_progress,
            )
            yield GenerateResponse(action="next")

    def _generate_one(
        self,
        text: str,
        *,
        max_new_tokens: int,
        top_p: float,
        repetition_penalty: float,
        temperature: float,
        prompt_text: list[str] | None,
        prompt_tokens: list[np.ndarray] | None,
        streaming: bool,
        use_prefix_cache: bool,
        show_progress: bool = False,
    ) -> Iterator[GenerateResponse]:
        """One sample of generate_long, without the trailing "next"."""
        prompt_text = prompt_text or []
        prompt_tokens = prompt_tokens or []

        cfg = self.cfg
        ecfg = self.engine_cfg
        max_length = cfg.max_seq_len

        # ONE atomic snapshot: a concurrent set_prefix/clear_prefix must not
        # change what this call forks after the gate below has passed
        prefix_snap = self._prefix_ref[0]
        use_cached_prefix = (
            use_prefix_cache and prefix_snap is not None and not prompt_text
        )

        if use_cached_prefix:
            # Only the target-text suffix needs encoding + prefilling.
            enc = self._encode_suffix(text)
            prompt_len = int(prefix_snap["pos"][0]) + enc.values.shape[1]
        else:
            enc = build_prompt(
                self.tokenizer, text, cfg.num_codebooks,
                prompt_texts=prompt_text, prompt_codes=prompt_tokens,
            )
            prompt_len = enc.values.shape[1]

        # Reserve room for generation (reference hard-codes 2048,
        # inference.py:794-795 — identical here for the real 4096-ctx config;
        # scaled down for small test configs where 2048 > max_seq_len).
        reserve = min(2048, max_length // 2)
        if prompt_len > max_length - reserve:
            raise ValueError(
                f"Prompt is too long: {prompt_len} > {max_length - reserve}"
            )

        if max_new_tokens:
            max_new = min(max_new_tokens, max_length - prompt_len)
        else:
            max_new = max_length - prompt_len

        padded, T = self._pad_prompt(enc.values)
        prefix_len = prompt_len - T if use_cached_prefix else 0
        # KV-cache allocation bucket: worst-case decode extent (prompt +
        # budget + dispatch overshoot: up to chunk-1 rounding frames plus one
        # speculative chunk) and never below the padded prefill write extent
        # (prefill scatters the whole prompt bucket).  Smaller allocations
        # decode faster — see decode.resize_cache.
        alloc = _cache_bucket(
            max(prompt_len + max_new + 2 * self._large_chunk,
                prefix_len + padded.shape[-1] + 1),
            max_length,
        )
        state = (
            self._fork_prefix(prefix_snap, seq_len=alloc)
            if use_cached_prefix
            else self._init_state(batch=1, seq_len=alloc)
        )

        t_dev = jnp.float32(temperature)
        p_dev = jnp.float32(top_p)
        r_dev = jnp.float32(repetition_penalty)

        # Prefill + the first (streaming-threshold-sized) chunk in one device
        # call: the time-to-first-audio path pays per-call dispatch latency,
        # so the first vocoder input should exist after a single round trip.
        # n0 == 0 when the prefill frame alone fills the budget (max_new <= 1).
        n0 = max(0, min(ecfg.first_chunk - 1, ecfg.decode_chunk, max_new - 1))
        kv_pre = (
            0 if prefix_len == 0
            else _kv_bucket(prefix_len, ecfg.kv_bucket_step, cfg.max_seq_len)
        )
        # ONE base key per generation: decode derives frame keys as
        # fold_in(base, step), so the sampled sequence is invariant to chunk
        # scheduling (streaming vs batch chunk sizes, speculative dispatch).
        base_key = self._next_key()
        state, frames, emitted = decode_mod.prefill_chunk(
            self.params, self.rope, state,
            jnp.asarray(padded), jnp.asarray([T], jnp.int32),
            base_key, t_dev, p_dev, r_dev,
            cfg=cfg, ids=self.ids, num_frames=n0,
            top_k=ecfg.sample_top_k, approx=ecfg.approx_top_k,
            kv_bucket_prefill=kv_pre,
            # read windows clamp to the allocation (alloc covers the whole
            # decode extent; bucket-step rounding may overshoot it)
            kv_bucket=min(alloc, _kv_bucket(
                prompt_len + n0, ecfg.kv_bucket_step, cfg.max_seq_len
            )),
            fast_kernel=self._fast_kernel,
        )

        # Pipelined chunk loop: dispatch chunk k+1 to the device BEFORE
        # forcing chunk k's outputs, so the device never idles on per-call
        # dispatch latency (which otherwise dominates end-to-end RTF over a
        # tunneled device: ~35 ms x one round trip per 20-frame chunk).  EOS
        # is derived from the already-fetched frames — reading state["done"]
        # is impossible anyway once the speculative dispatch has consumed
        # (donated) the state.  The one chunk dispatched past EOS is discarded
        # via its emitted mask (its frames replay the held final frame).
        dispatched = 1 + n0  # frames in flight, upper bound (all emitted)
        pending = (frames, emitted, True)
        produced = 0
        collected: list[np.ndarray] = []

        # Streaming keeps small chunks (each one becomes a vocoder input);
        # batch mode fetches as few times as possible — each force pays a
        # dispatch round trip, which dominates e2e RTF on a tunneled device.
        chunk = ecfg.decode_chunk if streaming else self._large_chunk
        while pending is not None:
            frames_dev, emitted_dev, is_first = pending
            nxt = None
            if dispatched < max_new:
                n = _chunk_len(max_new - dispatched, chunk, ecfg.decode_chunk)
                state, f2, e2 = decode_mod.decode_chunk(
                    self.params, self.rope, state, base_key,
                    t_dev, p_dev, r_dev,
                    cfg=cfg, ids=self.ids, num_frames=n,
                    top_k=ecfg.sample_top_k, approx=ecfg.approx_top_k,
                    kv_bucket=min(alloc, _kv_bucket(
                        prompt_len + dispatched + n,
                        ecfg.kv_bucket_step, cfg.max_seq_len,
                    )),
                    fast_kernel=self._fast_kernel,
                    early_exit=not streaming,
                )
                nxt = (f2, e2, False)
                dispatched += n
            with self.metrics.span("prefill" if is_first else "decode"):
                frames_np = np.asarray(frames_dev)  # (1, m, 1+K)
                emitted_np = np.asarray(emitted_dev)[0]  # (m,)
            # A stream is done after this chunk iff it stopped emitting
            # mid-chunk or its last frame sampled <|im_end|> (identical to
            # state["done"], which decode writes as was_done | frame==im_end).
            done = bool(
                (not emitted_np[-1])
                or frames_np[0, -1, 0] == self.ids.im_end
            )
            self.metrics.record_tokens(
                int(min(emitted_np.sum(), max_new - produced))
            )
            if show_progress and not is_first:
                # chunk-level progress (the reference shows per-token tqdm,
                # inference.py:184; chunks are the host-visible granularity)
                logger.info(
                    "decoded %d/%d frames%s", produced + int(emitted_np.sum()),
                    max_new, " (EOS)" if done else "",
                )

            valid = frames_np[:, emitted_np]  # (1, m', 1+K)
            # Cap at the token budget.
            room = max_new - produced
            if valid.shape[1] > room:
                valid = valid[:, :room]
            produced += valid.shape[1]

            if valid.shape[1]:
                collected.append(valid)
                if streaming:
                    codes = np.maximum(valid[0, :, 1:], 0)  # clamp, inference.py:817-818
                    yield GenerateResponse(
                        action="sample", codes=codes.T.astype(np.int64), text=text
                    )
            pending = None if (done or produced >= max_new) else nxt

        if not streaming:
            all_frames = np.concatenate(collected, axis=1)[0]  # (n, 1+K)
            # Batch mode strips the final frame (EOS or not — reference quirk,
            # inference.py:839) and the prompt is naturally absent.
            codes = all_frames[:-1, 1:].T if all_frames.shape[0] > 1 else all_frames[:0, 1:].T
            codes = np.maximum(codes, 0)
            yield GenerateResponse(
                action="sample", codes=codes.astype(np.int64), text=text
            )

    # -- batched serving ---------------------------------------------------

    def generate_batch(
        self,
        texts: list[str],
        *,
        max_new_tokens: int = 0,
        top_p: float | list[float] = 0.8,
        repetition_penalty: float | list[float] = 1.1,
        temperature: float | list[float] = 0.8,
        prompt_text: list[str] | None = None,
        prompt_tokens: list[np.ndarray] | None = None,
        use_prefix_cache: bool = True,
    ) -> list[np.ndarray]:
        """Decode several utterances in one batched device program
        (green-field vs the reference, which hard-codes batch 1 at
        inference.py:314, 676).  See :meth:`_batch_chunks` for the serving
        behaviors (prefix forking, bucket groups, pipelined dispatch,
        per-stream sampling params).

        Returns one ``(num_codebooks, n_b)`` code array per text, with the
        final frame stripped as in single-utterance batch mode
        (inference.py:839).
        """
        frames_all, emitted_all = [], []
        # non-streaming: large chunks minimize device->host fetches (frame
        # keys are fold_in(base, step), so the codes are bit-identical to
        # the small-chunk streaming variant's)
        chunk = self._large_chunk
        for frames, emitted in self._batch_chunks(
            texts, max_new_tokens=max_new_tokens, top_p=top_p,
            repetition_penalty=repetition_penalty, temperature=temperature,
            prompt_text=prompt_text, prompt_tokens=prompt_tokens,
            use_prefix_cache=use_prefix_cache, chunk_frames=chunk,
        ):
            frames_all.append(frames)
            emitted_all.append(emitted)
        if not frames_all:
            return []
        frames = np.concatenate(frames_all, axis=1)  # (B, N, 1+K)
        emitted = np.concatenate(emitted_all, axis=1)  # (B, N)
        out = []
        for b in range(len(texts)):
            fb = frames[b, emitted[b]]  # (n_b, 1+K)
            codes = fb[:-1, 1:].T if fb.shape[0] > 1 else fb[:0, 1:].T
            out.append(np.maximum(codes, 0).astype(np.int64))
        return out

    def generate_batch_stream(
        self,
        texts: list[str],
        *,
        max_new_tokens: int = 0,
        top_p: float | list[float] = 0.8,
        repetition_penalty: float | list[float] = 1.1,
        temperature: float | list[float] = 0.8,
        prompt_text: list[str] | None = None,
        prompt_tokens: list[np.ndarray] | None = None,
        use_prefix_cache: bool = True,
    ) -> Iterator[list[np.ndarray | None]]:
        """Streaming variant of :meth:`generate_batch`: per decoded device
        chunk, yields one ``(num_codebooks, m_b)`` code array per stream
        (``None`` for streams that emitted nothing — already past EOS).
        Streaming semantics include each stream's EOS frame, like the
        single-stream streaming path (inference.py:271-274).  Chunks where
        no stream emitted anything (e.g. the one speculative chunk fetched
        after every stream already hit EOS) are not yielded."""
        for frames, emitted in self._batch_chunks(
            texts, max_new_tokens=max_new_tokens, top_p=top_p,
            repetition_penalty=repetition_penalty, temperature=temperature,
            prompt_text=prompt_text, prompt_tokens=prompt_tokens,
            use_prefix_cache=use_prefix_cache,
        ):
            if not emitted.any():
                continue
            out: list[np.ndarray | None] = []
            for b in range(len(texts)):
                fb = frames[b, emitted[b]]  # (m_b, 1+K)
                if fb.shape[0] == 0:
                    out.append(None)
                else:
                    out.append(
                        np.maximum(fb[:, 1:], 0).astype(np.int64).T
                    )
            yield out

    def _batch_chunks(
        self,
        texts: list[str],
        *,
        max_new_tokens: int = 0,
        top_p: float | list[float] = 0.8,
        repetition_penalty: float | list[float] = 1.1,
        temperature: float | list[float] = 0.8,
        prompt_text: list[str] | None = None,
        prompt_tokens: list[np.ndarray] | None = None,
        use_prefix_cache: bool = True,
        chunk_frames: int | None = None,
    ) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        """Batched decode core: yields ``(frames (B, n, 1+K), emitted (B, n))``
        per device chunk, rows in CALLER order.  All streams decode in one
        device program; each stops at its own EOS (once every stream is done
        the remaining scan steps of the chunk skip the model — see
        decode_chunk's all-done cond).

        Serving behaviors:
        - with a cached voice-profile prefix (set_prefix) and no explicit
          references, the B=1 prefix KV is FORKED across the batch and only
          each stream's target-text suffix is prefilled — the references are
          never re-prefilled per call;
        - streams are grouped by prompt bucket and each group prefills at its
          own padded length (one prefill program per distinct bucket in the
          batch), instead of padding every stream to the longest prompt;
        - chunk k+1 is dispatched before chunk k's outputs are fetched
          (pipelined, as in _generate_one).

        Sampling params accept either one shared scalar or one value per
        stream (the reference has neither batching nor per-request params);
        per-stream values broadcast as (B, 1) columns through the sampler.
        """
        if not texts:
            return
        B = len(texts)

        def _vec(x, name, ok):
            arr = np.full(B, float(x), np.float32) if np.isscalar(x) \
                else np.asarray(x, np.float32)
            if arr.shape != (B,):
                raise ValueError(f"{name} must be a scalar or one value per text")
            if not ok(arr).all():
                raise ValueError(f"{name} out of range")
            return arr

        # same ranges as generate_long (reference inference.py:763-765)
        t_arr = _vec(temperature, "temperature", lambda a: (0 < a) & (a < 2))
        p_arr = _vec(top_p, "top_p", lambda a: (0 < a) & (a <= 1))
        r_arr = _vec(repetition_penalty, "repetition_penalty",
                     lambda a: (0 < a) & (a < 2))
        uniform = (
            (t_arr == t_arr[0]).all() and (p_arr == p_arr[0]).all()
            and (r_arr == r_arr[0]).all()
        )
        cfg, ecfg = self.cfg, self.engine_cfg
        prompt_text = prompt_text or []
        prompt_tokens = prompt_tokens or []

        # ONE atomic snapshot (see _fork_prefix): prefix_len, kv_pre and the
        # forked KV below must all describe the SAME prefix epoch even if a
        # concurrent set_prefix/clear_prefix lands mid-call
        prefix_snap = self._prefix_ref[0]
        use_cached_prefix = (
            use_prefix_cache and prefix_snap is not None and not prompt_text
        )
        if use_cached_prefix:
            encs = [self._encode_suffix(t) for t in texts]
            prefix_len = int(prefix_snap["pos"][0])
        else:
            encs = [
                build_prompt(
                    self.tokenizer, t, cfg.num_codebooks,
                    prompt_texts=prompt_text, prompt_codes=prompt_tokens,
                )
                for t in texts
            ]
            prefix_len = 0

        lengths = np.array([e.values.shape[1] for e in encs], np.int32)
        prompt_lens = prefix_len + lengths  # full context per stream
        reserve = min(2048, cfg.max_seq_len // 2)
        if prompt_lens.max() > cfg.max_seq_len - reserve:
            raise ValueError(f"Prompt is too long: {prompt_lens.max()}")
        max_len = int(prompt_lens.max())
        # PER-STREAM budgets, matching each stream's solo run (max_new_i =
        # min(requested, max_seq_len - own prompt)): each stream has its own
        # KV rows, so a shared cap derived from the LONGEST prompt would
        # silently truncate short-prompt streams relative to generate_long
        budgets = (cfg.max_seq_len - prompt_lens).astype(np.int64)
        if max_new_tokens:
            budgets = np.minimum(max_new_tokens, budgets)
        max_new = int(budgets.max())

        def group_params(idxs):
            """Sampling params for the streams ``idxs``: scalars when shared
            (the bit-exact single-param path), else (len(idxs), 1) columns."""
            if uniform:
                return (jnp.float32(t_arr[0]), jnp.float32(p_arr[0]),
                        jnp.float32(r_arr[0]))
            sel = np.asarray(idxs)
            return (jnp.asarray(t_arr[sel][:, None]),
                    jnp.asarray(p_arr[sel][:, None]),
                    jnp.asarray(r_arr[sel][:, None]))

        kv_pre = (
            0 if prefix_len == 0
            else _kv_bucket(prefix_len, ecfg.kv_bucket_step, cfg.max_seq_len)
        )
        cap = cfg.max_seq_len - 1

        # Group streams by prompt bucket: each group prefills at its own
        # padded length (short prompts don't pay for the longest stream's
        # bucket); decode then runs over the recombined full batch.  Group
        # order is by bucket; ``order`` maps back to caller order.
        by_bucket: dict[int, list[int]] = {}
        for i, n in enumerate(lengths):
            by_bucket.setdefault(
                _pick_bucket(ecfg.prompt_buckets, int(n), cap), []
            ).append(i)

        # shared KV allocation bucket (groups are concatenated after prefill,
        # so every group allocates the same length): worst-case decode extent
        # across streams, never below any group's padded prefill write extent
        alloc = _cache_bucket(
            max(max_len + max_new + 2 * self._large_chunk,
                prefix_len + max(by_bucket.keys()) + 1),
            cfg.max_seq_len,
        )

        order: list[int] = []
        group_states, group_firsts = [], []
        with self.metrics.span("prefill"):
            for bucket, idxs in sorted(by_bucket.items()):
                Bg = len(idxs)
                order.extend(idxs)
                padded = np.zeros((Bg, 1 + cfg.num_codebooks, bucket), np.int32)
                for row, i in enumerate(idxs):
                    padded[row, :, : lengths[i]] = encs[i].values
                state_g = (
                    self._fork_prefix_batch(prefix_snap, Bg, seq_len=alloc)
                    if use_cached_prefix
                    else self._init_state(batch=Bg, seq_len=alloc)
                )
                t_g, p_g, r_g = group_params(idxs)
                state_g, first_g = decode_mod.prefill(
                    self.params, self.rope, state_g,
                    jnp.asarray(padded),
                    jnp.asarray(lengths[idxs], jnp.int32),
                    self._next_key(), t_g, p_g, r_g,
                    cfg=cfg, ids=self.ids, top_k=ecfg.sample_top_k,
                    approx=ecfg.approx_top_k, kv_bucket=kv_pre,
                    # first-frame path matches prefill_chunk (solo
                    # streaming) and serve admission on TPU
                    fast_kernel=self._fast_kernel,
                )
                group_states.append(state_g)
                group_firsts.append(first_g)

            if len(group_states) == 1:
                state, first = group_states[0], group_firsts[0]
            else:
                state = {
                    "kv": {
                        k: jnp.concatenate(
                            [s["kv"][k] for s in group_states], axis=1
                        )
                        for k in ("k", "v")
                    },
                    **{
                        k: jnp.concatenate(
                            [s[k] for s in group_states], axis=0
                        )
                        for k in ("frame", "pos", "prev", "step", "done")
                    },
                }
                if self.mesh is not None:
                    from fish_tts_tpu.parallel import sharding

                    state = sharding.shard_state(state, self.mesh)
                first = jnp.concatenate(group_firsts, axis=0)

        # internal (grouped) row -> caller stream index
        inv = np.empty(B, np.int64)
        inv[np.asarray(order)] = np.arange(B)
        budgets_g = budgets[np.asarray(order)]  # grouped row order
        # decode-loop sampling params in grouped row order
        t_dev, p_dev, r_dev = group_params(order)

        # Pipelined chunk loop (same pattern as _generate_one): dispatch the
        # next chunk before forcing the previous one — including chunk 1
        # before the prefill frame is fetched; per-stream done is derived
        # from the fetched frames (stopped emitting mid-chunk, or the last
        # frame sampled im_end).  done_rows lags one chunk behind — worst
        # case one extra chunk is dispatched, and its scan steps skip the
        # model via the all-done cond.  Frame keys are fold_in(base, step)
        # (see decode_chunk), so the sampled codes are identical whatever
        # ``chunk_frames`` the caller picked.
        chunk = chunk_frames or ecfg.decode_chunk
        base_key = self._next_key()

        def dispatch(state, dispatched):
            n = _chunk_len(max_new - dispatched, chunk, ecfg.decode_chunk)
            state, f2, e2 = decode_mod.decode_chunk(
                self.params, self.rope, state, base_key,
                t_dev, p_dev, r_dev,
                cfg=cfg, ids=self.ids, num_frames=n,
                top_k=ecfg.sample_top_k, approx=ecfg.approx_top_k,
                kv_bucket=min(alloc, _kv_bucket(
                    max_len + dispatched + n,
                    ecfg.kv_bucket_step, cfg.max_seq_len,
                )),
                fast_kernel=self._fast_kernel,
                # post-EOS steps inside a chunk skip the model: implied by
                # B>1, but B=1 generate_batch with large chunks needs it too
                early_exit=True,
            )
            return state, (f2, e2, n)

        dispatched = 1
        pending = None
        if dispatched < max_new:
            state, pending = dispatch(state, dispatched)
            dispatched += pending[2]

        first_np = np.asarray(first)  # (B, 1+K) grouped order
        self.metrics.record_tokens(B)
        yield first_np[inv][:, None, :], np.ones((B, 1), bool)

        done_rows = (first_np[:, 0] == self.ids.im_end) | (budgets_g <= 1)
        produced = 1
        while True:
            nxt = None
            if dispatched < max_new and not bool(done_rows.all()):
                state, nxt = dispatch(state, dispatched)
                dispatched += nxt[2]
            if pending is None and nxt is None:
                break
            if pending is not None:
                f_dev, e_dev, n_disp = pending
                with self.metrics.span("decode"):
                    f_np = np.asarray(f_dev)
                    e_np = np.asarray(e_dev)
                n = min(n_disp, max_new - produced)
                # clamp each row to ITS budget: columns past
                # budgets_g[i] - produced are over-decode for that stream
                # (the loop keeps running for bigger-budget co-streams)
                e_np = e_np & (
                    np.arange(n_disp)[None, :]
                    < (budgets_g - produced)[:, None]
                )
                produced += n
                done_rows = (
                    (~e_np[:, -1])
                    | (f_np[:, -1, 0] == self.ids.im_end)
                    | (budgets_g <= produced)
                )
                self.metrics.record_tokens(int(e_np[:, :n].sum()))
                yield f_np[inv][:, :n], e_np[inv][:, :n]
            pending = nxt
