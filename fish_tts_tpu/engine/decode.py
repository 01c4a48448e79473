"""The DualAR decode engine: jitted prefill + chunked on-device decode.

This replaces the reference's Python token loop + per-step host sync
(/root/reference/fish_tts/models/inference.py:158-276) with:

- ``prefill``: one jitted whole-prompt forward over a bucketized (padded)
  prompt that writes the KV cache and samples the first frame — the analog of
  the reference's prefill call into ``decode_one_token_ar`` with the full
  prompt (inference.py:353-363).
- ``decode_chunk``: a ``lax.scan`` over N frames entirely on device.  Each
  scan step is the analog of the reference's compiled ``decode_one_token_ar``
  (inference.py:83-155): slow forward -> sample semantic token -> fresh fast
  KV cache -> fast position 0 write (output discarded) -> scan over residual
  codebooks with top-p sampling.  EOS is tracked with an on-device ``done``
  flag; the host reads it once per chunk instead of once per token
  (the reference syncs every step at inference.py:210).

Replicated reference quirks (SURVEY §7):
- slow-token repetition penalty indexes the first *column* of the 16-frame
  window (``previous_tokens[:, 0]``, inference.py:110) — the oldest entry
  (slot ``i % 16`` of our circular buffer) once ``i >= 16``, and the step-0
  frame (slot 0; zeros at step 0) while ``i < 16``, because the reference
  passes ``previous_tokens[:, :16]`` for those early steps
  (inference.py:185-189);
- fast forward at codebook position 0 discards its output (inference.py:121-122);
- the first (prefill-sampled) frame is *not* recorded in the penalty window
  (the reference allocates ``previous_tokens`` inside ``decode_n_tokens``,
  inference.py:175-179, after the prefill frame was produced);
- ``a = semantic_token - semantic_begin_id`` clamped at 0 (inference.py:123-124).

State is a plain pytree so the whole engine jits and shards transparently.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from fish_tts_tpu.config import DualARConfig
from fish_tts_tpu.engine.sampling import sample
from fish_tts_tpu.models import dual_ar
from fish_tts_tpu.models.dual_ar import Params, TokenIds
from fish_tts_tpu.ops import fast_decoder, sampler_kernel, slow_stack
from fish_tts_tpu.utils.quantize import qgather

from fish_tts_tpu.ops.attention import _NEG_INF  # one mask constant repo-wide

WINDOW = 16  # default repetition-penalty window (reference inference.py:187)

State = dict[str, Any]


def init_state(
    params: Params,
    cfg: DualARConfig,
    batch: int,
    max_seq_len: int | None = None,
    window: int = WINDOW,
) -> State:
    """Fresh decode state: zero KV cache, zero penalty window, step 0.

    ``window`` sizes the repetition-penalty circular buffer
    (``EngineConfig.rep_penalty_window``; the reference hard-codes 16 at
    inference.py:187).  All decode functions derive the window from this
    state shape, so the knob is set once here.
    """
    dtype = params["norm"].dtype
    return {
        "kv": dual_ar.init_kv_cache(cfg, batch, max_seq_len, dtype),
        "frame": jnp.zeros((batch, 1 + cfg.num_codebooks), jnp.int32),
        "pos": jnp.zeros((batch,), jnp.int32),
        "prev": jnp.zeros((batch, 1 + cfg.num_codebooks, window), jnp.int32),
        # per-slot local step counter: slots admitted mid-flight (continuous
        # batching) count their own frames from 0, so penalty-window slots
        # and per-frame RNG are invariant to WHEN a stream joined the batch
        "step": jnp.zeros((batch,), jnp.int32),
        "done": jnp.zeros((batch,), jnp.bool_),
    }


@partial(jax.jit, static_argnames=("new_len",), donate_argnames=("state",))
def resize_cache(state: State, *, new_len: int) -> State:
    """Re-allocate the state's KV cache to ``new_len`` positions.

    Round-5 finding (PERFORMANCE.md): per-frame decode cost grows ~linearly
    with the *allocated* cache length — ~0.5 ms per GB per frame at B=16 on
    v5e, regardless of the ``kv_bucket`` read window and on both the XLA
    and Pallas paths (XLA traverses the full carried cache arrays every
    scan step).  Sizing the allocation to the live workload (and growing it
    in buckets as streams lengthen) removes that cost: B=16 decode measured
    5.11 -> 3.37 ms/frame going from a 4096- to a 512-row cache.

    Growing pads zeros above the live rows; shrinking slices.  The caller
    must guarantee ``max(pos) <= new_len`` when shrinking (rows at and
    above ``new_len`` are dropped).  One-time O(cache) device copy.
    """
    kv = state["kv"]
    S = kv["k"].shape[3]
    if new_len == S:
        return state
    if new_len < S:
        new_kv = {
            "k": kv["k"][:, :, :, :new_len],
            "v": kv["v"][:, :, :, :new_len],
        }
    else:
        pad = [(0, 0)] * 5
        pad[3] = (0, new_len - S)
        new_kv = {"k": jnp.pad(kv["k"], pad), "v": jnp.pad(kv["v"], pad)}
    out = dict(state)
    out["kv"] = new_kv
    return out


def is_single_key(key: jax.Array) -> bool:
    """True for ONE prng key (typed scalar or raw (2,) uint32), False for a
    per-slot batch of keys (typed (B,) or raw (B, 2))."""
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        return key.ndim == 0
    return key.ndim == 1


def normalize_keys(key: jax.Array, batch: int) -> jax.Array:
    """One base key -> (batch,) per-slot base keys (fold_in by slot); a
    per-slot key batch passes through (continuous batching supplies each
    slot's key from its request so samples are co-tenant-invariant)."""
    if is_single_key(key):
        return jax.vmap(lambda i: jax.random.fold_in(key, i))(
            jnp.arange(batch)
        )
    assert key.shape[0] == batch, key.shape
    return key


def penalty_column(prev: jnp.ndarray, step: jnp.ndarray) -> jnp.ndarray:
    """The window column the slow-token repetition penalty reads
    (reference ``previous_tokens[:, 0]``, inference.py:110).

    The reference passes ``previous_tokens[:, :W]`` while ``step < W`` —
    column 0 is then the step-0 frame (zeros before step 0 writes it) — and
    ``previous_tokens[:, step-W:step]`` afterwards, where column 0 is the
    oldest frame in the window.  In our circular buffer (slot ``j % W`` holds
    step ``j``'s frame) those are slot 0 and slot ``step % W`` respectively.
    ``step`` is per-slot (B,); the window size is carried by the state shape
    (see ``init_state``).
    """
    W = prev.shape[2]
    col = jnp.where(step < W, 0, step % W)  # (B,)
    return jnp.take_along_axis(prev, col[:, None, None], axis=2)[:, :, 0]


# ---------------------------------------------------------------------------
# Frame sampling (shared by prefill and decode): slow logits -> full frame
# ---------------------------------------------------------------------------


def _sample_frame(
    params: Params,
    cfg: DualARConfig,
    ids: TokenIds,
    rope: Params,
    keys: jax.Array,  # (B,) per-slot PRNG keys
    hidden_last: jnp.ndarray,  # (B, 1, D) un-normed hidden at the sampled position
    logits: jnp.ndarray,  # (B, V)
    temperature: jnp.ndarray,
    top_p: jnp.ndarray,
    repetition_penalty: jnp.ndarray,
    prev: jnp.ndarray | None,  # (B, 1+K, W) circular window, or None (prefill)
    step: jnp.ndarray | None,  # (B,) per-slot step (for the column quirk)
    top_k: int,
    approx: bool = False,
    fast_kernel: bool = False,
    window: int = WINDOW,  # configured penalty window (matters only for the
    # prev=None dummy: a mismatch would compile a second kernel variant)
) -> jnp.ndarray:
    """Sample one full (1+K)-row frame (reference decode_one_token_ar,
    inference.py:83-155).  Returns (B, 1+K) int32.

    RNG is per slot: row ``b``'s noise comes from ``keys[b]`` alone, so a
    stream's samples do not depend on its co-tenants (the continuous-batching
    invariant; batch callers derive decorrelated slot keys via
    :func:`normalize_keys`).

    With ``fast_kernel`` (and int8 params, B <= fast_decoder.MAX_BATCH) the
    codebook loop runs in the fused Pallas kernel (ops/fast_decoder.py) —
    same math, f32 accumulation, exact full-vocab top-p; otherwise the XLA
    ``lax.scan`` loop below.
    """
    B = logits.shape[0]
    pair = jax.vmap(lambda k: jax.random.split(k))(keys)  # (B, 2) keys
    k_slow, k_fast = pair[:, 0], pair[:, 1]

    # Slow/semantic token — window quirk: the reference penalizes
    # previous_tokens[:, 0], the first window *column* (inference.py:110).
    # For steps >= W the window is previous_tokens[:, i-W:i] so column 0 is
    # the oldest frame = circular slot (step % W); for steps < W the window
    # is previous_tokens[:, :W] so column 0 is the step-0 frame, which our
    # circular buffer keeps in slot 0 (zeros at step 0, exactly like the
    # reference's untouched buffer).
    prev_col = None
    if prev is not None:
        prev_col = penalty_column(prev, step)  # (B, 1+K)
    if fast_kernel and sampler_kernel.supports(B, top_k):
        # fused sampler: penalty + exact threshold top-p + Gumbel argmax
        # with the (B, V) logits VMEM-resident (ops/sampler_kernel.py)
        if prev_col is None:
            pc = jnp.zeros((B, 1), jnp.int32)
            rep_eff = jnp.float32(1.0)  # exact no-op (prefill has no penalty)
        else:
            pc = prev_col
            rep_eff = repetition_penalty
        token = sampler_kernel.sample_slow(
            k_slow, logits.astype(jnp.float32), pc,
            temperature, top_p, rep_eff,
            vocab=cfg.vocab_size,
            interpret=jax.default_backend() != "tpu",
        )
    else:
        token = sample(
            k_slow, logits, temperature, top_p, repetition_penalty,
            prev_idx=prev_col, top_k=top_k, approx=approx,
        )  # (B,)

    # Fast transformer: fresh cache each frame (= reference's zeroing,
    # inference.py:116-119); position 0 consumes the slow hidden state and its
    # output is discarded (inference.py:121-122).
    dt = params["norm"].dtype
    h_fast = dual_ar.project_fast_in(params, hidden_last).astype(dt)

    # The fused kernel always samples the residual books with exact
    # full-vocab top-p; a truncated candidate search (top_k > 0) would
    # diverge from it, so those calls take the XLA path below for uniform
    # sampler behavior across batch sizes and precisions.
    if fast_kernel and top_k <= 0 and fast_decoder.supports(cfg, params, B):
        a = jnp.clip(token - ids.semantic_begin, 0, cfg.codebook_size - 1)
        if prev is not None:
            prev_rows = prev[:, 2:, :]  # row cb+1 per residual step cb
            rep = repetition_penalty
        else:
            prev_rows = jnp.zeros((B, cfg.num_codebooks - 1, window), jnp.int32)
            rep = jnp.float32(1.0)  # exact no-op penalty (prefill)
        gumbel = jax.vmap(
            lambda k: jax.random.gumbel(
                k, (cfg.num_codebooks - 1, cfg.residual_codebook_size),
                jnp.float32,
            )
        )(k_fast)  # (B, K-1, Vr), row b from keys[b] alone
        codes, _ = fast_decoder.fast_decode_frame(
            params, cfg, rope["fast"], h_fast[:, 0], a, prev_rows, gumbel,
            temperature, top_p, rep,
            window=prev_rows.shape[-1],
            interpret=jax.default_backend() != "tpu",
        )  # (B, K-1)
        frame = jnp.concatenate(
            [token[:, None], a[:, None], codes], axis=1
        )
        return frame.astype(jnp.int32)  # (B, 1+K)

    cache = dual_ar.new_fast_cache(params, cfg, B)
    _, cache = dual_ar.fast_step(params, cfg, rope, h_fast, jnp.int32(0), cache)

    # a = token - semantic_begin, clamped at 0 (inference.py:123-124).  The
    # upper clamp has no effect with the real vocab layout (semantic tokens
    # are the last special block, so token <= semantic_end always); it guards
    # small test vocabs where ids above semantic_end exist.
    a = jnp.clip(token - ids.semantic_begin, 0, cfg.codebook_size - 1)  # (B,)
    emb = qgather(params["fast_embeddings"], a, dt)[:, None]  # (B, 1, Df)

    def fast_body(carry, inp):
        emb, cache = carry
        cb_idx, sub = inp  # sub: (B,) per-slot keys for this codebook step
        logits_cb, cache = dual_ar.fast_step(params, cfg, rope, emb, cb_idx, cache)
        short = logits_cb[:, -1, : cfg.residual_codebook_size]  # inference.py:134
        prev_row = None
        if prev is not None:
            prev_row = jax.lax.dynamic_index_in_dim(
                prev, cb_idx + 1, axis=1, keepdims=False
            )  # (B, W) — inference.py:141-145
        # Truncated slow-token search also truncates the residual-book
        # nucleus to 256 candidates (a full top_k(1024) is a sort; the
        # nucleus at top_p<=0.95 never comes close to 256 entries).  The
        # exact modes propagate unchanged: -1 = sort-free threshold top-p
        # (matching the fused kernel's math), 0 = exact full sort.
        res_k = min(256, cfg.residual_codebook_size) if top_k > 0 else top_k
        code = sample(
            sub, short, temperature, top_p, repetition_penalty,
            prev_idx=prev_row, top_k=res_k, approx=approx,
        )
        emb = qgather(params["fast_embeddings"], code, dt)[:, None]
        return (emb, cache), code

    cb_indices = jnp.arange(1, cfg.num_codebooks, dtype=jnp.int32)
    # (B, K-1) per-slot subkeys -> scan consumes one (B,) column per step
    subkeys = jnp.swapaxes(
        jax.vmap(lambda k: jax.random.split(k, cfg.num_codebooks - 1))(k_fast),
        0, 1,
    )
    (_, _), res_codes = jax.lax.scan(
        fast_body, (emb, cache), (cb_indices, subkeys)
    )  # res_codes: (K-1, B)

    frame = jnp.concatenate(
        [token[None], a[None], res_codes], axis=0
    )  # (1+K, B)
    return jnp.swapaxes(frame, 0, 1).astype(jnp.int32)  # (B, 1+K)


# ---------------------------------------------------------------------------
# Prefill
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=("cfg", "ids", "top_k", "approx", "kv_bucket",
                     "fast_kernel"),
    donate_argnames=("state",),
)
def prefill(
    params: Params,
    rope: Params,
    state: State,
    prompt: jnp.ndarray,  # (B, 1+K, Tb) right-padded to bucket length
    lengths: jnp.ndarray,  # (B,) real prompt lengths
    key: jax.Array,
    temperature: jnp.ndarray,
    top_p: jnp.ndarray,
    repetition_penalty: jnp.ndarray,
    *,
    cfg: DualARConfig,
    ids: TokenIds,
    top_k: int = 0,
    approx: bool = False,
    kv_bucket: int | None = None,
    fast_kernel: bool = False,
) -> tuple[State, jnp.ndarray]:
    """Whole-prompt forward at positions ``state.pos + [0, Tb)`` + first frame.

    Padding is safe by construction: causal masking means the last *real*
    position never attends to padding on its right, and stale padded KV slots
    are overwritten by decode steps before any query can reach them.

    ``kv_bucket`` (static) is an upper bound on the live cache prefix: 0 for
    a fresh sequence (skips all cached-attention reads — the cache holds no
    live rows yet), or the prefix length rounded up to a bucket when resuming
    from a cached voice-profile prefix.  ``None`` reads the full cache.

    Returns (state, first_frame (B, 1+K)).  No repetition penalty on the first
    frame (the reference prefill passes previous_tokens=None,
    inference.py:353-363).  ``key`` is one base key (decorrelated per slot
    via :func:`normalize_keys`) or a (B,) per-slot key batch.
    """
    B, _, Tb = prompt.shape
    keys = normalize_keys(key, B)
    S = state["kv"]["k"].shape[3]
    offset = state["pos"]  # (B,)
    R = S if kv_bucket is None else kv_bucket

    positions = offset[:, None] + jnp.arange(Tb, dtype=jnp.int32)[None]  # (B, Tb)
    # Cache is valid strictly below the write offset (prefix-reuse rows);
    # the block itself is causally masked among its own T tokens.
    if R > 0:
        k_pos = jnp.arange(R, dtype=jnp.int32)
        cache_bias = jnp.where(
            k_pos[None, None, None, :] < offset[:, None, None, None], 0.0, _NEG_INF
        ).astype(jnp.float32)  # (B, 1, 1->Tb, R)
        cache_bias = jnp.broadcast_to(cache_bias, (B, 1, Tb, R))
    else:
        cache_bias = None
    t_idx = jnp.arange(Tb, dtype=jnp.int32)
    block_bias = jnp.where(
        t_idx[None, :] <= t_idx[:, None], 0.0, _NEG_INF
    )[None, None].astype(jnp.float32)  # (1, 1, Tb, Tb)

    hidden, kv = dual_ar.slow_forward(
        params, cfg, ids, rope, prompt, positions, state["kv"],
        cache_bias, block_bias, read_len=kv_bucket,
    )
    # Hidden at the last real position (reference slices to the last position
    # before the LM head, llama.py:443-444; ours is lengths-1 due to padding).
    last_idx = (lengths - 1)[:, None, None]  # (B,1,1)
    hidden_last = jnp.take_along_axis(hidden, last_idx, axis=1)  # (B,1,D)
    logits = dual_ar.lm_logits(params, cfg, hidden_last)[:, -1]  # (B, V)

    frame = _sample_frame(
        params, cfg, ids, rope, keys, hidden_last, logits,
        temperature, top_p, repetition_penalty,
        prev=None, step=None, top_k=top_k, approx=approx,
        fast_kernel=fast_kernel, window=state["prev"].shape[2],
    )

    new_state = {
        "kv": kv,
        "frame": frame,
        "pos": offset + lengths,  # next write position
        "prev": state["prev"],
        "step": state["step"],
        "done": state["done"] | (frame[:, 0] == ids.im_end),
    }
    return new_state, frame


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------


def _decode_one(
    params: Params,
    cfg: DualARConfig,
    ids: TokenIds,
    rope: Params,
    state: State,
    keys: jax.Array,  # (B,) this frame's per-slot keys
    temperature: jnp.ndarray,
    top_p: jnp.ndarray,
    repetition_penalty: jnp.ndarray,
    top_k: int,
    approx: bool = False,
    kv_bucket: int | None = None,
    fast_kernel: bool = False,
) -> tuple[State, jnp.ndarray, jnp.ndarray]:
    """One decode step.  Returns (state, frame (B, 1+K), emitted (B,))."""
    B = state["frame"].shape[0]
    S = state["kv"]["k"].shape[3]
    R = S if kv_bucket is None else kv_bucket
    pos = state["pos"]  # (B,)

    inp = state["frame"][:, :, None]  # (B, 1+K, 1)
    positions = pos[:, None]  # (B, 1)

    if (fast_kernel and slow_stack.supports(cfg, params, B)
            and slow_stack.fits(cfg, B, R)):
        # Fused weight-streaming Pallas step (ops/slow_stack.py): embeds in
        # XLA, runs the 28-layer stack in one kernel against the read-only
        # cache slice, then scatters the returned K/V rows — numerically the
        # two-part-attention path below, at streaming HBM bandwidth.
        x_emb = dual_ar.embed_inputs(params, cfg, ids, inp)  # (B, 1, D)
        hidden, new_k, new_v, klogits = slow_stack.slow_stack_step(
            params, cfg, rope["slow"], x_emb[:, 0], state["kv"], pos,
            read_len=R, interpret=jax.default_backend() != "tpu",
        )
        cdt = state["kv"]["k"].dtype
        # per-stream dynamic_update_slice (B static slices) is far cheaper
        # than a gather/scatter lowering on TPU (~1.4 ms/frame difference at
        # S1-mini shapes for B=1; advanced-index scatter is worse still at
        # B=8) — each stream writes its row at its own position
        k_cache, v_cache = state["kv"]["k"], state["kv"]["v"]
        nk, nv = new_k.astype(cdt), new_v.astype(cdt)
        for b in range(B):
            start = (0, b, 0, pos[b], 0)
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, nk[:, b:b + 1], start
            )
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, nv[:, b:b + 1], start
            )
        kv = {"k": k_cache, "v": v_cache}
        hidden = hidden.astype(params["norm"].dtype)
    else:
        klogits = None
        # Cache valid strictly below pos; current token is the block self-key.
        k_pos = jnp.arange(R, dtype=jnp.int32)
        cache_bias = jnp.where(
            k_pos[None, None, None, :] < pos[:, None, None, None], 0.0, _NEG_INF
        ).astype(jnp.float32)  # (B, 1, 1, R)
        block_bias = jnp.zeros((1, 1, 1, 1), jnp.float32)

        hidden, kv = dual_ar.slow_forward(
            params, cfg, ids, rope, inp, positions, state["kv"],
            cache_bias, block_bias, read_len=kv_bucket,
        )
    if klogits is not None:
        logits = klogits.astype(params["norm"].dtype)  # fused head (B, V)
    else:
        logits = dual_ar.lm_logits(params, cfg, hidden)[:, -1]  # (B, V)

    frame = _sample_frame(
        params, cfg, ids, rope, keys, hidden, logits,
        temperature, top_p, repetition_penalty,
        prev=state["prev"], step=state["step"], top_k=top_k, approx=approx,
        fast_kernel=fast_kernel,
    )

    was_done = state["done"]
    emitted = ~was_done
    done = was_done | (frame[:, 0] == ids.im_end)

    # Record the frame in each slot's circular window at (step_b % W)
    # (reference writes previous_tokens[:, i:i+1], inference.py:208); steps
    # are per-slot so a mid-flight-admitted stream's window is identical to
    # its solo-decode window.
    slot = state["step"] % state["prev"].shape[2]  # (B,)
    rows = jnp.arange(state["prev"].shape[1])
    prev = state["prev"].at[
        jnp.arange(B)[:, None], rows[None, :], slot[:, None]
    ].set(frame)

    # Streams already done: hold position (their KV slot gets overwritten
    # harmlessly); live streams advance, clamped to the cache end.
    new_pos = jnp.where(was_done, pos, jnp.minimum(pos + 1, S - 1))
    new_frame = jnp.where(was_done[:, None], state["frame"], frame)

    new_state = {
        "kv": kv,
        "frame": new_frame,
        "pos": new_pos,
        "prev": prev,
        "step": state["step"] + 1,
        "done": done,
    }
    return new_state, frame, emitted


@partial(
    jax.jit,
    static_argnames=("cfg", "ids", "num_frames", "top_k", "approx",
                     "kv_bucket", "fast_kernel", "early_exit"),
    donate_argnames=("state",),
)
def decode_chunk(
    params: Params,
    rope: Params,
    state: State,
    key: jax.Array,
    temperature: jnp.ndarray,
    top_p: jnp.ndarray,
    repetition_penalty: jnp.ndarray,
    *,
    cfg: DualARConfig,
    ids: TokenIds,
    num_frames: int,
    top_k: int = 0,
    approx: bool = False,
    kv_bucket: int | None = None,
    fast_kernel: bool = False,
    early_exit: bool = False,
) -> tuple[State, jnp.ndarray, jnp.ndarray]:
    """Decode ``num_frames`` frames in one device call via ``lax.scan``.

    ``kv_bucket`` (static) bounds the live cache prefix the attention has to
    stream from HBM: the caller guarantees ``max(pos) + num_frames <=
    kv_bucket`` and rounds up to a small set of buckets so the compile count
    stays bounded.  At early positions this cuts per-frame KV reads from
    ``max_seq_len`` rows (235 MB at S1-mini shapes) to the bucket (~30 MB at
    512), which is the difference between HBM-bound and cache-bound decode.
    ``None`` reads the full cache (always correct).

    Returns (state, frames (B, num_frames, 1+K), emitted (B, num_frames)).
    ``emitted[b, t]`` is False for frames generated after stream ``b`` hit
    EOS (those are repeats of the final frame and must be dropped by the
    caller).  The EOS frame itself is emitted — batch vs streaming callers
    decide whether to strip it (reference strips it in batch mode via
    ``[:-1]`` at inference.py:839 but streams it at inference.py:271-274).

    Per-frame RNG is ``fold_in(slot_key, slot_step)`` per slot (slot keys
    from :func:`normalize_keys`): a caller that passes the same base key(s)
    gets bit-identical frames regardless of how the generation is cut into
    chunks (streaming 20-frame chunks and batch-mode 100-frame chunks sample
    the same sequence), and a slot's samples depend only on ITS key and ITS
    local step — the invariant continuous batching needs to reproduce solo
    decodes for mid-flight-admitted requests.
    """
    B = state["frame"].shape[0]
    keys = normalize_keys(key, B)

    def step(st):
        ks = jax.vmap(jax.random.fold_in)(keys, st["step"])
        return _decode_one(
            params, cfg, ids, rope, st, ks,
            temperature, top_p, repetition_penalty, top_k, approx,
            kv_bucket, fast_kernel,
        )

    if B > 1 or early_exit:
        # Once every stream has hit EOS mid-chunk, the remaining scan
        # iterations skip the model entirely.  Always on for batched serving;
        # ``early_exit`` also enables it for B=1 large-chunk (non-streaming)
        # decode, where up to num_frames-1 post-EOS steps would otherwise
        # run.  The streaming B=1 path keeps the tuned straight-line scan
        # (its chunks are small and the host stops at chunk granularity).
        def body(carry, _):
            st = carry
            st, frame, emitted = jax.lax.cond(
                st["done"].all(),
                lambda st: (st, st["frame"], jnp.zeros((B,), jnp.bool_)),
                step,
                st,
            )
            return st, (frame, emitted)
    else:
        def body(carry, _):
            st, frame, emitted = step(carry)
            return st, (frame, emitted)

    state, (frames, emitted) = jax.lax.scan(
        body, state, None, length=num_frames
    )
    # (T, B, ...) -> (B, T, ...)
    return state, jnp.swapaxes(frames, 0, 1), jnp.swapaxes(emitted, 0, 1)


@partial(
    jax.jit,
    static_argnames=("cfg", "ids", "num_frames", "top_k", "approx",
                     "kv_bucket_prefill", "kv_bucket", "fast_kernel"),
    donate_argnames=("state",),
)
def prefill_chunk(
    params: Params,
    rope: Params,
    state: State,
    prompt: jnp.ndarray,  # (B, 1+K, Tb)
    lengths: jnp.ndarray,  # (B,)
    key: jax.Array,
    temperature: jnp.ndarray,
    top_p: jnp.ndarray,
    repetition_penalty: jnp.ndarray,
    *,
    cfg: DualARConfig,
    ids: TokenIds,
    num_frames: int,
    top_k: int = 0,
    approx: bool = False,
    kv_bucket_prefill: int | None = None,
    kv_bucket: int | None = None,
    fast_kernel: bool = False,
) -> tuple[State, jnp.ndarray, jnp.ndarray]:
    """Prefill + the first ``num_frames`` decode steps in ONE device call.

    The latency path (time-to-first-audio) pays a fixed per-call dispatch
    cost on top of compute; fusing the prompt forward with the first chunk
    halves the round trips before the first vocoder input exists.

    Returns (state, frames (B, 1+num_frames, 1+K), emitted) where frame 0 is
    the prefill-sampled frame (always emitted).  ``num_frames=0`` is valid
    (prefill-only — e.g. a 1-token budget where the prefill frame already
    fills it) and skips the decode scan entirely.

    The inner decode scan consumes ``key`` directly (per-frame keys are
    ``fold_in(key, step)``, see decode_chunk), so later decode_chunk calls
    with the SAME base key continue the identical sampling sequence; the
    prefill frame uses a step index no decode step can reach.
    """
    keys = normalize_keys(key, prompt.shape[0])
    # prefill frame: a step index no decode step can reach
    k1 = jax.vmap(lambda k: jax.random.fold_in(k, 0x7FFFFFFF))(keys)
    k2 = keys
    state, first = prefill(
        params, rope, state, prompt, lengths, k1,
        temperature, top_p, repetition_penalty,
        cfg=cfg, ids=ids, top_k=top_k, approx=approx,
        kv_bucket=kv_bucket_prefill,
        # forwarded so the first frame samples through the SAME path (and
        # RNG consumption pattern) as serve admission and batch prefill,
        # which both promise to match this route
        fast_kernel=fast_kernel,
    )
    if num_frames == 0:
        B = first.shape[0]
        return state, first[:, None], jnp.ones((B, 1), jnp.bool_)
    state, frames, emitted = decode_chunk(
        params, rope, state, k2, temperature, top_p, repetition_penalty,
        cfg=cfg, ids=ids, num_frames=num_frames, top_k=top_k, approx=approx,
        kv_bucket=kv_bucket, fast_kernel=fast_kernel,
    )
    B = first.shape[0]
    frames_all = jnp.concatenate([first[:, None], frames], axis=1)
    emitted_all = jnp.concatenate(
        [jnp.ones((B, 1), jnp.bool_), emitted], axis=1
    )
    return state, frames_all, emitted_all
