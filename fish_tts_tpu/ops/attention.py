"""Attention ops for the DualAR LM and vocoder transformers.

TPU-first design notes:

- GQA is computed by folding query heads into groups over the KV heads
  (``(B, Hkv, G, S, D)`` einsum) instead of ``repeat_interleave``-ing K/V as
  the reference does (llama.py:258-259) — no materialized KV copies, and the
  contraction maps straight onto the MXU.
- Softmax runs in fp32 regardless of activation dtype.
- Masks are additive ``0 / -inf`` biases built from position indices, never
  gathered from a precomputed ``(S, S)`` boolean buffer — XLA folds the
  comparisons into the fused attention loop and there is no O(S^2) table in
  HBM (the reference keeps a causal_mask buffer, llama.py:366-370).
- Decode-step attention reads the KV cache at full static length and masks
  positions ``> cur_pos``; static shapes mean one compilation per bucket.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def causal_bias(q_pos: jnp.ndarray, k_pos: jnp.ndarray) -> jnp.ndarray:
    """Additive bias (1, 1, Tq, Tk): 0 where k_pos <= q_pos else -inf."""
    allowed = k_pos[None, :] <= q_pos[:, None]
    return jnp.where(allowed, 0.0, _NEG_INF)[None, None].astype(jnp.float32)


def window_causal_bias(q_pos: jnp.ndarray, k_pos: jnp.ndarray, window: int) -> jnp.ndarray:
    """Sliding-window causal bias: attend to ``q_pos-window+1 .. q_pos``
    (vocoder WindowLimitedTransformer mask, reference vocoder.py:325-332)."""
    diff = q_pos[:, None] - k_pos[None, :]
    allowed = (diff >= 0) & (diff < window)
    return jnp.where(allowed, 0.0, _NEG_INF)[None, None].astype(jnp.float32)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Dense (non-grouped-aware entry point). q/k/v: (B, H, T, D)."""
    if q.shape[1] == k.shape[1]:
        scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        if bias is not None:
            scores = scores + bias
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    return gqa_attention(q, k, v, bias)


def gqa_attention_two_part(
    q: jnp.ndarray,  # (B, Hq, Tq, D)
    k_cache: jnp.ndarray,  # (B, Hkv, S, D) — read-only past
    v_cache: jnp.ndarray,
    cache_bias: jnp.ndarray,  # (B, 1, Tq, S), must mask unwritten slots
    k_new: jnp.ndarray,  # (B, Hkv, Tq, D) — current block's keys
    v_new: jnp.ndarray,
    block_bias: jnp.ndarray,  # (B|1, 1, Tq, Tq) causal within the block
) -> jnp.ndarray:
    """Exact attention over [cache ++ current block] without writing the new
    rows into the cache first.  One softmax over the concatenated key axis.

    This is the decode/prefill hot path: the KV cache stays read-only inside
    the layer scan (see dual_ar.transformer_stack), so XLA never has to
    round-trip the whole cache through the scan's stacked outputs.
    """
    B, Hq, Tq, D = q.shape
    Hkv = k_cache.shape[1]
    G = Hq // Hkv
    qg = q.reshape(B, Hkv, G, Tq, D)
    scale = 1.0 / jnp.sqrt(jnp.asarray(D, jnp.float32))

    s_cache = jnp.einsum(
        "bhgqd,bhkd->bhgqk", qg, k_cache, preferred_element_type=jnp.float32
    ) * scale + cache_bias[:, :, None]
    s_new = jnp.einsum(
        "bhgqd,bhkd->bhgqk", qg, k_new, preferred_element_type=jnp.float32
    ) * scale + block_bias[:, :, None]

    scores = jnp.concatenate([s_cache, s_new], axis=-1)
    probs = jax.nn.softmax(scores, axis=-1)
    p_cache = probs[..., : k_cache.shape[2]].astype(v_cache.dtype)
    p_new = probs[..., k_cache.shape[2] :].astype(v_new.dtype)
    out = jnp.einsum("bhgqk,bhkd->bhgqd", p_cache, v_cache)
    out = out + jnp.einsum("bhgqk,bhkd->bhgqd", p_new, v_new)
    return out.reshape(B, Hq, Tq, D)


def gqa_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """GQA attention without KV repetition. q: (B,Hq,Tq,D); k/v: (B,Hkv,Tk,D);
    bias broadcastable to (1|B, 1, Tq, Tk)."""
    B, Hq, Tq, D = q.shape
    Hkv = k.shape[1]
    G = Hq // Hkv
    qg = q.reshape(B, Hkv, G, Tq, D)
    scale = 1.0 / jnp.sqrt(jnp.asarray(D, jnp.float32))
    scores = jnp.einsum(
        "bhgqd,bhkd->bhgqk", qg, k, preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        scores = scores + bias[:, :, None]  # (B,1,1,Tq,Tk) broadcast over (Hkv,G)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhgqk,bhkd->bhgqd", probs, v)
    return out.reshape(B, Hq, Tq, D)
