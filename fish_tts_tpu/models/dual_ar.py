"""DualAR text-to-semantic transformer, TPU-native.

Functional re-design of the reference ``DualARTransformer``
(/root/reference/fish_tts/models/llama.py:334-591).  Same math, different
machine model:

- Parameters are a plain pytree of ``jnp`` arrays.  Per-layer weights are
  *stacked* along a leading layer axis so the layer loop is a ``lax.scan``
  (one traced layer body instead of 28 unrolled ones — smaller HLO, faster
  compiles, and XLA pipelines the weight streaming from HBM).
- Linear weights are stored ``(in, out)`` so ``x @ w`` hits the MXU directly
  (checkpoint conversion transposes from torch's ``(out, in)``).
- KV caches are static-shape arrays threaded functionally; the fast
  (codebook) transformer's cache lives only inside the decode step, which
  reproduces the reference's per-frame cache zeroing (inference.py:116-119)
  for free.
- The causal mask is computed from position indices, not a precomputed
  ``(S, S)`` buffer (reference llama.py:366-370).

Numerics contract kept from the reference:
- summed codebook embeddings masked to semantic positions (llama.py:410-423),
- optional ``1/sqrt(K+1)`` scaling (llama.py:425-429),
- RMSNorm in fp32 (llama.py:164-177), RoPE bf16 table applied in fp32
  (llama.py:594-618),
- tied or untied LM head (llama.py:448-451),
- fast transformer: ``fast_project_in`` bridge, per-codebook RoPE table of
  length ``num_codebooks`` (llama.py:537-541), logits over ``codebook_size``
  with residual books sampled from the first ``residual_codebook_size``
  entries downstream (inference.py:134).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from fish_tts_tpu.config import DualARConfig
from fish_tts_tpu.ops.attention import gqa_attention, gqa_attention_two_part
from fish_tts_tpu.utils.quantize import qgather, qhead, qmm
from fish_tts_tpu.ops.norms import rms_norm
from fish_tts_tpu.ops.rope import apply_rotary_emb, precompute_freqs_cis

Params = dict[str, Any]


@dataclass(frozen=True)
class TokenIds:
    """Static special-token ids the model math depends on (from the tokenizer:
    reference llama.py:346, 418-423; inference.py:123, 182)."""

    semantic_begin: int
    semantic_end: int
    im_end: int


# ---------------------------------------------------------------------------
# Parameter initialization
# ---------------------------------------------------------------------------


def _init_linear(key, d_in, d_out, std, dtype, bias=False):
    w = jax.random.normal(key, (d_in, d_out), jnp.float32) * std
    p = {"w": w.astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def _init_block_stack(key, cfg: DualARConfig, n_layers: int, dtype) -> Params:
    """Stacked transformer-block params with leading layer axis."""
    std = 0.02
    keys = jax.random.split(key, 6)
    qkv_out = (cfg.n_head + 2 * cfg.n_local_heads) * cfg.head_dim

    def stack(k, d_in, d_out):
        ws = jax.random.normal(k, (n_layers, d_in, d_out), jnp.float32) * std
        return ws.astype(dtype)

    p: Params = {
        "wqkv": stack(keys[0], cfg.dim, qkv_out),
        "wo": stack(keys[1], cfg.n_head * cfg.head_dim, cfg.dim),
        "w1": stack(keys[2], cfg.dim, cfg.intermediate_size),
        "w3": stack(keys[3], cfg.dim, cfg.intermediate_size),
        "w2": stack(keys[4], cfg.intermediate_size, cfg.dim),
        "attention_norm": jnp.ones((n_layers, cfg.dim), dtype),
        "ffn_norm": jnp.ones((n_layers, cfg.dim), dtype),
    }
    if cfg.attention_qkv_bias:
        p["wqkv_b"] = jnp.zeros((n_layers, qkv_out), dtype)
    if cfg.attention_o_bias:
        p["wo_b"] = jnp.zeros((n_layers, cfg.dim), dtype)
    if cfg.attention_qk_norm:
        p["q_norm"] = jnp.ones((n_layers, cfg.head_dim), dtype)
        p["k_norm"] = jnp.ones((n_layers, cfg.head_dim), dtype)
    return p


def init_params(key, cfg: DualARConfig, dtype=jnp.bfloat16) -> Params:
    """Random-init a full DualAR parameter pytree (shapes per reference
    llama.py:334-542)."""
    ks = jax.random.split(key, 8)
    std = 0.02
    params: Params = {
        "embeddings": (
            jax.random.normal(ks[0], (cfg.vocab_size, cfg.dim), jnp.float32) * std
        ).astype(dtype),
        "codebook_embeddings": (
            jax.random.normal(
                ks[1], (cfg.codebook_size * cfg.num_codebooks, cfg.dim), jnp.float32
            )
            * std
        ).astype(dtype),
        "layers": _init_block_stack(ks[2], cfg, cfg.n_layer, dtype),
        "norm": jnp.ones((cfg.dim,), dtype),
        "fast_embeddings": (
            jax.random.normal(ks[3], (cfg.codebook_size, cfg.fast_dim), jnp.float32)
            * std
        ).astype(dtype),
        "fast_layers": _init_block_stack(ks[4], cfg.fast_config, cfg.n_fast_layer, dtype),
        "fast_norm": jnp.ones((cfg.fast_dim,), dtype),
        "fast_output": _init_linear(ks[5], cfg.fast_dim, cfg.codebook_size, std, dtype)["w"],
    }
    if not cfg.tie_word_embeddings:
        params["output"] = _init_linear(ks[6], cfg.dim, cfg.vocab_size, std, dtype)["w"]
    if cfg.fast_dim != cfg.dim:
        params["fast_project_in"] = _init_linear(
            ks[7], cfg.dim, cfg.fast_dim, std, dtype, bias=True
        )
    return params


def make_rope_tables(cfg: DualARConfig) -> Params:
    """RoPE tables (bf16, reference llama.py:361-365, 537-541)."""
    return {
        "slow": precompute_freqs_cis(cfg.max_seq_len, cfg.head_dim, cfg.rope_base),
        "fast": precompute_freqs_cis(
            cfg.num_codebooks, cfg.fast_head_dim, cfg.rope_base
        ),
    }


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------


def init_kv_cache(
    cfg: DualARConfig, batch: int, max_seq_len: int | None = None, dtype=jnp.bfloat16
) -> Params:
    """Slow-transformer KV cache: (L, B, Hkv, S, Dh) zeros."""
    s = max_seq_len or cfg.max_seq_len
    shape = (cfg.n_layer, batch, cfg.n_local_heads, s, cfg.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def _fast_cache(cfg: DualARConfig, batch: int, dtype) -> Params:
    shape = (
        cfg.n_fast_layer,
        batch,
        cfg.fast_n_local_heads,
        cfg.num_codebooks,
        cfg.fast_head_dim,
    )
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


# ---------------------------------------------------------------------------
# Transformer stack (shared by slow and fast)
# ---------------------------------------------------------------------------


def _attn_qkv(lp: Params, h: jnp.ndarray, cfg: DualARConfig, freqs: jnp.ndarray):
    """Project + split + (qk-norm) + rope.  h: (B, T, D) -> q/k/v (B, H, T, Dh)."""
    B, T, _ = h.shape
    qkv = qmm(h, lp["wqkv"])
    if "wqkv_b" in lp:
        qkv = qkv + lp["wqkv_b"]
    q_size = cfg.n_head * cfg.head_dim
    kv_size = cfg.n_local_heads * cfg.head_dim
    q, k, v = jnp.split(qkv, [q_size, q_size + kv_size], axis=-1)
    q = q.reshape(B, T, cfg.n_head, cfg.head_dim)
    k = k.reshape(B, T, cfg.n_local_heads, cfg.head_dim)
    v = v.reshape(B, T, cfg.n_local_heads, cfg.head_dim)
    if "q_norm" in lp:
        q = rms_norm(q, lp["q_norm"], cfg.norm_eps)
        k = rms_norm(k, lp["k_norm"], cfg.norm_eps)
    q = apply_rotary_emb(q, freqs)
    k = apply_rotary_emb(k, freqs)
    # -> (B, H, T, Dh)
    return (
        jnp.swapaxes(q, 1, 2),
        jnp.swapaxes(k, 1, 2),
        jnp.swapaxes(v, 1, 2),
    )


def _block_body(
    lp: Params,
    x: jnp.ndarray,
    cfg: DualARConfig,
    freqs: jnp.ndarray,
    block_bias: jnp.ndarray,
    k_cache: jnp.ndarray | None,
    v_cache: jnp.ndarray | None,
    cache_bias: jnp.ndarray | None,
):
    """One pre-norm transformer block (reference llama.py:312-331).

    Cached attention is split into two key sets so the cache is *read-only*
    here (the caller scatters the new rows in afterwards — avoiding a full
    cache copy through the layer scan's stacked outputs every step):

    - the cache (B, Hkv, S, Dh) under ``cache_bias`` (must mask positions not
      yet written, i.e. ``k_pos < write offset``, strictly),
    - the current block's own K/V (B, Hkv, T, Dh) under ``block_bias``
      (causal within the block).

    Softmax runs jointly over both key sets (exact attention).
    Returns (x, new_k (B, Hkv, T, Dh), new_v).
    """
    h = rms_norm(x, lp["attention_norm"], cfg.norm_eps)
    q, k, v = _attn_qkv(lp, h, cfg, freqs)

    if k_cache is not None:
        attn = gqa_attention_two_part(
            q, k_cache, v_cache, cache_bias, k, v, block_bias
        )
    else:
        attn = gqa_attention(q, k, v, block_bias)

    B, H, T, Dh = attn.shape
    attn = jnp.swapaxes(attn, 1, 2).reshape(B, T, H * Dh)
    o = qmm(attn, lp["wo"])
    if "wo_b" in lp:
        o = o + lp["wo_b"]
    x = x + o
    f = rms_norm(x, lp["ffn_norm"], cfg.norm_eps)
    x = x + qmm(jax.nn.silu(qmm(f, lp["w1"])) * qmm(f, lp["w3"]), lp["w2"])
    return x, k, v


def transformer_stack(
    stack_params: Params,
    x: jnp.ndarray,
    cfg: DualARConfig,
    freqs: jnp.ndarray,
    bias: jnp.ndarray,
    kv_cache: Params | None,
    positions: jnp.ndarray | None,
    cache_bias: jnp.ndarray | None = None,
    unroll: int = 1,
    read_len: int | None = None,
):
    """Run all layers via ``lax.scan`` over the stacked layer axis.

    With a cache: the scan reads cache slices per layer and emits only the
    new (B, Hkv, T, Dh) rows; a single scatter after the scan writes all
    layers' rows into the (donated) cache in place.  This keeps per-step HBM
    traffic at [read cache] + [write T rows] instead of [read + rewrite the
    entire cache] (235 MB/frame at S1-mini shapes).

    ``read_len`` (static) further bounds the attention *reads*: only cache
    positions ``< read_len`` can hold live keys, so the layer scan streams a
    ``(B, Hkv, read_len, Dh)`` slice instead of the full ``max_seq_len``
    buffer.  ``read_len=0`` skips cached attention entirely (fresh prefill).
    The caller guarantees every valid position is ``< read_len``;
    ``cache_bias`` must have key width ``read_len``.  Writes always target
    the full cache.

    Returns (x, new_kv_cache).
    """
    if kv_cache is None:

        def body(carry, lp):
            y, _, _ = _block_body(lp, carry, cfg, freqs, bias, None, None, None)
            return y, None

        x, _ = jax.lax.scan(body, x, stack_params, unroll=unroll)
        return x, None

    if read_len == 0:
        # No live cache rows: pure in-block attention, then scatter the new
        # rows (prefill of a fresh sequence — skips max_seq_len-wide reads).
        def body(carry, lp):
            y, new_k, new_v = _block_body(
                lp, carry, cfg, freqs, bias, None, None, None
            )
            return y, (new_k, new_v)

        x, (new_ks, new_vs) = jax.lax.scan(
            body, x, stack_params, unroll=unroll
        )
    else:
        k_read = kv_cache["k"]
        v_read = kv_cache["v"]
        if read_len is not None:
            k_read = k_read[:, :, :, :read_len]
            v_read = v_read[:, :, :, :read_len]

        def body(carry, inputs):
            lp, kc, vc = inputs
            y, new_k, new_v = _block_body(
                lp, carry, cfg, freqs, bias, kc, vc, cache_bias
            )
            return y, (new_k, new_v)

        x, (new_ks, new_vs) = jax.lax.scan(
            body, x, (stack_params, k_read, v_read), unroll=unroll
        )
    # new_ks: (L, B, Hkv, T, Dh) -> scatter into (L, B, Hkv, S, Dh) at
    # positions (B, T).  Advanced indices (b, positions) with slices between
    # move to the front: target view (B, T, L, Hkv, Dh).
    B = x.shape[0]
    b_idx = jnp.arange(B)[:, None]
    rows_k = jnp.transpose(new_ks, (1, 3, 0, 2, 4))  # (B, T, L, Hkv, Dh)
    rows_v = jnp.transpose(new_vs, (1, 3, 0, 2, 4))
    k_out = kv_cache["k"].at[:, b_idx, :, positions].set(rows_k)
    v_out = kv_cache["v"].at[:, b_idx, :, positions].set(rows_v)
    return x, {"k": k_out, "v": v_out}


# ---------------------------------------------------------------------------
# Slow ("base") transformer forward
# ---------------------------------------------------------------------------


def embed_inputs(
    params: Params, cfg: DualARConfig, ids: TokenIds, inp: jnp.ndarray
) -> jnp.ndarray:
    """Token + summed codebook embeddings (reference llama.py:409-429).

    ``inp``: (B, 1+K, T) int32.  Row 0 is the token id; rows 1..K are codebook
    values added (with per-codebook offsets) only where row 0 is a semantic
    token.
    """
    tokens = inp[:, 0]  # (B, T)
    dtype = params["norm"].dtype
    token_emb = qgather(params["embeddings"], tokens, dtype)

    offsets = (jnp.arange(cfg.num_codebooks) * cfg.codebook_size)[None, :, None]
    cb_ids = inp[:, 1:] + offsets  # (B, K, T)
    cb_emb = qgather(params["codebook_embeddings"], cb_ids, dtype)  # (B, K, T, D)
    vq_sum = cb_emb.sum(axis=1)  # (B, T, D)

    vq_mask = (tokens >= ids.semantic_begin) & (tokens <= ids.semantic_end)
    x = token_emb + jnp.where(vq_mask[..., None], vq_sum, 0)
    if cfg.scale_codebook_embeddings:
        x = jnp.where(
            vq_mask[..., None], x / np.sqrt(cfg.num_codebooks + 1), x
        )
    return x.astype(dtype)


def slow_forward(
    params: Params,
    cfg: DualARConfig,
    ids: TokenIds,
    rope: Params,
    inp: jnp.ndarray,  # (B, 1+K, T)
    positions: jnp.ndarray,  # (B, T) absolute positions
    kv_cache: Params,
    cache_bias: jnp.ndarray,  # (B, 1, T, read_len|S): mask unwritten slots
    block_bias: jnp.ndarray,  # (B|1, 1, T, T): causal within this block
    read_len: int | None = None,  # static bound on live cache positions
):
    """Slow-transformer forward writing into the KV cache.

    Returns (hidden (B, T, D), new_kv_cache).  Callers pick the position they
    need logits at and call :func:`lm_logits` — the reference's
    last-position-only slicing (llama.py:443-444) happens there.
    """
    x = embed_inputs(params, cfg, ids, inp)
    freqs = rope["slow"][positions]  # (B, T, D/2, 2)
    x, kv_cache = transformer_stack(
        params["layers"], x, cfg, freqs, block_bias, kv_cache, positions,
        cache_bias=cache_bias, read_len=read_len,
    )
    return x, kv_cache


def lm_logits(params: Params, cfg: DualARConfig, hidden: jnp.ndarray) -> jnp.ndarray:
    """Final norm + (tied) LM head (reference llama.py:446-451).

    The tied head contracts against the embedding table's last axis directly
    (einsum, not ``@ emb.T``) so XLA never materializes a transposed copy of
    the 150k x 1k table.
    """
    h = rms_norm(hidden, params["norm"], cfg.norm_eps)
    if cfg.tie_word_embeddings:
        return qhead(h, params["embeddings"])
    return qmm(h, params["output"])


def project_fast_in(params: Params, hidden: jnp.ndarray) -> jnp.ndarray:
    """Dim bridge into the fast transformer (reference llama.py:510-513, 590).
    Applied to the *pre-final-norm* hidden state, as in the reference (the
    hidden returned by forward_generate is un-normed, llama.py:453)."""
    if "fast_project_in" in params:
        p = params["fast_project_in"]
        return hidden @ p["w"] + p["b"]
    return hidden


# ---------------------------------------------------------------------------
# Fast (codebook) transformer forward
# ---------------------------------------------------------------------------


def fast_step(
    params: Params,
    cfg: DualARConfig,
    rope: Params,
    x: jnp.ndarray,  # (B, 1, Df) input embedding for this codebook position
    pos: jnp.ndarray,  # scalar int32 codebook position
    fast_cache: Params,
):
    """One fast-transformer step at codebook position ``pos``
    (reference llama.py:561-580).  Returns (codebook_logits (B, 1, C), cache).

    The tiny layer stack is fully unrolled — at 1-token shapes the scan
    bookkeeping costs more than the layers themselves.
    """
    fcfg = cfg.fast_config
    B = x.shape[0]
    freqs = jax.lax.dynamic_slice_in_dim(rope["fast"], pos, 1, axis=0)  # (1, d/2, 2)
    # cache holds positions < pos; the current position is the block's self-key
    k_pos = jnp.arange(cfg.num_codebooks)
    cache_bias = jnp.where(k_pos < pos, 0.0, float(np.finfo(np.float32).min))
    cache_bias = jnp.broadcast_to(
        cache_bias[None, None, None, :].astype(jnp.float32),
        (B, 1, 1, cfg.num_codebooks),
    )
    block_bias = jnp.zeros((1, 1, 1, 1), jnp.float32)
    positions = jnp.full((B, 1), pos, jnp.int32)
    x, fast_cache = transformer_stack(
        params["fast_layers"], x, fcfg, freqs, block_bias, fast_cache, positions,
        cache_bias=cache_bias, unroll=cfg.n_fast_layer,
    )
    h = rms_norm(x, params["fast_norm"], cfg.norm_eps)
    logits = qmm(h, params["fast_output"])
    return logits, fast_cache


def new_fast_cache(params: Params, cfg: DualARConfig, batch: int) -> Params:
    """Fresh per-frame fast KV cache (replaces the reference's in-place zeroing
    at inference.py:116-119)."""
    return _fast_cache(cfg, batch, params["norm"].dtype)


# ---------------------------------------------------------------------------
# Parameter utilities
# ---------------------------------------------------------------------------


def param_count(params: Params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def cast_params(params: Params, dtype) -> Params:
    """Cast float leaves to ``dtype``, leaving already-quantized weights
    (``{"q": int8, "s": f32 scale}``, utils/quantize.py) untouched: the
    scales are deliberately float32 — rounding them to bf16 silently
    degrades every int8 matmul downstream."""
    from fish_tts_tpu.utils.quantize import is_quantized

    def walk(p):
        if is_quantized(p):
            return p
        if isinstance(p, dict):
            return {k: walk(v) for k, v in p.items()}
        if isinstance(p, (list, tuple)):
            return type(p)(walk(v) for v in p)
        if jnp.issubdtype(p.dtype, jnp.floating):
            return p.astype(dtype)
        return p

    return {k: walk(v) for k, v in params.items()}
