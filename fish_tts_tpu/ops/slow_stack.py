"""Pallas weight-streaming slow-stack decode step.

One fused kernel for the 28-layer slow transformer's single-token decode
forward.  XLA's GEMV path leaves most of the HBM bandwidth on the table for
M=1 matmuls; here the grid iterates over layers and each layer's int8
matmul stack (~15.7 MB at S1-mini shapes) is a BlockSpec input, so Pallas
double-buffers the next layer's weights while the current layer computes —
the textbook weight-streaming pattern.  The activation is carried across
grid steps in a VMEM scratch.

Scope and contracts:
- single token, single stream (B=1, T=1) — the latency decode path; prefill
  and batched serving keep the XLA path (weight streaming amortizes there);
- int8 weights per ``utils/quantize.py`` (per-output-channel scales);
- the KV cache is *read-only*: the kernel consumes per-layer cache slices
  (bounded by the static ``read_len`` bucket) plus the current token's K/V
  as a joint-softmax self-key (same two-part attention as
  ops/attention.gqa_attention_two_part), and returns the new K/V rows for
  the caller's single XLA scatter — identical cache-update semantics to
  dual_ar.transformer_stack;
- GQA is computed in lane layout: the per-layer cache slice is duplicated
  per query head inside VMEM and reduced with segment-mask matmuls, exactly
  like ops/fast_decoder.py;
- RoPE rows for the current position are gathered *outside* (XLA handles the
  dynamic position gather); the kernel sees interleaved cos / signed-sin
  lane tables (ops/fast_decoder.rope_tables layout).
"""

from __future__ import annotations

import functools
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fish_tts_tpu.config import DualARConfig

Params = dict[str, Any]

_NEG = -1e30


def _make_kernel(cfg: DualARConfig, read_len: int):
    D = cfg.dim
    H = cfg.n_head
    Hkv = cfg.n_local_heads
    Dh = cfg.head_dim
    G = H // Hkv
    L = cfg.n_layer
    eps = cfg.norm_eps
    R = read_len
    q_size = H * Dh
    kv_size = Hkv * Dh
    scale = 1.0 / math.sqrt(Dh)

    def _rms(x, w):
        n = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
        return n * w

    def _rope(x, cos_row, sin_row):
        n = x.shape[-1]
        r_next = pltpu.roll(x, n - 1, 1)
        r_prev = pltpu.roll(x, 1, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        swap = jnp.where(lane % 2 == 0, r_next, r_prev)
        return x * cos_row + swap * sin_row

    def _dup_heads(a):
        """(R', kv_size) -> (R', q_size): repeat each kv-head segment G times."""
        return jnp.concatenate(
            [a[:, (hq // G) * Dh:(hq // G + 1) * Dh] for hq in range(H)],
            axis=-1,
        )

    def kernel(
        pos_ref,          # SMEM (1, 1) int32 current position
        x_ref,            # (1, D) f32 embedded input token
        cos_q_ref, sin_q_ref,    # (1, q_size) rope rows at pos
        cos_k_ref, sin_k_ref,    # (1, kv_size)
        seg_ref, seg_t_ref,      # (q_size, H), (H, q_size)
        attn_norm_ref, ffn_norm_ref,            # (1, 1, D) per-layer blocks
        kcache_ref, vcache_ref,  # (1, 1, Hkv, R, Dh) per-layer cache slices
        wqkv_q, wqkv_s, wo_q, wo_s,             # (1, D, .) int8 + (1, 1, .) f32
        w1_q, w1_s, w3_q, w3_s, w2_q, w2_s,
        x_out_ref,        # (1, D) f32 final hidden (pre-final-norm)
        new_k_ref,        # (1, 1, kv_size) f32 this layer's K row
        new_v_ref,        # (1, 1, kv_size) f32
        x_scr,            # VMEM (1, D) f32 carried activation
    ):
        layer_is_first = pl.program_id(0) == 0
        pos = pos_ref[0, 0]

        @pl.when(layer_is_first)
        def _():
            x_scr[...] = x_ref[...]

        x = x_scr[...]

        def qdot(xv, wq, ws):
            w = wq[0].astype(jnp.bfloat16)
            out = jnp.dot(xv.astype(jnp.bfloat16), w,
                          preferred_element_type=jnp.float32)
            return out * ws[0]

        h = _rms(x, attn_norm_ref[0])
        qkv = qdot(h, wqkv_q, wqkv_s)  # (1, q+2kv)
        q = _rope(qkv[:, :q_size], cos_q_ref[...], sin_q_ref[...])
        k = _rope(qkv[:, q_size:q_size + kv_size], cos_k_ref[...], sin_k_ref[...])
        v = qkv[:, q_size + kv_size:]
        new_k_ref[...] = k[None]
        new_v_ref[...] = v[None]

        # cache attention (read-only past, mask rows >= pos) + self-key,
        # one joint softmax (ops/attention.gqa_attention_two_part semantics)
        kc = kcache_ref[0, 0]  # (Hkv, R, Dh)
        vc = vcache_ref[0, 0]
        kc_flat = jnp.concatenate([kc[hh] for hh in range(Hkv)], axis=-1)
        vc_flat = jnp.concatenate([vc[hh] for hh in range(Hkv)], axis=-1)
        kc_rep = _dup_heads(kc_flat.astype(jnp.float32))  # (R, q_size)
        vc_rep = _dup_heads(vc_flat.astype(jnp.float32))
        k_rep = _dup_heads(k)[0:1]  # (1, q_size)
        v_rep = _dup_heads(v)[0:1]

        s_cache = jnp.dot(kc_rep * q, seg_ref[...],
                          preferred_element_type=jnp.float32) * scale  # (R, H)
        r_iota = jax.lax.broadcasted_iota(jnp.int32, (R, H), 0)
        s_cache = jnp.where(r_iota < pos, s_cache, _NEG)
        s_self = jnp.dot(k_rep * q, seg_ref[...],
                         preferred_element_type=jnp.float32) * scale  # (1, H)

        m = jnp.maximum(jnp.max(s_cache, axis=0, keepdims=True), s_self)
        p_cache = jnp.exp(s_cache - m)          # (R, H)
        p_self = jnp.exp(s_self - m)            # (1, H)
        denom = jnp.sum(p_cache, axis=0, keepdims=True) + p_self  # (1, H)

        pc_exp = jnp.dot(p_cache, seg_t_ref[...],
                         preferred_element_type=jnp.float32)  # (R, q_size)
        ps_exp = jnp.dot(p_self, seg_t_ref[...],
                         preferred_element_type=jnp.float32)  # (1, q_size)
        den_exp = jnp.dot(denom, seg_t_ref[...],
                          preferred_element_type=jnp.float32)
        o = (jnp.sum(pc_exp * vc_rep, axis=0, keepdims=True)
             + ps_exp * v_rep) / den_exp  # (1, q_size)

        x = x + qdot(o, wo_q, wo_s)
        f = _rms(x, ffn_norm_ref[0])
        gate = qdot(f, w1_q, w1_s)
        up = qdot(f, w3_q, w3_s)
        x = x + qdot(gate * jax.lax.logistic(gate) * up, w2_q, w2_s)

        x_scr[...] = x

        @pl.when(pl.program_id(0) == L - 1)
        def _():
            x_out_ref[...] = x

    return kernel


def supports(cfg: DualARConfig, params: Params, batch: int) -> bool:
    from fish_tts_tpu.utils.quantize import is_quantized

    layers = params.get("layers", {})
    return (
        batch == 1
        and is_quantized(layers.get("wqkv"))
        and cfg.head_dim % 2 == 0
        and not cfg.attention_qkv_bias
        and not cfg.attention_o_bias
        and not cfg.attention_qk_norm
    )


def _segment_masks(cfg: DualARConfig):
    H, Dh = cfg.n_head, cfg.head_dim
    seg = np.kron(np.eye(H, dtype=np.float32), np.ones((Dh, 1), np.float32))
    return jnp.asarray(seg), jnp.asarray(seg.T)


def _rope_rows(cfg: DualARConfig, rope_slow: jnp.ndarray, pos: jnp.ndarray):
    """Interleaved cos / signed-sin lane rows at ``pos`` (XLA-side gather)."""
    Dh = cfg.head_dim
    row = rope_slow[pos].astype(jnp.float32)  # (Dh/2, 2)
    cs, sn = row[:, 0], row[:, 1]
    cos_i = jnp.repeat(cs, 2)[None]  # (1, Dh)
    sin_i = jnp.stack([-sn, sn], axis=-1).reshape(1, Dh)
    cos_q = jnp.tile(cos_i, (1, cfg.n_head))
    sin_q = jnp.tile(sin_i, (1, cfg.n_head))
    cos_k = jnp.tile(cos_i, (1, cfg.n_local_heads))
    sin_k = jnp.tile(sin_i, (1, cfg.n_local_heads))
    return cos_q, sin_q, cos_k, sin_k


@functools.partial(jax.jit, static_argnames=("cfg", "read_len", "interpret"))
def slow_stack_step(
    params: Params,
    cfg: DualARConfig,
    rope_slow: jnp.ndarray,   # (S, Dh/2, 2)
    x: jnp.ndarray,           # (1, D) embedded input token (f32/bf16)
    kv_cache: Params,         # {"k","v"}: (L, 1, Hkv, S, Dh)
    pos: jnp.ndarray,         # (1,) int32 current position
    *,
    read_len: int,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused 1-token slow forward.

    Returns (hidden (1, 1, D) pre-final-norm, new_k (L, 1, Hkv, 1, Dh),
    new_v) — the caller scatters new rows into the cache at ``pos``.
    """
    layers = params["layers"]
    L = cfg.n_layer
    Dh = cfg.head_dim
    Hkv = cfg.n_local_heads
    R = read_len

    cos_q, sin_q, cos_k, sin_k = _rope_rows(cfg, rope_slow, pos[0])
    seg, seg_t = _segment_masks(cfg)
    pos_smem = pos.reshape(1, 1).astype(jnp.int32)

    k_read = kv_cache["k"][:, :, :, :R]  # (L, 1, Hkv, R, Dh)
    v_read = kv_cache["v"][:, :, :, :R]

    smem_spec = pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)
    whole = pl.BlockSpec(memory_space=pltpu.VMEM)

    def per_layer(shape):
        block = (1,) + shape[1:]
        return pl.BlockSpec(block, lambda l: (l,) + (0,) * (len(shape) - 1),
                            memory_space=pltpu.VMEM)

    lw = layers
    in_specs = (
        [smem_spec]
        + [whole] * 7  # x, 4 rope rows, seg, seg_t
        + [per_layer((L, 1, cfg.dim))] * 2  # norms (layer axis kept off the
        #   last-two block dims, which Pallas requires to be full-array)
        + [per_layer(k_read.shape)] * 2  # cache slices
        + [
            per_layer(lw["wqkv"]["q"].shape), per_layer(lw["wqkv"]["s"].shape),
            per_layer(lw["wo"]["q"].shape), per_layer(lw["wo"]["s"].shape),
            per_layer(lw["w1"]["q"].shape), per_layer(lw["w1"]["s"].shape),
            per_layer(lw["w3"]["q"].shape), per_layer(lw["w3"]["s"].shape),
            per_layer(lw["w2"]["q"].shape), per_layer(lw["w2"]["s"].shape),
        ]
    )

    kernel = _make_kernel(cfg, R)
    x_out, new_k, new_v = pl.pallas_call(
        kernel,
        grid=(L,),
        out_shape=(
            jax.ShapeDtypeStruct((1, cfg.dim), jnp.float32),
            jax.ShapeDtypeStruct((L, 1, Hkv * Dh), jnp.float32),
            jax.ShapeDtypeStruct((L, 1, Hkv * Dh), jnp.float32),
        ),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, cfg.dim), lambda l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hkv * Dh), lambda l: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hkv * Dh), lambda l: (l, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((1, cfg.dim), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        pos_smem,
        x.astype(jnp.float32),
        cos_q, sin_q, cos_k, sin_k, seg, seg_t,
        lw["attention_norm"].astype(jnp.float32)[:, None, :],
        lw["ffn_norm"].astype(jnp.float32)[:, None, :],
        k_read, v_read,
        lw["wqkv"]["q"], lw["wqkv"]["s"].astype(jnp.float32),
        lw["wo"]["q"], lw["wo"]["s"].astype(jnp.float32),
        lw["w1"]["q"], lw["w1"]["s"].astype(jnp.float32),
        lw["w3"]["q"], lw["w3"]["s"].astype(jnp.float32),
        lw["w2"]["q"], lw["w2"]["s"].astype(jnp.float32),
    )
    hidden = x_out[None]  # (1, 1, D)
    new_k = new_k.reshape(L, 1, Hkv, 1, Dh)
    new_v = new_v.reshape(L, 1, Hkv, 1, Dh)
    return hidden, new_k, new_v
