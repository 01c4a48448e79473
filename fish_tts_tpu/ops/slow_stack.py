"""Pallas weight-streaming slow-stack decode step.

One fused kernel for the 28-layer slow transformer's single-token decode
forward, optionally including the tied LM head.  XLA's GEMV path leaves most
of the HBM bandwidth on the table for M=1 matmuls; here the grid iterates
over (layer, cache-block) — then vocab tiles — and each step's int8 weights
and KV-cache blocks are BlockSpec inputs, so Pallas double-buffers the next
step's data while the current step computes — the textbook weight-streaming
pattern.  The activation is carried across grid steps in a VMEM scratch.

Scope and contracts:
- single token (T=1), small batch (B <= MAX_BATCH): B=1 is the latency
  decode path; B>1 amortizes the weight stream across concurrent streams
  for batched serving (per-stream positions, independent attention);
  prefill keeps the XLA path;
- int8 weights per ``utils/quantize.py`` (per-output-channel scales);
- the KV cache is *read-only*: the kernel consumes per-layer cache slices
  (bounded by the static ``read_len`` bucket) plus the current token's K/V
  as a joint-softmax self-key (same two-part attention as
  ops/attention.gqa_attention_two_part), and returns the new K/V rows for
  the caller's XLA scatter — identical cache-update semantics to
  dual_ar.transformer_stack;
- the cache streams through the grid in ``RB``-row blocks with an ONLINE
  softmax (flash-attention accumulation: running max / denominator /
  weighted sum in VMEM scratch), so VMEM demand is fixed at
  ``B * RB * row`` regardless of context depth — B=8 decode keeps the
  kernel at every kv bucket up to ``max_seq_len`` instead of falling back
  to XLA past R=512 (the pre-blocking Mosaic allocation limit);
- GQA attention is *group-folded*: for each of the G = H/Hkv query-head
  groups, the group's query lanes fold down to kv layout (Hkv segments of
  Dh lanes) and scores come from one ``(RB, kv_size) @ (kv_size, Hkv)``
  segment-mask matmul against the UN-duplicated cache block; the weighted
  sum runs against the un-duplicated V as well.  Round 3's B>1 attempt
  duplicated the cache per query head per stream and lost 10x to the VPU;
  this formulation touches each cache byte once regardless of G;
- RoPE rows for the current position are gathered *outside* (XLA handles the
  dynamic position gather); the kernel sees interleaved cos / signed-sin
  lane tables (ops/fast_decoder.rope_tables layout);
- with ``prepare_head`` applied, grid steps L.. stream the tied LM head
  (reference llama.py:446-451) in HEAD_TILE-row vocab tiles and the kernel
  additionally returns full logits for every stream (padded vocab; caller
  slices).
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

HEAD_TILE = 8192  # vocab rows per head grid step (8 MB int8 tiles)

# Cache rows per grid block.  Empirically calibrated on v5e at S1-mini
# shapes (Hkv*Dh = 512-lane rows): B * RB <= 4096 rows fit (B=8 at RB=512
# compiles; RB=768+ fails Mosaic allocation on the block + f32 temporaries).
RB_ROWS = 512
_MAX_BATCH_ROWS = 4096


def _make_kernel(cfg: DualARConfig, rb_size: int, n_rb: int,
                 with_head: bool, batch: int):
    B = batch
    H = cfg.n_head
    Hkv = cfg.n_local_heads
    Dh = cfg.head_dim
    G = H // Hkv
    L = cfg.n_layer
    eps = cfg.norm_eps
    RB = rb_size
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

    def _fold_group(a, g):
        """(1, q_size) -> (1, kv_size): select the query heads of group ``g``
        (head hq = j*G + g for kv head j) into kv-segment layout."""
        return jnp.concatenate(
            [a[:, (j * G + g) * Dh:(j * G + g + 1) * Dh] for j in range(Hkv)],
            axis=-1,
        )

    def _unfold_groups(parts):
        """G x (1, kv_size) group outputs -> (1, q_size) head-major layout."""
        return jnp.concatenate(
            [parts[hq % G][:, (hq // G) * Dh:(hq // G + 1) * Dh]
             for hq in range(H)],
            axis=-1,
        )

    def kernel(*refs):
        if with_head:
            (pos_ref, x_ref, cos_q_ref, sin_q_ref, cos_k_ref, sin_k_ref,
             seg_ref, seg_t_ref, attn_norm_ref, ffn_norm_ref,
             kcache_ref, vcache_ref,
             wqkv_q, wqkv_s, wo_q, wo_s, w1_q, w1_s, w3_q, w3_s, w2_q, w2_s,
             final_norm_ref, head_q, head_s,
             x_out_ref, new_k_ref, new_v_ref, logits_ref,
             x_scr, q_scr, k_scr, v_scr, m_scr, den_scr, acc_scr) = refs
        else:
            (pos_ref, x_ref, cos_q_ref, sin_q_ref, cos_k_ref, sin_k_ref,
             seg_ref, seg_t_ref, attn_norm_ref, ffn_norm_ref,
             kcache_ref, vcache_ref,
             wqkv_q, wqkv_s, wo_q, wo_s, w1_q, w1_s, w3_q, w3_s, w2_q, w2_s,
             x_out_ref, new_k_ref, new_v_ref,
             x_scr, q_scr, k_scr, v_scr, m_scr, den_scr, acc_scr) = refs

        # FLAT grid: s < L*n_rb are (layer, cache-block) steps; s >= L*n_rb
        # are head vocab tiles.  A 2-D (step, rb) grid would run n_rb
        # iterations per head tile too — each an empty step that still
        # re-fetches an (B, RB)-row cache block (~336 MB of wasted DMA per
        # frame at B=16, R=512).
        s = pl.program_id(0)
        step = s // n_rb
        rb = s % n_rb

        def qdot(xv, wq, ws):
            w = wq[0].astype(jnp.bfloat16)
            out = jnp.dot(xv.astype(jnp.bfloat16), w,
                          preferred_element_type=jnp.float32)
            return out * ws[0]

        @pl.when((step == 0) & (rb == 0))
        def _():
            x_scr[...] = x_ref[...]

        def attn_begin():
            """rb 0 of a layer step: project q/k/v, init the softmax state."""
            x = x_scr[...]  # (B, D)
            h = _rms(x, attn_norm_ref[0])
            qkv = qdot(h, wqkv_q, wqkv_s)  # (B, q+2kv)
            q = _rope(qkv[:, :q_size], cos_q_ref[...], sin_q_ref[...])
            k = _rope(qkv[:, q_size:q_size + kv_size],
                      cos_k_ref[...], sin_k_ref[...])
            v = qkv[:, q_size + kv_size:]
            new_k_ref[...] = k[None]
            new_v_ref[...] = v[None]
            q_scr[...] = q
            k_scr[...] = k
            v_scr[...] = v
            m_scr[...] = jnp.full((B * G, Hkv), _NEG, jnp.float32)
            den_scr[...] = jnp.zeros((B * G, Hkv), jnp.float32)
            acc_scr[...] = jnp.zeros((B * G, kv_size), jnp.float32)

        def attn_block():
            """Every rb: fold this cache block into the online softmax.
            Streams are independent — static loops over batch and GQA
            groups; the cache block is touched ONCE per stream (never
            duplicated per query head)."""
            base = rb * RB
            r_iota = jax.lax.broadcasted_iota(jnp.int32, (RB, Hkv), 0)
            q = q_scr[...]
            for b in range(B):
                pos_b = pos_ref[0, b]
                kc = kcache_ref[0, b]  # (Hkv, RB, Dh)
                vc = vcache_ref[0, b]
                kc_flat = jnp.concatenate(
                    [kc[hh] for hh in range(Hkv)], axis=-1
                ).astype(jnp.float32)  # (RB, kv_size)
                vc_flat = jnp.concatenate(
                    [vc[hh] for hh in range(Hkv)], axis=-1
                ).astype(jnp.float32)
                for g in range(G):
                    row = b * G + g
                    q_g = _fold_group(q[b:b + 1], g)  # (1, kv_size)
                    s = jnp.dot(kc_flat * q_g, seg_ref[...],
                                preferred_element_type=jnp.float32) * scale
                    s = jnp.where(base + r_iota < pos_b, s, _NEG)  # (RB, Hkv)

                    m_old = m_scr[row:row + 1, :]
                    m_new = jnp.maximum(
                        m_old, jnp.max(s, axis=0, keepdims=True))
                    alpha = jnp.exp(m_old - m_new)           # (1, Hkv)
                    p = jnp.exp(s - m_new)                   # (RB, Hkv)
                    den = den_scr[row:row + 1, :] * alpha + jnp.sum(
                        p, axis=0, keepdims=True)
                    alpha_exp = jnp.dot(alpha, seg_t_ref[...],
                                        preferred_element_type=jnp.float32)
                    pc_exp = jnp.dot(p, seg_t_ref[...],
                                     preferred_element_type=jnp.float32)
                    acc = acc_scr[row:row + 1, :] * alpha_exp + jnp.sum(
                        pc_exp * vc_flat, axis=0, keepdims=True)
                    m_scr[row:row + 1, :] = m_new
                    den_scr[row:row + 1, :] = den
                    acc_scr[row:row + 1, :] = acc

        def attn_end_mlp():
            """Last rb: join the current token's self-key into the softmax
            (two-part attention semantics), finish the block (wo + FFN)."""
            x = x_scr[...]
            q = q_scr[...]
            k = k_scr[...]
            v = v_scr[...]
            outs = []
            for b in range(B):
                k_b = k[b:b + 1]
                v_b = v[b:b + 1]
                o_parts = []
                for g in range(G):
                    row = b * G + g
                    q_g = _fold_group(q[b:b + 1], g)
                    s_self = jnp.dot(k_b * q_g, seg_ref[...],
                                     preferred_element_type=jnp.float32)
                    s_self = s_self * scale  # (1, Hkv)
                    m_old = m_scr[row:row + 1, :]
                    m_fin = jnp.maximum(m_old, s_self)
                    alpha = jnp.exp(m_old - m_fin)
                    p_self = jnp.exp(s_self - m_fin)
                    den = den_scr[row:row + 1, :] * alpha + p_self
                    alpha_exp = jnp.dot(alpha, seg_t_ref[...],
                                        preferred_element_type=jnp.float32)
                    ps_exp = jnp.dot(p_self, seg_t_ref[...],
                                     preferred_element_type=jnp.float32)
                    den_exp = jnp.dot(den, seg_t_ref[...],
                                      preferred_element_type=jnp.float32)
                    o_parts.append(
                        (acc_scr[row:row + 1, :] * alpha_exp
                         + ps_exp * v_b) / den_exp)  # (1, kv_size)
                outs.append(_unfold_groups(o_parts))  # (1, q_size)
            o = jnp.concatenate(outs, axis=0) if B > 1 else outs[0]

            x = x + qdot(o, wo_q, wo_s)
            f = _rms(x, ffn_norm_ref[0])
            gate = qdot(f, w1_q, w1_s)
            up = qdot(f, w3_q, w3_s)
            x = x + qdot(gate * jax.lax.logistic(gate) * up, w2_q, w2_s)

            x_scr[...] = x

            @pl.when(step == L - 1)
            def _():
                x_out_ref[...] = x

        def head_body():
            # tied LM head, one vocab tile per grid step
            # (reference llama.py:446-451)
            x = x_scr[...]
            hn = _rms(x, final_norm_ref[...])
            lg = jax.lax.dot_general(
                hn.astype(jnp.bfloat16), head_q[...].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (B, HEAD_TILE)
            logits_ref[...] = lg * head_s[...]

        if with_head:
            layer_phase = s < L * n_rb
            pl.when(layer_phase & (rb == 0))(attn_begin)
            pl.when(layer_phase)(attn_block)
            pl.when(layer_phase & (rb == n_rb - 1))(attn_end_mlp)
            pl.when(jnp.logical_not(layer_phase))(head_body)
        else:
            pl.when(rb == 0)(attn_begin)
            attn_block()
            pl.when(rb == n_rb - 1)(attn_end_mlp)

    return kernel


# Streams per kernel invocation.  Round 3's B>1 variant duplicated the
# cache per query head per stream and measured SLOWER than XLA at B=8
# (483 vs 566); the group-folded attention rewrite touches each cache byte
# once, so batching now only adds the compulsory per-stream cache reads.
# Beyond B=8 the cache block shrinks (see _rb_size) to hold the B*RB VMEM
# bound; B=16 runs at RB=256.
MAX_BATCH = 16


def supports(cfg: DualARConfig, params: Params, batch: int) -> bool:
    from fish_tts_tpu.utils.quantize import is_quantized

    layers = params.get("layers", {})
    return (
        1 <= batch <= MAX_BATCH
        and cfg.n_head % cfg.n_local_heads == 0
        and is_quantized(layers.get("wqkv"))
        and cfg.head_dim % 2 == 0
        and not cfg.attention_qkv_bias
        and not cfg.attention_o_bias
        and not cfg.attention_qk_norm
    )


def _rb_size(read_len: int, batch: int = 1) -> int:
    """Cache rows per grid block: bounded by the calibrated ``B * RB``
    VMEM budget (so larger batches take proportionally smaller blocks) and
    by RB_ROWS; whole-R for shallow contexts.  Power-of-two fractions of
    RB_ROWS, so every 512-multiple kv bucket tiles exactly."""
    cap = RB_ROWS
    while batch * cap > _MAX_BATCH_ROWS and cap > 1:
        cap //= 2
    return read_len if read_len <= cap else cap


def fits(cfg: DualARConfig, batch: int, read_len: int) -> bool:
    """True when the (batch, read_len) kernel variant fits VMEM.

    With the R-blocked online-softmax grid, VMEM demand scales with
    ``B * RB`` (one cache block + its f32 temporaries), not with the full
    context — the calibrated v5e bound is 4096 rows at S1-mini row width
    (Hkv*Dh = 512 lanes).  Deep contexts only add grid steps.  ``read_len``
    must tile into RB blocks exactly (kv buckets are multiples of 512).
    """
    rb = _rb_size(read_len, batch)
    if read_len % rb:
        return False
    row = cfg.n_local_heads * cfg.head_dim
    return batch * rb * row <= _MAX_BATCH_ROWS * 512


def prepare_head(params: Params, cfg: DualARConfig) -> Params:
    """Pad the tied LM head into HEAD_TILE-aligned vocab tiles for the fused
    head phase (``_slow_head`` entry).  One-time cost at engine init; no-op
    when the head cannot be fused (untied head, non-quantized table)."""
    from fish_tts_tpu.utils.quantize import is_quantized

    emb = params.get("embeddings")
    if ("_slow_head" in params or not cfg.tie_word_embeddings
            or not is_quantized(emb)):
        return params
    V, D = emb["q"].shape
    Vp = -(-V // HEAD_TILE) * HEAD_TILE
    q = jnp.zeros((Vp, D), jnp.int8).at[:V].set(emb["q"])
    s = jnp.zeros((1, Vp), jnp.float32).at[0, :V].set(
        emb["s"][:, 0].astype(jnp.float32)
    )
    out = dict(params)
    out["_slow_head"] = {"q": q, "s": s}
    return out


def _segment_masks(cfg: DualARConfig):
    """(kv_size, Hkv) per-kv-head segment mask + transpose: the attention
    reductions run in folded group layout, so the masks are kv-sized (the
    cache is never duplicated out to q_size)."""
    from fish_tts_tpu.ops.kernel_layout import head_segment_masks

    return head_segment_masks(cfg.n_local_heads, cfg.head_dim)


def _rope_rows(cfg: DualARConfig, rope_slow: jnp.ndarray, pos: jnp.ndarray):
    """Interleaved cos / signed-sin lane rows at per-stream positions
    (XLA-side gather; shared layout with the fast-decoder kernel).
    pos: (B,) -> rows (B, q_size) / (B, kv_size)."""
    from fish_tts_tpu.ops.kernel_layout import interleaved_lane_tables

    return interleaved_lane_tables(
        rope_slow[pos], cfg.n_head, cfg.n_local_heads
    )


@functools.partial(jax.jit, static_argnames=("cfg", "read_len", "interpret"))
def slow_stack_step(
    params: Params,
    cfg: DualARConfig,
    rope_slow: jnp.ndarray,   # (S, Dh/2, 2)
    x: jnp.ndarray,           # (B, D) embedded input tokens (f32/bf16)
    kv_cache: Params,         # {"k","v"}: (L, B, Hkv, S, Dh)
    pos: jnp.ndarray,         # (B,) int32 per-stream positions
    *,
    read_len: int,
    interpret: bool = False,
):
    """Fused 1-token slow forward over B independent streams.

    Returns (hidden (B, 1, D) pre-final-norm, new_k (L, B, Hkv, 1, Dh),
    new_v, logits) — logits is (B, V) when the head was prepared via
    :func:`prepare_head`, else None; the caller scatters the new K/V rows
    into the cache at each stream's ``pos``.
    """
    layers = params["layers"]
    L = cfg.n_layer
    Dh = cfg.head_dim
    Hkv = cfg.n_local_heads
    G = cfg.n_head // Hkv
    R = read_len
    B = x.shape[0]
    RB = _rb_size(R, B)
    assert R % RB == 0, (R, RB)
    n_rb = R // RB
    head = params.get("_slow_head")
    with_head = head is not None
    n_tiles = head["q"].shape[0] // HEAD_TILE if with_head else 0

    cos_q, sin_q, cos_k, sin_k = _rope_rows(cfg, rope_slow, pos)
    seg, seg_t = _segment_masks(cfg)
    pos_smem = pos.reshape(1, B).astype(jnp.int32)

    # The kernel reads only rows [0:R) of the cache, RB rows per grid block.
    # The full (L,B,Hkv,S,Dh) arrays are passed and the BlockSpec windows
    # the (layer, block) slice — slicing here instead would force XLA to
    # materialize a fresh copy on every decode step.
    cache_block = (1, B, Hkv, RB, Dh)

    smem_spec = pl.BlockSpec((1, B), memory_space=pltpu.SMEM)
    whole = pl.BlockSpec(memory_space=pltpu.VMEM)

    def layer_idx(s):
        # clamp so head-phase steps keep revisiting the last layer's blocks
        # (revisited blocks are not re-copied)
        l = s // n_rb
        return jnp.minimum(l, L - 1) if with_head else l

    def per_layer(shape):
        block = (1,) + tuple(shape[1:])
        nzero = len(shape) - 1
        return pl.BlockSpec(
            block, lambda s: (layer_idx(s),) + (0,) * nzero,
            memory_space=pltpu.VMEM,
        )

    def cache_rb(s):
        # pin the cache block during head-phase steps so it is never
        # re-fetched after the last layer; pin to n_rb-1 (the block the
        # LAST layer step leaves resident) — pinning to 0 would DMA one
        # fresh K and V block at the layer->head transition every frame
        rb = s % n_rb
        return jnp.where(s < L * n_rb, rb, n_rb - 1) if with_head else rb

    cache_spec = pl.BlockSpec(
        cache_block, lambda s: (layer_idx(s), 0, 0, cache_rb(s), 0),
        memory_space=pltpu.VMEM,
    )

    lw = layers
    in_specs = (
        [smem_spec]
        + [whole] * 7  # x, 4 rope rows, seg, seg_t
        + [per_layer((L, 1, cfg.dim))] * 2  # norms (layer axis kept off the
        #   last-two block dims, which Pallas requires to be full-array)
        + [cache_spec] * 2  # RB-row cache blocks (see above)
        + [
            per_layer(lw["wqkv"]["q"].shape), per_layer(lw["wqkv"]["s"].shape),
            per_layer(lw["wo"]["q"].shape), per_layer(lw["wo"]["s"].shape),
            per_layer(lw["w1"]["q"].shape), per_layer(lw["w1"]["s"].shape),
            per_layer(lw["w3"]["q"].shape), per_layer(lw["w3"]["s"].shape),
            per_layer(lw["w2"]["q"].shape), per_layer(lw["w2"]["s"].shape),
        ]
    )
    out_shape = [
        jax.ShapeDtypeStruct((B, cfg.dim), jnp.float32),
        jax.ShapeDtypeStruct((L, B, Hkv * Dh), jnp.float32),
        jax.ShapeDtypeStruct((L, B, Hkv * Dh), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((B, cfg.dim), lambda s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B, Hkv * Dh), lambda s: (layer_idx(s), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B, Hkv * Dh), lambda s: (layer_idx(s), 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [
        pos_smem,
        x.astype(jnp.float32),
        cos_q, sin_q, cos_k, sin_k, seg, seg_t,
        lw["attention_norm"].astype(jnp.float32)[:, None, :],
        lw["ffn_norm"].astype(jnp.float32)[:, None, :],
        kv_cache["k"], kv_cache["v"],
        lw["wqkv"]["q"], lw["wqkv"]["s"].astype(jnp.float32),
        lw["wo"]["q"], lw["wo"]["s"].astype(jnp.float32),
        lw["w1"]["q"], lw["w1"]["s"].astype(jnp.float32),
        lw["w3"]["q"], lw["w3"]["s"].astype(jnp.float32),
        lw["w2"]["q"], lw["w2"]["s"].astype(jnp.float32),
    ]
    outer = L * n_rb
    if with_head:
        Vp = head["q"].shape[0]
        outer = L * n_rb + n_tiles

        def head_tile(s):
            return jnp.maximum(s - L * n_rb, 0)

        in_specs += [
            whole,  # final norm (1, D)
            pl.BlockSpec((HEAD_TILE, cfg.dim),
                         lambda s: (head_tile(s), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HEAD_TILE),
                         lambda s: (0, head_tile(s)),
                         memory_space=pltpu.VMEM),
        ]
        inputs += [
            params["norm"].astype(jnp.float32)[None, :],
            head["q"], head["s"],
        ]
        out_shape.append(jax.ShapeDtypeStruct((B, Vp), jnp.float32))
        out_specs.append(
            pl.BlockSpec((B, HEAD_TILE),
                         lambda s: (0, head_tile(s)),
                         memory_space=pltpu.VMEM)
        )

    q_size = cfg.n_head * Dh
    kv_size = Hkv * Dh
    kernel = _make_kernel(cfg, RB, n_rb, with_head, B)
    outs = pl.pallas_call(
        kernel,
        grid=(outer,),
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.VMEM((B, cfg.dim), jnp.float32),      # x
            pltpu.VMEM((B, q_size), jnp.float32),       # q
            pltpu.VMEM((B, kv_size), jnp.float32),      # k
            pltpu.VMEM((B, kv_size), jnp.float32),      # v
            pltpu.VMEM((B * G, Hkv), jnp.float32),      # running max
            pltpu.VMEM((B * G, Hkv), jnp.float32),      # running denom
            pltpu.VMEM((B * G, kv_size), jnp.float32),  # running weighted sum
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)

    x_out, new_k, new_v = outs[0], outs[1], outs[2]
    logits = None
    if with_head:
        V = params["embeddings"]["q"].shape[0]
        logits = outs[3][:, :V]
    hidden = x_out[:, None]  # (B, 1, D)
    new_k = new_k.reshape(L, B, Hkv, 1, Dh)
    new_v = new_v.reshape(L, B, Hkv, 1, Dh)
    return hidden, new_k, new_v, logits
