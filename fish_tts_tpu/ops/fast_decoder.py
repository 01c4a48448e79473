"""Pallas fused fast-codebook decoder.

The DualAR fast transformer runs ``num_codebooks`` sequential 1-token steps
per frame (reference decode_one_token_ar, inference.py:116-149).  Under XLA
each step re-streams the whole fast stack from HBM — at S1-mini shapes that
is ~63M int8 params x 10 steps = 630 MB per frame, the single largest HBM
consumer of decode.  This kernel runs the *entire* per-frame codebook loop in
one ``pallas_call`` with the int8 weights resident in VMEM (~65 MB of a v5e
core's 128 MiB), so the stack is loaded from HBM once per frame:

  pos 0:   consume the slow hidden state, write KV, discard the output
           (inference.py:121-122),
  pos cb (1..K-1): embed previous code -> n_fast_layer transformer layers
           (KV cache in VMEM scratch, causal over codebook positions) ->
           fast_norm -> residual-book head -> repetition penalty -> exact
           top-p -> Gumbel-max sample -> next embedding.

Batched serving: the kernel handles B <= MAX_BATCH independent streams on
the sublane axis.  The matmuls batch for free ((B, D) rows through the same
VMEM-resident weights — the whole point: one weight load serves every
stream).  The codebook loop is statically unrolled (K is a config
constant), so each layer's KV "cache" is a Python list of per-position
(B, q_size) arrays and every attention op batches all streams — no
per-stream loops anywhere (an earlier loop-carried variant issued B*L
tiny-vector chains per step, which dominated the batched kernel's
latency).  Per-stream sampling parameters ride in as (B, 1) columns.

Mosaic-friendly layout choices (the TPU vector unit hates reshapes that
split the 128-lane axis):

- activations stay ``(B, heads*head_dim)`` end-to-end; q/k/v are lane
  *slices* of the fused qkv row, never reshaped to ``(H, Dh)``;
- RoPE is applied with precomputed interleaved cos / signed-sin tables and a
  pairwise lane swap built from two ``pltpu.roll`` calls — no pair reshape;
- GQA K/V head duplication is one matmul against a constant 0/1
  ``(kv_size, q_size)`` expansion matrix (MXU), not lane concats;
- per-head score/weighted-sum reductions go through tiny segment-mask
  matmuls (``(K, H*Dh) @ (H*Dh, H)``) on the MXU instead of axis reshapes;
- per-stream rows (penalty window, Gumbel noise, output logits) are
  selected/scattered with constant group matrices — no dynamic sublane
  indexing.

Sampling uses a *sort-free exact* top-p: token ``i`` stays in the nucleus iff
``sum_{j: l_j > l_i} p_j + p_i <= top_p`` or ``i`` is the argmax — the same
set the reference's sort+cumsum selects (inference.py:47-57; ties at the
boundary are kept, where an unstable sort picks an arbitrary subset).  The
O(V^2) pairwise comparison is ~1M VPU ops per stream for the 1024-entry
residual books — cheaper than any sort.  Gumbel noise is drawn outside with
the engine's key and passed in, keeping RNG handling in one place.

Weights must be int8-quantized per ``utils/quantize.py``; bf16 stacks (2x
the bytes) do not fit in VMEM and use the XLA path.
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

# Streams per kernel invocation.  Per-stream VMEM state is ~100 KB; the
# binding constraint is VPU work in the O(V^2) top-p (linear in B), which
# stays well under the weight-streaming win through B=16 (matches the
# slow-stack kernel's batch ceiling).
MAX_BATCH = 16


def _make_kernel(cfg: DualARConfig, window: int, batch: int):
    B = batch
    K = cfg.num_codebooks
    D = cfg.fast_dim
    H = cfg.fast_n_head
    Hkv = cfg.fast_n_local_heads
    Dh = cfg.fast_head_dim
    G = H // Hkv
    Vr = cfg.residual_codebook_size
    L = cfg.n_fast_layer
    eps = cfg.norm_eps
    q_size = H * Dh
    kv_size = Hkv * Dh
    scale = 1.0 / math.sqrt(Dh)
    R = K - 1  # residual codebook steps / rows per stream

    def _rms(x, w):
        n = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
        return n * w

    def _rope(x, cos_row, sin_row):
        """Interleaved-pair rotation via lane swap; tables carry the sign."""
        n = x.shape[-1]
        r_next = pltpu.roll(x, n - 1, 1)  # lane i <- x[i+1 mod n]
        r_prev = pltpu.roll(x, 1, 1)      # lane i <- x[i-1 mod n]
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        swap = jnp.where(lane % 2 == 0, r_next, r_prev)
        return x * cos_row + swap * sin_row

    def kernel(
        temp_ref, top_p_ref, rep_ref,             # (B, 1) VMEM f32
        h_ref,            # (B, D) slow hidden, already fast-projected
        a0_ref,           # (B, 1) int32 first codebook code
        prev_ref,         # (B*R, W) int32 penalty windows
        gumbel_ref,       # (B*R, Vr) f32
        cos_q_ref, sin_q_ref,                     # (K, q_size)
        cos_k_ref, sin_k_ref,                     # (K, kv_size)
        dup_ref,          # (kv_size, q_size) f32 GQA expansion
        gsel_ref,         # (B, B*R) f32 group select/sum
        seg_ref,          # (q_size, H) f32 segment mask
        seg_t_ref,        # (H, q_size) f32
        attn_norm_ref, ffn_norm_ref,              # (L, D)
        wqkv_q, wqkv_s, wo_q, wo_s,
        w1_q, w1_s, w3_q, w3_s, w2_q, w2_s,
        fast_norm_ref,                            # (1, D)
        head_q, head_s,                           # (D, Vr) int8, (1, Vr)
        emb_q, emb_s,                             # (C, D) int8, (1, C) scales
        codes_ref,        # (B, R) int32 out
        logits_out_ref,   # (B*R, Vr) f32 out (penalized, pre-mask)
        qkv_scr_ref,      # (D, q+2kv) bf16 scratch: wqkv staging
        wo_scr_ref,       # (q_size, D) bf16 scratch: wo staging
        w1_scr_ref,       # (D, I) bf16 scratch: w1 staging
        w3_scr_ref,       # (D, I) bf16 scratch: w3 staging
        w2_scr_ref,       # (I, D) bf16 scratch: w2 staging
        escr_ref,         # (C, D) bf16 scratch: embedding, staged once
        hscr_ref,         # (D, Vr) bf16 scratch: residual head, staged once
    ):
        temp = temp_ref[...]     # (B, 1)
        top_p = top_p_ref[...]
        rep = rep_ref[...]

        # Weight dequantization is staged through EXPLICIT VMEM scratch
        # buffers, never value-level `wq[layer].astype(bf16)` expressions:
        # the codebook loop is statically unrolled, and Mosaic unifies the
        # identical per-step converts into one temporary per weight, all
        # accounted live simultaneously — bf16 (or f32, for a mixed-dtype
        # dot) copies of the ENTIRE stack count against the limit and VMEM
        # accounting explodes ("Ran out of memory in memory space vmem.
        # Used 194.50M of 128.00M" at S1-mini shapes).  Ref writes have
        # program-order semantics, so each staging write reuses its buffer
        # and peak VMEM is weights + one slot per weight class.  Each class
        # gets its OWN slot (not one shared slot) so consecutive qdots have
        # no false write-after-read dependency and Mosaic can overlap the
        # next weight's staging (VPU) with the current dot (MXU).
        # s8 -> bf16 is exact (|v| <= 127), so the math is unchanged.
        def qdot(x, wq, ws, layer, scr):
            scr[...] = wq[layer].astype(jnp.bfloat16)
            out = jnp.dot(x.astype(jnp.bfloat16), scr[...],
                          preferred_element_type=jnp.float32)
            return out * ws[layer]

        # embedding table and residual head are used by every step: stage
        # them once into their own scratch (explicitly accounted, unlike a
        # CSE'd convert which Mosaic double-counts against the limit)
        escr_ref[...] = emb_q[...].astype(jnp.bfloat16)
        hscr_ref[...] = head_q[...].astype(jnp.bfloat16)

        C = emb_q.shape[0]
        c_iota = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
        v_iota = jax.lax.broadcasted_iota(jnp.int32, (1, Vr), 1)
        r_col = jax.lax.broadcasted_iota(jnp.int32, (B * R, 1), 0)
        o_col = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1)

        def embed(code):
            # one-hot matmul gather: dynamic int8 row loads are not provably
            # tile-aligned for Mosaic, but a (B, C) @ (C, D) MXU pass over the
            # VMEM-resident table is cheap and exact.  code: (B, 1)
            onehot = (c_iota == code)  # (B, C)
            row = jnp.dot(onehot.astype(jnp.bfloat16), escr_ref[...],
                          preferred_element_type=jnp.float32)
            s = jnp.sum(jnp.where(onehot, emb_s[...], 0.0),
                        axis=-1, keepdims=True)  # (B, 1)
            return row * s

        # Per-position K/V lists: the codebook loop is STATICALLY UNROLLED
        # (K is a small config constant), so position ``pos`` is a Python
        # int — the cache for each layer is just a list of (B, q_size)
        # arrays, one per position filled so far.  Every attention op is
        # batched over all B streams ((B, ...) shapes); the earlier
        # per-(layer, stream) loop issued B*L tiny-vector chains per step
        # (64 at B=16), which dominated the batched kernel's latency.
        ks = [[] for _ in range(L)]
        vs = [[] for _ in range(L)]

        def layer_stack(x, pos):
            """One pass over all layers at static codebook position
            ``pos`` for all B streams; appends this position's K/V."""
            cos_q = cos_q_ref[pos:pos + 1]  # static row: (1, q_size)
            sin_q = sin_q_ref[pos:pos + 1]
            cos_k = cos_k_ref[pos:pos + 1]
            sin_k = sin_k_ref[pos:pos + 1]
            for layer in range(L):
                h = _rms(x, attn_norm_ref[layer])
                qkv = qdot(h, wqkv_q, wqkv_s, layer, qkv_scr_ref)  # (B, q+2kv)
                q = _rope(qkv[:, :q_size], cos_q, sin_q)
                k = _rope(qkv[:, q_size:q_size + kv_size], cos_k, sin_k)
                v = qkv[:, q_size + kv_size:]
                # duplicate K/V per query head for every stream in one
                # constant-matrix MXU pass (GQA in lane layout)
                k_rep = jnp.dot(k, dup_ref[...],
                                preferred_element_type=jnp.float32)  # (B, q)
                v_rep = jnp.dot(v, dup_ref[...],
                                preferred_element_type=jnp.float32)
                ks[layer].append(k_rep)
                vs[layer].append(v_rep)
                # attention over the pos+1 cached positions, all streams
                # at once: per-head scores via the segment-mask matmul
                s_ts = [
                    jnp.dot(kt * q, seg_ref[...],
                            preferred_element_type=jnp.float32) * scale
                    for kt in ks[layer]
                ]  # each (B, H)
                m = s_ts[0]
                for s_t in s_ts[1:]:
                    m = jnp.maximum(m, s_t)
                p_ts = [jnp.exp(s_t - m) for s_t in s_ts]
                den = p_ts[0]
                for p_t in p_ts[1:]:
                    den = den + p_t
                o = None
                for p_t, v_t in zip(p_ts, vs[layer]):
                    pe = jnp.dot(p_t, seg_t_ref[...],
                                 preferred_element_type=jnp.float32)
                    o = pe * v_t if o is None else o + pe * v_t
                den_exp = jnp.dot(den, seg_t_ref[...],
                                  preferred_element_type=jnp.float32)
                o = o / den_exp  # (B, q_size)
                x = x + qdot(o, wo_q, wo_s, layer, wo_scr_ref)
                f = _rms(x, ffn_norm_ref[layer])
                gate = qdot(f, w1_q, w1_s, layer, w1_scr_ref)
                up = qdot(f, w3_q, w3_s, layer, w3_scr_ref)
                x = x + qdot(gate * jax.lax.logistic(gate) * up,
                             w2_q, w2_s, layer, w2_scr_ref)
            return x

        h_rows = h_ref[...].astype(jnp.float32)   # (B, D)
        prev_all = prev_ref[...]                  # (B*R, W) int32
        gumbel_all = gumbel_ref[...]              # (B*R, Vr) f32

        code = a0_ref[...]                        # (B, 1)
        codes_acc = jnp.zeros((B, R), jnp.int32)
        logits_acc = jnp.zeros((B * R, Vr), jnp.float32)
        for cb in range(K):
            # pos 0 consumes the slow hidden, output discarded
            # (inference.py:121-122); later steps consume the last embedding
            x_in = h_rows if cb == 0 else embed(code)
            x = layer_stack(x_in, cb)
            if cb == 0:
                continue

            hn = _rms(x, fast_norm_ref[...])
            logits = jnp.dot(
                hn.astype(jnp.bfloat16), hscr_ref[...],
                preferred_element_type=jnp.float32,
            ) * head_s[...]  # (B, Vr)

            # repetition penalty over each stream's window row cb+1
            # (inference.py:39-45); the row mask zeroes every other row and
            # the group matmul collapses each stream's block to its one
            # selected row.  rep == 1.0 makes this an exact no-op (prefill).
            rmask = r_col % R == cb - 1  # (B*R, 1)
            win = jnp.dot(gsel_ref[...],
                          jnp.where(rmask, prev_all, 0).astype(jnp.float32),
                          preferred_element_type=jnp.float32)  # (B, W)
            hit = jnp.zeros((B, Vr), jnp.bool_)
            for w in range(window):
                hit = hit | (v_iota == win[:, w:w + 1].astype(jnp.int32))
            logits = jnp.where(
                hit, jnp.where(logits < 0, logits * rep, logits / rep), logits
            )

            # exact sort-free top-p on unscaled logits (inference.py:47-57)
            z = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - z)  # (B, Vr)
            TILE = 256
            keep_parts = []
            amax = jnp.max(logits, axis=-1, keepdims=True)
            for t0 in range(0, Vr, TILE):
                li = logits[:, t0:t0 + TILE]  # (B, TILE)
                gt = logits[:, None, :] > li[:, :, None]  # (B, TILE, Vr)
                s_above = jnp.sum(jnp.where(gt, p[:, None, :], 0.0), axis=-1)
                pi = p[:, t0:t0 + TILE]
                keep_parts.append(
                    # top_p >= 1 keeps everything (same special case as
                    # sampler_kernel / sampling.top_p_threshold_mask:
                    # f32 rounding can make the full mass land above 1.0)
                    (s_above + pi <= top_p) | (li >= amax)
                    | (top_p >= 1.0))
            keep = jnp.concatenate(keep_parts, axis=-1)  # (B, Vr)
            masked = jnp.where(keep, logits, _NEG)

            scaled = masked / jnp.maximum(temp, 1e-5)
            g = jnp.dot(gsel_ref[...],
                        jnp.where(rmask, gumbel_all, 0.0),
                        preferred_element_type=jnp.float32)  # (B, Vr)
            sampled = jnp.argmax(scaled + g, axis=-1)[:, None].astype(
                jnp.int32)  # (B, 1)

            code = sampled
            codes_acc = jnp.where(o_col == cb - 1, sampled, codes_acc)
            # scatter each stream's logits row into its group slot via the
            # transpose of the group matrix (exact expansion on the MXU)
            expand = jax.lax.dot_general(
                gsel_ref[...], logits,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (B*R, Vr)
            logits_acc = jnp.where(rmask, expand, logits_acc)

        codes_ref[...] = codes_acc
        logits_out_ref[...] = logits_acc

    return kernel


# VMEM budget for the whole-stack-resident kernel: the pallas_call caps
# vmem_limit_bytes at 128 MiB (v5e core VMEM) with a 48 MiB scratch margin
# over the weight bytes — supports() must enforce the same arithmetic so an
# oversized fast stack falls back to XLA instead of failing Mosaic compile.
_VMEM_BUDGET = 128 * 1024 * 1024
_SCRATCH_MARGIN = 48 * 1024 * 1024


def _vmem_estimate(cfg: DualARConfig, params: Params, batch: int) -> int:
    """Approximate VMEM residency of the fused kernel's inputs: int8 weight
    planes + f32 scales/norms + the derived rope/segment/dup tables + the
    per-stream buffers.  Mirrors fast_decode_frame's input list."""
    fl = params["fast_layers"]
    K, Vr = cfg.num_codebooks, cfg.residual_codebook_size
    H, Hkv, Dh = cfg.fast_n_head, cfg.fast_n_local_heads, cfg.fast_head_dim

    def qs(p) -> int:
        return int(p["q"].size) + 4 * int(p["s"].size)

    w = sum(qs(fl[k]) for k in ("wqkv", "wo", "w1", "w3", "w2"))
    w += qs(params["fast_embeddings"])
    head = params["fast_output"]
    w += int(head["q"].shape[0]) * Vr + 4 * Vr  # head sliced to [:, :Vr]
    w += 4 * (int(fl["attention_norm"].size) + int(fl["ffn_norm"].size)
              + int(params["fast_norm"].size))
    tables = 4 * (
        K * Dh * 2 * (H + Hkv)     # interleaved rope lane tables
        + (Hkv * Dh) * (H * Dh)    # GQA dup matrix
        + 2 * H * Dh * H           # seg / seg_t
        + batch * batch * (K - 1)  # gsel scatter matrix
    )
    # h_fast + a0/prev windows + gumbel + logits out (window <= 64 bound)
    acts = 4 * batch * (cfg.fast_dim + (K - 1) * (2 * Vr + 64) + 2)
    # bf16 dequant staging scratch (fast_decode_frame scratch_shapes)
    D = cfg.fast_dim
    I = int(fl["w1"]["q"].shape[2])
    q_size, kv_size = H * Dh, Hkv * Dh
    C = int(params["fast_embeddings"]["q"].shape[0])
    scratch = 2 * (
        D * (q_size + 2 * kv_size) + q_size * D + 3 * I * D
        + C * D + D * Vr
    )
    return w + tables + acts + scratch


def supports(cfg: DualARConfig, params: Params, batch: int) -> bool:
    """True when the fused kernel can run this config/params/batch combo."""
    from fish_tts_tpu.utils.quantize import is_quantized

    fl = params.get("fast_layers", {})
    return (
        1 <= batch <= MAX_BATCH
        and is_quantized(fl.get("wqkv"))
        and is_quantized(params.get("fast_embeddings"))
        and is_quantized(params.get("fast_output"))
        and cfg.fast_head_dim % 2 == 0
        # fast_project_in (fast_dim != dim checkpoints) is NOT a blocker:
        # the caller projects the slow hidden before handing it to the
        # kernel (decode._sample_frame), which runs purely at fast_dim
        and _vmem_estimate(cfg, params, batch)
        + _SCRATCH_MARGIN <= _VMEM_BUDGET
    )


def rope_tables(cfg: DualARConfig, rope_fast: jnp.ndarray):
    """Expand the (K, Dh/2, 2) pair table into interleaved lane tables
    (shared layout: ops/kernel_layout.interleaved_lane_tables)."""
    from fish_tts_tpu.ops.kernel_layout import interleaved_lane_tables

    return interleaved_lane_tables(
        rope_fast, cfg.fast_n_head, cfg.fast_n_local_heads
    )


def _segment_masks(cfg: DualARConfig):
    from fish_tts_tpu.ops.kernel_layout import head_segment_masks

    return head_segment_masks(cfg.fast_n_head, cfg.fast_head_dim)


def _dup_matrix(cfg: DualARConfig):
    H, Hkv, Dh = cfg.fast_n_head, cfg.fast_n_local_heads, cfg.fast_head_dim
    G = H // Hkv
    dup = np.zeros((Hkv * Dh, H * Dh), np.float32)
    for hq in range(H):
        h0 = (hq // G) * Dh
        dup[h0:h0 + Dh, hq * Dh:(hq + 1) * Dh] = np.eye(Dh)
    return jnp.asarray(dup)


@functools.partial(jax.jit, static_argnames=("cfg", "window", "interpret"))
def fast_decode_frame(
    params: Params,
    cfg: DualARConfig,
    rope_fast: jnp.ndarray,   # (K, Dh/2, 2)
    h_fast: jnp.ndarray,      # (B, D) slow hidden (already projected)
    a0: jnp.ndarray,          # (B,) int32 first codebook code
    prev_rows: jnp.ndarray,   # (B, K-1, W) int32 penalty windows
    gumbel: jnp.ndarray,      # (B, K-1, Vr) f32
    temperature: jnp.ndarray,  # scalar or (B, 1)
    top_p: jnp.ndarray,
    repetition_penalty: jnp.ndarray,
    *,
    window: int,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Run the fused per-frame codebook loop for B <= MAX_BATCH streams.

    Returns (codes (B, K-1) int32, penalized_logits (B, K-1, Vr) f32).
    """
    K = cfg.num_codebooks
    Vr = cfg.residual_codebook_size
    B = h_fast.shape[0]
    fl = params["fast_layers"]

    def col(x):
        """Scalar or per-stream sampling param -> (B, 1) f32 column."""
        x = jnp.asarray(x, jnp.float32)
        return jnp.broadcast_to(x.reshape(-1, 1), (B, 1))

    head = params["fast_output"]
    head_q = head["q"][:, :Vr]
    head_s = head["s"][:, :Vr]
    emb = params["fast_embeddings"]
    cos_q, sin_q, cos_k, sin_k = rope_tables(cfg, rope_fast)
    seg, seg_t = _segment_masks(cfg)
    dup = _dup_matrix(cfg)
    gsel = jnp.asarray(
        np.kron(np.eye(B, dtype=np.float32), np.ones((1, K - 1), np.float32))
    )

    kernel = _make_kernel(cfg, window, B)
    vmem_bytes = (
        sum(int(fl[k]["q"].size) for k in ("wqkv", "wo", "w1", "w3", "w2"))
        + int(head_q.size) + int(emb["q"].size)
    )


    specs = pl.BlockSpec(memory_space=pltpu.VMEM)

    inputs = (
        col(temperature), col(top_p), col(repetition_penalty),
        h_fast.astype(jnp.float32),
        a0.reshape(B, 1).astype(jnp.int32),
        prev_rows.reshape(B * (K - 1), window).astype(jnp.int32),
        gumbel.reshape(B * (K - 1), Vr).astype(jnp.float32),
        cos_q, sin_q, cos_k, sin_k, dup, gsel, seg, seg_t,
        fl["attention_norm"].astype(jnp.float32),
        fl["ffn_norm"].astype(jnp.float32),
        fl["wqkv"]["q"], fl["wqkv"]["s"].astype(jnp.float32),
        fl["wo"]["q"], fl["wo"]["s"].astype(jnp.float32),
        fl["w1"]["q"], fl["w1"]["s"].astype(jnp.float32),
        fl["w3"]["q"], fl["w3"]["s"].astype(jnp.float32),
        fl["w2"]["q"], fl["w2"]["s"].astype(jnp.float32),
        params["fast_norm"].astype(jnp.float32)[None, :],
        head_q, head_s.astype(jnp.float32),
        emb["q"], emb["s"].astype(jnp.float32).reshape(1, -1),
    )
    # Known XLA:TPU hazard (harness-only so far): if this custom call's
    # OUTPUTS are consumed directly by a scan's stacking updates, XLA wraps
    # call+stacking into one kCustom fusion and charges the kernel's ~69 MB
    # VMEM against the fusion's 16 MB scoped-vmem budget -> "Scoped
    # allocation ... exceeded scoped vmem limit" at compile time.  The
    # production decode path post-processes the outputs (concatenate /
    # state updates), which breaks that fusion; standalone benchmark
    # harnesses should do the same (see scripts/profile_batch.py).
    # dequant staging buffers (see _make_kernel.qdot): one slot per weight
    # class (so staging of the next weight overlaps the current dot), plus
    # once-staged embedding and head tables
    D = cfg.fast_dim
    I = int(fl["w1"]["q"].shape[2])
    q_size = cfg.fast_n_head * cfg.fast_head_dim
    kv_size = cfg.fast_n_local_heads * cfg.fast_head_dim
    C = int(emb["q"].shape[0])
    scratch_shapes = [
        pltpu.VMEM((D, q_size + 2 * kv_size), jnp.bfloat16),  # wqkv
        pltpu.VMEM((q_size, D), jnp.bfloat16),                # wo
        pltpu.VMEM((D, I), jnp.bfloat16),                     # w1
        pltpu.VMEM((D, I), jnp.bfloat16),                     # w3
        pltpu.VMEM((I, D), jnp.bfloat16),                     # w2
        pltpu.VMEM((C, D), jnp.bfloat16),                     # embedding
        pltpu.VMEM((D, Vr), jnp.bfloat16),                    # head
    ]
    scratch_bytes = 2 * (
        D * (q_size + 2 * kv_size) + q_size * D + 3 * I * D
        + C * D + D * Vr
    )

    codes, logits = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, K - 1), jnp.int32),
            jax.ShapeDtypeStruct((B * (K - 1), Vr), jnp.float32),
        ),
        in_specs=[specs] * 32,
        out_specs=(specs, specs),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(128 * 1024 * 1024,
                                 vmem_bytes + scratch_bytes
                                 + 48 * 1024 * 1024),
        ),
        interpret=interpret,
    )(*inputs)
    return codes, logits.reshape(B, K - 1, Vr)
