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
stream).  The codebook loop is a ``lax.fori_loop`` over positions: each
layer's KV cache is a (K*B, q_size) f32 VMEM scratch (row pos*B + b) and
attention reads all K row-blocks with future rows masked — every shape is
static, every op batches all streams, and the compiled program is ~K x
smaller than a static unroll (round 4's unrolled variant crashed the
remote Mosaic compile outright at S1-mini shapes).  Per-stream sampling
parameters ride in as (B, 1) columns.

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

# How the int8 weights reach the MXU (static kernel variant):
#
#   "scratch" — stage wq[layer] -> bf16 VMEM scratch per qdot, dot in bf16.
#       Exact (s8->bf16 is lossless) but the statically unrolled codebook
#       loop re-stages every weight on EVERY step: K x the whole stack of
#       VPU converts per frame (~600M element converts at S1-mini), which
#       cost round 4 a 532 -> 339 tok/s single-stream regression.
#   "value" — value-level wq[layer].astype(bf16) and let Mosaic place the
#       temporary.  Exact and convert-once-per-frame (CSE), but the CSE'd
#       temporaries' live ranges span the kernel, so VMEM accounting holds
#       bf16 copies of the ENTIRE stack ("Used 194.50M of 128.00M" at
#       S1-mini shapes with the round-4 batched kernel).  Kept for A/B.
#   "s8" — quantize the activation row to s8 (per-row absmax) and run the
#       dot natively s8 x s8 -> s32 on the MXU; no weight dequantization
#       anywhere.  Halves MXU operand traffic vs bf16 and does zero convert
#       work, at the cost of ~8-bit activation rounding (weights are
#       already int8); the embedding gather stays EXACT (0/1 rows need no
#       scaling).  Not bit-identical to the XLA weight-only-dequant path.
DEQUANT_MODES = ("scratch", "value", "s8")

# Production default, chosen by on-chip A/B (PERFORMANCE.md round 5; all
# numbers are the isolated kernel at S1-mini shapes):
#
#   B=1:  scratch 850 tok/s, value 1245, s8 1234
#   B=8:  scratch 5790 agg,  value 7554, s8 7740
#   B=16: scratch FAILED (remote Mosaic compile crash), value 12661, s8 11118
#
# "value" wins: bit-exact vs the XLA weight-only-dequant path (scratch ==
# value to the bit in the interpret parity suite), fastest at B=1/16, and
# compiles everywhere — inside the fori_loop body Mosaic keeps the bf16
# convert temporaries iteration-local instead of hoisting whole-stack
# copies.  "s8" (activation-quantized native s8 x s8 dots) is kept as an
# opt-in: ~0.7% logit rel-error, within noise of "value" on speed.
DEFAULT_DEQUANT = "value"


def _make_kernel(cfg: DualARConfig, window: int, batch: int,
                 dequant: str = "scratch"):
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
        tile_ref,         # (K*B, B) f32 0/1 position row tiling
        gsum_ref,         # (B, K*B) f32 0/1 position group sum
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
        *scratch,         # mode-dependent staging buffers (see below)
    ):
        temp = temp_ref[...]     # (B, 1)
        top_p = top_p_ref[...]
        rep = rep_ref[...]

        # scratch layout: 2L per-layer K/V buffers first (all modes), then
        # the mode-dependent dequant staging slots (_scratch_defs order)
        mode_scr = scratch[2 * L:]

        if dequant == "scratch":
            # Weight dequantization is staged through EXPLICIT VMEM scratch
            # buffers, never value-level `wq[layer].astype(bf16)`
            # expressions: inside the fori_loop body each staging write
            # reuses its buffer (ref writes have program-order semantics),
            # so peak VMEM is weights + one slot per weight class — a
            # value-level convert's temporary could be hoisted/CSE'd with
            # a live range spanning iterations, which at S1-mini shapes
            # once blew VMEM accounting to 194.5M/128M.  Each class gets
            # its OWN slot (not one shared slot) so consecutive qdots have
            # no false write-after-read dependency.  s8 -> bf16 is exact
            # (|v| <= 127), so the math is unchanged — but the re-staging
            # per codebook step costs K x the stack in VPU converts.
            (qkv_scr_ref, wo_scr_ref, w1_scr_ref, w3_scr_ref, w2_scr_ref,
             escr_ref, hscr_ref) = mode_scr
            scr_by_class = {"wqkv": qkv_scr_ref, "wo": wo_scr_ref,
                            "w1": w1_scr_ref, "w3": w3_scr_ref,
                            "w2": w2_scr_ref}

            def qdot(x, wq, ws, layer, cls):
                scr = scr_by_class[cls]
                scr[...] = wq[layer].astype(jnp.bfloat16)
                out = jnp.dot(x.astype(jnp.bfloat16), scr[...],
                              preferred_element_type=jnp.float32)
                return out * ws[layer]

            # embedding table and residual head are used by every step:
            # stage them once into their own scratch (explicitly accounted,
            # unlike a CSE'd convert which Mosaic double-counts)
            escr_ref[...] = emb_q[...].astype(jnp.bfloat16)
            hscr_ref[...] = head_q[...].astype(jnp.bfloat16)

            def head_dot(hn):
                return jnp.dot(hn.astype(jnp.bfloat16), hscr_ref[...],
                               preferred_element_type=jnp.float32)

            def emb_dot(onehot):
                return jnp.dot(onehot.astype(jnp.bfloat16), escr_ref[...],
                               preferred_element_type=jnp.float32)

        elif dequant == "value":
            # value-level converts: Mosaic places the bf16 temporaries; in
            # the fori_loop body they are iteration-local, but a hoisted /
            # CSE'd convert's live range can span iterations (historically
            # blew VMEM accounting to 194.5M/128M) — kept for A/B only.
            def qdot(x, wq, ws, layer, cls):
                w = wq[layer].astype(jnp.bfloat16)
                out = jnp.dot(x.astype(jnp.bfloat16), w,
                              preferred_element_type=jnp.float32)
                return out * ws[layer]

            def head_dot(hn):
                return jnp.dot(hn.astype(jnp.bfloat16),
                               head_q[...].astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)

            def emb_dot(onehot):
                return jnp.dot(onehot.astype(jnp.bfloat16),
                               emb_q[...].astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)

        else:  # "s8"
            # native s8 x s8 -> s32 MXU dots: quantize the activation row
            # (per-row absmax, |xq| <= 127 by construction) and feed the
            # resident int8 weight plane straight to the MXU — zero weight
            # dequantization and half the operand bytes of a bf16 dot.
            def s8dot(x, w_plane):
                amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)  # (B, 1)
                sc = jnp.maximum(amax, 1e-30) / 127.0
                xq = jnp.round(x / sc).astype(jnp.int8)
                acc = jax.lax.dot_general(
                    xq, w_plane, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return acc.astype(jnp.float32) * sc

            def qdot(x, wq, ws, layer, cls):
                return s8dot(x, wq[layer]) * ws[layer]

            def head_dot(hn):
                return s8dot(hn, head_q[...])

            def emb_dot(onehot):
                # 0/1 rows: s8 onehot x s8 table is EXACT (no act scaling)
                acc = jax.lax.dot_general(
                    onehot.astype(jnp.int8), emb_q[...],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return acc.astype(jnp.float32)

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
            row = emb_dot(onehot)
            s = jnp.sum(jnp.where(onehot, emb_s[...], 0.0),
                        axis=-1, keepdims=True)  # (B, 1)
            return row * s

        # The codebook loop is a ``lax.fori_loop`` over positions, NOT a
        # static unroll: round 4's unrolled variant emitted a ~K x larger
        # Mosaic program whose compile outright failed at S1-mini shapes
        # (remote compile helper crash after many minutes), and its CSE'd
        # weight converts were what forced the per-step scratch staging.
        # K/V live in per-layer (K*B, q_size) f32 scratch (row pos*B + b);
        # attention reads all K row-blocks each step and masks rows beyond
        # the current position — the redundant masked FLOPs are trivial
        # (K*B <= 160 rows) and every shape stays static.
        row_pos = jax.lax.broadcasted_iota(jnp.int32, (K * B, 1), 0) // B

        h_rows = h_ref[...].astype(jnp.float32)   # (B, D)
        prev_all = prev_ref[...]                  # (B*R, W) int32
        gumbel_all = gumbel_ref[...]              # (B*R, Vr) f32
        tile_kb = tile_ref[...]                   # (K*B, B) 0/1: row tiling
        gsum = gsum_ref[...]                      # (B, K*B) 0/1: group sum

        def step(pos, carry):
            code, codes_acc, logits_acc = carry
            # pos 0 consumes the slow hidden, output discarded
            # (inference.py:121-122); later steps consume the last embedding
            x = jnp.where(pos == 0, h_rows, embed(code))  # (B, D)
            cos_q = cos_q_ref[pl.ds(pos, 1), :]
            sin_q = sin_q_ref[pl.ds(pos, 1), :]
            cos_k = cos_k_ref[pl.ds(pos, 1), :]
            sin_k = sin_k_ref[pl.ds(pos, 1), :]
            for layer in range(L):
                k_ref = scratch[2 * layer]
                v_ref = scratch[2 * layer + 1]
                h = _rms(x, attn_norm_ref[layer])
                qkv = qdot(h, wqkv_q, wqkv_s, layer, "wqkv")  # (B, q+2kv)
                q = _rope(qkv[:, :q_size], cos_q, sin_q)
                k = _rope(qkv[:, q_size:q_size + kv_size], cos_k, sin_k)
                v = qkv[:, q_size + kv_size:]
                # duplicate K/V per query head for every stream in one
                # constant-matrix MXU pass (GQA in lane layout)
                k_rep = jnp.dot(k, dup_ref[...],
                                preferred_element_type=jnp.float32)  # (B, q)
                v_rep = jnp.dot(v, dup_ref[...],
                                preferred_element_type=jnp.float32)
                k_ref[pl.ds(pos * B, B), :] = k_rep
                v_ref[pl.ds(pos * B, B), :] = v_rep
                k_all = k_ref[...]                       # (K*B, q_size)
                v_all = v_ref[...]
                live = row_pos <= pos                    # (K*B, 1)
                # per-head scores for every cached position at once via the
                # segment-mask matmul; dead rows (future positions / last
                # frame's garbage) are masked BEFORE exp and their V rows
                # zeroed (0 * anything-finite; pe is exactly 0 there)
                q_t = jnp.dot(tile_kb, q,
                              preferred_element_type=jnp.float32)  # (K*B, q)
                s_all = jnp.dot(k_all * q_t, seg_ref[...],
                                preferred_element_type=jnp.float32) * scale
                s_all = jnp.where(live, s_all, _NEG)     # (K*B, H)
                m = s_all[:B]                            # (B, H) max tree
                for t in range(1, K):
                    m = jnp.maximum(m, s_all[t * B:(t + 1) * B])
                m_t = jnp.dot(tile_kb, m, preferred_element_type=jnp.float32)
                p_all = jnp.where(live, jnp.exp(s_all - m_t), 0.0)
                den = jnp.dot(gsum, p_all,
                              preferred_element_type=jnp.float32)  # (B, H)
                pe = jnp.dot(p_all, seg_t_ref[...],
                             preferred_element_type=jnp.float32)  # (K*B, q)
                weighted = pe * jnp.where(live, v_all, 0.0)
                o = jnp.dot(gsum, weighted,
                            preferred_element_type=jnp.float32)   # (B, q)
                den_q = jnp.dot(den, seg_t_ref[...],
                                preferred_element_type=jnp.float32)
                o = o / den_q  # (B, q_size); den >= 1 (max row exp == 1)
                x = x + qdot(o, wo_q, wo_s, layer, "wo")
                f = _rms(x, ffn_norm_ref[layer])
                gate = qdot(f, w1_q, w1_s, layer, "w1")
                up = qdot(f, w3_q, w3_s, layer, "w3")
                x = x + qdot(gate * jax.lax.logistic(gate) * up,
                             w2_q, w2_s, layer, "w2")

            hn = _rms(x, fast_norm_ref[...])
            logits = head_dot(hn) * head_s[...]  # (B, Vr)

            # repetition penalty over each stream's window row cb+1
            # (inference.py:39-45); the row mask zeroes every other row and
            # the group matmul collapses each stream's block to its one
            # selected row.  rep == 1.0 makes this an exact no-op (prefill).
            # At pos 0 rmask matches nothing, so every accumulator update
            # below is a no-op and the carry code stays a0.
            rmask = (r_col % R) == (pos - 1)  # (B*R, 1)
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

            new_code = jnp.where(pos == 0, code, sampled)
            codes_acc = jnp.where(o_col == pos - 1, sampled, codes_acc)
            # scatter each stream's logits row into its group slot via the
            # transpose of the group matrix (exact expansion on the MXU)
            expand = jax.lax.dot_general(
                gsel_ref[...], logits,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (B*R, Vr)
            logits_acc = jnp.where(rmask, expand, logits_acc)
            return (new_code, codes_acc, logits_acc)

        init = (
            a0_ref[...],                           # (B, 1) carry code
            jnp.zeros((B, R), jnp.int32),          # codes accumulator
            jnp.zeros((B * R, Vr), jnp.float32),   # penalized logits acc
        )
        _, codes_acc, logits_acc = jax.lax.fori_loop(0, K, step, init)

        codes_ref[...] = codes_acc
        logits_out_ref[...] = logits_acc

    return kernel


# VMEM budget for the whole-stack-resident kernel: the pallas_call caps
# vmem_limit_bytes at 128 MiB (v5e core VMEM); supports() leaves a
# batch-scaled margin for Mosaic temporaries (top-p tiles, attention
# intermediates) over the explicitly-estimated residency so an oversized
# fast stack falls back to XLA instead of failing Mosaic compile.
#
# Round-4 post-mortem: a flat 48 MiB margin ON TOP of the newly-added
# explicit scratch accounting pushed S1-mini (est. 107.6 MB) over the gate,
# silently disabling the kernel — the driver's 532 -> 339 tok/s "kernel
# regression" was really the XLA fast loop running instead.  The margin
# must cover only what the estimate does NOT: per-step temporaries, whose
# largest is the (B, 256, Vr) f32 top-p tile.
_VMEM_BUDGET = 128 * 1024 * 1024


def _margin_bytes(cfg: DualARConfig, batch: int) -> int:
    # top-p pairwise tile + a few B x Vr / B x I f32 intermediates + slack.
    # Calibrated against round-5 on-chip results: value mode compiled and
    # RAN at B=1/8/16 under the 128 MB limit (12.7k tok/s agg at B=16), so
    # Mosaic demonstrably does not materialize the full (B, 256, Vr) f32
    # top-p tile; half a tile + row-slack covers its real temporaries.
    topp_tile = 4 * batch * 256 * cfg.residual_codebook_size
    rows = 4 * batch * 8 * max(cfg.residual_codebook_size,
                               cfg.fast_intermediate_size)
    return 8 * 1024 * 1024 + topp_tile // 2 + rows


def _scratch_defs(cfg: DualARConfig, params: Params, batch: int,
                  dequant: str):
    """Mode-dependent VMEM scratch buffers (single source of truth for both
    pallas_call's scratch_shapes and the supports() byte accounting).
    Layout contract with _make_kernel: 2L per-layer K/V buffers first, then
    the dequant staging slots."""
    fl = params["fast_layers"]
    D = cfg.fast_dim
    I = int(fl["w1"]["q"].shape[2])
    q_size = cfg.fast_n_head * cfg.fast_head_dim
    kv_size = cfg.fast_n_local_heads * cfg.fast_head_dim
    C = int(params["fast_embeddings"]["q"].shape[0])
    Vr = cfg.residual_codebook_size
    K, L = cfg.num_codebooks, cfg.n_fast_layer
    shapes = []
    for _ in range(L):  # per-layer K and V caches, row = pos * B + b
        shapes.append(pltpu.VMEM((K * batch, q_size), jnp.float32))
        shapes.append(pltpu.VMEM((K * batch, q_size), jnp.float32))
    if dequant != "scratch":
        return shapes
    return shapes + [
        pltpu.VMEM((D, q_size + 2 * kv_size), jnp.bfloat16),  # wqkv
        pltpu.VMEM((q_size, D), jnp.bfloat16),                # wo
        pltpu.VMEM((D, I), jnp.bfloat16),                     # w1
        pltpu.VMEM((D, I), jnp.bfloat16),                     # w3
        pltpu.VMEM((I, D), jnp.bfloat16),                     # w2
        pltpu.VMEM((C, D), jnp.bfloat16),                     # embedding
        pltpu.VMEM((D, Vr), jnp.bfloat16),                    # head
    ]


def _scratch_bytes(shapes) -> int:
    return sum(int(np.prod(s.shape)) * jnp.dtype(s.dtype).itemsize
               for s in shapes)


def _vmem_estimate(cfg: DualARConfig, params: Params, batch: int,
                   dequant: str | None = None) -> int:
    """Approximate VMEM residency of the fused kernel's inputs: int8 weight
    planes + f32 scales/norms + the derived rope/segment/dup tables + the
    per-stream buffers + mode-dependent staging.  Mirrors
    fast_decode_frame's input list."""
    dequant = dequant or DEFAULT_DEQUANT
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
        + 2 * K * batch * batch    # tile / gsum position matrices
    )
    # h_fast + a0/prev windows + gumbel + logits out (window <= 64 bound)
    acts = 4 * batch * (cfg.fast_dim + (K - 1) * (2 * Vr + 64) + 2)
    extra = _scratch_bytes(_scratch_defs(cfg, params, batch, dequant))
    if dequant == "value":
        # Mosaic keeps value-level bf16 convert temporaries iteration-local
        # inside the fori_loop (measured round 5: B=16 compiled under the
        # 128 MB limit); budget the two largest planes as simultaneously
        # live (current dot's operand + next convert's destination)
        planes = sorted(
            (2 * int(np.prod(fl[k]["q"].shape[1:]))
             for k in ("wqkv", "wo", "w1", "w3", "w2")), reverse=True)
        extra += sum(planes[:2])
    return w + tables + acts + extra


def supports(cfg: DualARConfig, params: Params, batch: int,
             dequant: str | None = None) -> bool:
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
        and _vmem_estimate(cfg, params, batch,
                           dequant or DEFAULT_DEQUANT)
        + _margin_bytes(cfg, batch) <= _VMEM_BUDGET
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


def fast_decode_frame(*args, dequant: str | None = None, **kw):
    """Public entry: resolves the dequant mode BEFORE the jit boundary so
    module-default changes retrace instead of hitting a stale cache."""
    dequant = dequant or DEFAULT_DEQUANT
    if dequant not in DEQUANT_MODES:
        raise ValueError(f"dequant must be one of {DEQUANT_MODES}")
    return _fast_decode_frame(*args, dequant=dequant, **kw)


@functools.partial(
    jax.jit, static_argnames=("cfg", "window", "interpret", "dequant"))
def _fast_decode_frame(
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
    dequant: str = DEFAULT_DEQUANT,
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
    # position-row tiling / group-sum 0/1 matrices for the in-kernel KV
    # cache layout (row = pos * B + b): tile maps (B, x) -> (K*B, x) by
    # repetition, gsum sums a (K*B, x) over positions back to (B, x)
    tile_kb = jnp.asarray(np.tile(np.eye(B, dtype=np.float32), (K, 1)))
    gsum = jnp.asarray(np.tile(np.eye(B, dtype=np.float32), (1, K)))

    kernel = _make_kernel(cfg, window, B, dequant)
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
        cos_q, sin_q, cos_k, sin_k, dup, gsel, tile_kb, gsum, seg, seg_t,
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
    # mode-dependent dequant staging buffers (see _make_kernel); byte
    # accounting is derived from the same list supports() uses
    scratch_shapes = _scratch_defs(cfg, params, B, dequant)
    scratch_bytes = _scratch_bytes(scratch_shapes)
    if dequant == "value":
        # iteration-local bf16 convert temporaries (see _vmem_estimate)
        planes = sorted(
            (2 * int(np.prod(fl[k]["q"].shape[1:]))
             for k in ("wqkv", "wo", "w1", "w3", "w2")), reverse=True)
        scratch_bytes += sum(planes[:2])

    codes, logits = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, K - 1), jnp.int32),
            jax.ShapeDtypeStruct((B * (K - 1), Vr), jnp.float32),
        ),
        in_specs=[specs] * 34,
        out_specs=(specs, specs),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(_VMEM_BUDGET,
                                 vmem_bytes + scratch_bytes
                                 + _margin_bytes(cfg, B)
                                 + 16 * 1024 * 1024),
        ),
        interpret=interpret,
    )(*inputs)
    return codes, logits.reshape(B, K - 1, Vr)
