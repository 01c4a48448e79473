"""Shared lane-layout constructors for the Pallas decode kernels.

Both the slow-stack kernel (ops/slow_stack.py) and the fused fast-decoder
kernel (ops/fast_decoder.py) pre-expand their rotary tables and per-head
segment masks on the XLA side so the in-kernel math is pure multiply-adds
and MXU matmuls.  The expansion is identical modulo head counts and what
leads the pair table (codebook index vs stream index) — it lives here once
so a change to the interleave sign convention or lane layout cannot split
the two kernels' numerics.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def interleaved_lane_tables(pairs: jnp.ndarray, n_head: int, n_kv_head: int):
    """Expand a 2-D-leading ``(N, Dh/2, 2)`` cos/sin pair table into
    interleaved lane rows ``(cos_q, sin_q, cos_k, sin_k)``.

    cos is duplicated per pair element and tiled per head; sin carries the
    rotation sign (-sin at even lanes, +sin at odd), so a kernel applies
    rotary as ``x * cos + swap(x) * sin`` — a pure multiply-add over a
    pairwise lane swap.  Shapes: ``(N, n_head * Dh)`` / ``(N, n_kv_head *
    Dh)``.
    """
    cs = pairs[..., 0].astype(jnp.float32)  # (N, Dh/2)
    sn = pairs[..., 1].astype(jnp.float32)
    n, half = cs.shape
    cos_i = jnp.repeat(cs, 2, axis=-1)  # (N, Dh)
    sin_i = jnp.stack([-sn, sn], axis=-1).reshape(n, 2 * half)
    return (
        jnp.tile(cos_i, (1, n_head)),
        jnp.tile(sin_i, (1, n_head)),
        jnp.tile(cos_i, (1, n_kv_head)),
        jnp.tile(sin_i, (1, n_kv_head)),
    )


def head_segment_masks(n_heads: int, head_dim: int):
    """``(n_heads * head_dim, n_heads)`` block mask (kron of eye with a
    ones column) plus its transpose: per-head segment reductions over a
    head-concatenated lane axis run as single MXU matmuls against these."""
    seg = np.kron(
        np.eye(n_heads, dtype=np.float32),
        np.ones((head_dim, 1), np.float32),
    )
    return jnp.asarray(seg), jnp.asarray(seg.T)
