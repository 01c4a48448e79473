"""Rotary position embeddings.

Matches the reference numerics exactly (llama.py:594-618): the cos/sin table is
computed in fp32, stored in bf16, and rotation is applied in fp32 on
``(..., pairs, 2)`` interleaved real/imag pairs, then cast back to the input
dtype.  Keeping the bf16 table round-trip is deliberate — it is what the
reference checkpoints were sampled with.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def precompute_freqs_cis(
    seq_len: int, n_elem: int, base: float = 10000.0, dtype=jnp.bfloat16
) -> jnp.ndarray:
    """Return ``(seq_len, n_elem//2, 2)`` table of (cos, sin) pairs."""
    freqs = 1.0 / (
        base ** (np.arange(0, n_elem, 2)[: n_elem // 2].astype(np.float32) / n_elem)
    )
    t = np.arange(seq_len, dtype=np.float32)
    angles = np.outer(t, freqs)  # (seq_len, n_elem//2)
    table = np.stack([np.cos(angles), np.sin(angles)], axis=-1)
    return jnp.asarray(table, dtype=dtype)


def apply_rotary_emb(x: jnp.ndarray, freqs_cis: jnp.ndarray) -> jnp.ndarray:
    """Rotate ``x`` of shape ``(B, S, H, D)`` by ``freqs_cis`` already gathered
    at the right positions: shape ``(S, D//2, 2)`` (shared across batch) or
    ``(B, S, D//2, 2)`` (per-stream positions)."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32).reshape(*x.shape[:-1], -1, 2)
    fc = freqs_cis.astype(jnp.float32)
    if fc.ndim == 3:  # (S, D/2, 2) -> (1, S, 1, D/2, 2)
        fc = fc.reshape(1, fc.shape[0], 1, fc.shape[1], 2)
    else:  # (B, S, D/2, 2) -> (B, S, 1, D/2, 2)
        fc = fc.reshape(fc.shape[0], fc.shape[1], 1, fc.shape[2], 2)
    cos, sin = fc[..., 0], fc[..., 1]
    xr, xi = xf[..., 0], xf[..., 1]
    out = jnp.stack([xr * cos - xi * sin, xi * cos + xr * sin], axis=-1)
    return out.reshape(x.shape).astype(orig_dtype)
