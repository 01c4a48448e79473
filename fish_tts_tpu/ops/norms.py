"""Normalization and elementwise ops.

TPU notes: these are VPU-bound elementwise ops that XLA fuses into the
surrounding matmuls; they are written with fp32 inner math (matching the
reference RMSNorm, llama.py:164-177, which norms in fp32 then casts back)
so bf16 activations stay stable.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """RMSNorm with fp32 inner math (reference llama.py:164-177)."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    normed = xf * lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return normed.astype(orig_dtype) * weight


def vocoder_rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Vocoder RMSNorm variant: norms in input dtype (reference vocoder.py:94-102
    computes ``x * rsqrt(mean(x*x))`` without the fp32 upcast)."""
    normed = x * lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
    return normed.astype(x.dtype) * weight


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Standard LayerNorm over the last axis (vocoder ConvNeXt blocks,
    reference vocoder.py:657)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    normed = (xf - mean) * lax.rsqrt(var + eps)
    return normed.astype(x.dtype) * weight + bias


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return x * lax.logistic(x)


def snake(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Snake activation ``x + sin^2(alpha*x)/alpha`` used throughout the codec
    (dac.nn.layers.Snake1d, referenced at vocoder.py:20).  ``x`` is
    channels-first ``(B, C, T)``; ``alpha`` has shape ``(1, C, 1)``."""
    s = jnp.sin(alpha * x)
    return x + (s * s) / (alpha + 1e-9)
