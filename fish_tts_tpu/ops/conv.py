"""Causal 1-D convolution ops for the codec, on XLA.

Re-implements the reference conv semantics (vocoder.py:357-471) with
``lax.conv_general_dilated``:

- ``causal_conv1d``: left-pad ``eff_kernel - stride`` plus the reference's
  extra right-pad to a whole number of frames (vocoder.py:364-370, 415-421),
- ``causal_conv_transpose1d``: full transposed conv then trim
  ``kernel - stride`` from the right (vocoder.py:449-455),
- weight norm is *folded* into plain weights at load time (inference-only
  framework — ``g * v / ||v||`` is a constant), so there is no runtime
  parametrization.

Layouts are channels-first ``(B, C, T)`` / kernels ``(O, I/groups, K)``
matching the torch checkpoints 1:1, with XLA dimension numbers
``("NCH", "OIH", "NCH")`` — XLA lays these out onto the MXU as batched
matmuls over the channel dims.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import lax

_DN = ("NCH", "OIH", "NCH")


def conv1d(
    x: jnp.ndarray,  # (B, C_in, T)
    w: jnp.ndarray,  # (C_out, C_in/groups, K)
    b: jnp.ndarray | None = None,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
    padding: tuple[int, int] = (0, 0),
) -> jnp.ndarray:
    out = lax.conv_general_dilated(
        x.astype(w.dtype),
        w,
        window_strides=(stride,),
        padding=[padding],
        rhs_dilation=(dilation,),
        dimension_numbers=_DN,
        feature_group_count=groups,
    )
    if b is not None:
        out = out + b[None, :, None]
    return out


def extra_padding_for_conv1d(
    length: int, kernel_size: int, stride: int, padding_total: int
) -> int:
    """Right padding so the last window is complete (vocoder.py:364-370)."""
    n_frames = (length - kernel_size + padding_total) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + (kernel_size - padding_total)
    return ideal - length


def causal_conv1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """Causal conv: left-pad ``eff_k - stride``, extra right-pad to full
    frames (reference CausalConvNet.forward, vocoder.py:415-421).

    Shapes are static under jit, so the pad arithmetic is Python-level.
    """
    k = w.shape[-1]
    eff_k = (k - 1) * dilation + 1
    pad = eff_k - stride
    extra = extra_padding_for_conv1d(x.shape[-1], eff_k, stride, pad)
    return conv1d(
        x, w, b, stride=stride, dilation=dilation, groups=groups,
        padding=(pad, extra),
    )


# When True, stride>1 transposed convs use the phase-decomposed lowering
# (one dense conv producing stride*C_out channels, then interleave) instead
# of lhs_dilation.  The dilated form makes the MXU sweep stride-1 zeros
# between real samples unless XLA rewrites it; the phase form computes only
# useful FLOPs by construction.  Both are exactly equivalent (test_vocoder).
PHASE_TRANSPOSE = True


def _conv_transpose1d_dilated(
    x: jnp.ndarray, w: jnp.ndarray, stride: int
) -> jnp.ndarray:
    """Input-dilated conv with the spatially flipped, IO-swapped kernel —
    the textbook XLA lowering of a transposed conv."""
    k = w.shape[-1]
    w_flip = jnp.flip(w, axis=-1).swapaxes(0, 1)  # (C_out, C_in, K)
    return lax.conv_general_dilated(
        x.astype(w.dtype),
        w_flip,
        window_strides=(1,),
        padding=[(k - 1, k - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=_DN,
    )


def _conv_transpose1d_phase(
    x: jnp.ndarray, w: jnp.ndarray, stride: int
) -> jnp.ndarray:
    """Phase-decomposed transposed conv: output phase p (= n mod stride)
    depends only on kernel taps k ≡ p (mod stride), so the whole op is ONE
    dense conv with q = ceil(K/s) taps producing s*C_out channels, followed
    by a depth-to-space interleave.  Identical result to the dilated form,
    but the MXU never multiplies the stride-1 inserted zeros."""
    s = stride
    ci, co, k = w.shape
    t = x.shape[-1]
    q = -(-k // s)
    w_pad = jnp.pad(w, ((0, 0), (0, 0), (0, q * s - k)))
    # w̃[p*co + c, ci, j'] = W[ci, c, p + (q-1-j')*s]
    w_r = w_pad.reshape(ci, co, q, s)
    w_tilde = jnp.flip(w_r, axis=2).transpose(3, 1, 0, 2).reshape(
        s * co, ci, q)
    out2 = lax.conv_general_dilated(
        x.astype(w.dtype),
        w_tilde,
        window_strides=(1,),
        padding=[(q - 1, q - 1)],
        dimension_numbers=_DN,
    )  # (B, s*co, T + q - 1)
    m = t + q - 1
    out = out2.reshape(-1, s, co, m).transpose(0, 2, 3, 1).reshape(
        -1, co, m * s)
    return out[..., : (t - 1) * s + k]


def conv_transpose1d(
    x: jnp.ndarray,  # (B, C_in, T)
    w: jnp.ndarray,  # (C_in, C_out, K) — torch ConvTranspose1d layout
    b: jnp.ndarray | None = None,
    stride: int = 1,
) -> jnp.ndarray:
    """Full transposed conv, output length ``(T-1)*stride + K`` (torch
    semantics)."""
    if stride > 1 and PHASE_TRANSPOSE:
        out = _conv_transpose1d_phase(x, w, stride)
    else:
        out = _conv_transpose1d_dilated(x, w, stride)
    if b is not None:
        out = out + b[None, :, None]
    return out


def causal_conv_transpose1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride: int = 1,
) -> jnp.ndarray:
    """Causal transposed conv: trim ``K - stride`` from the right
    (reference CausalTransConvNet.forward, vocoder.py:449-455)."""
    k = w.shape[-1]
    out = conv_transpose1d(x, w, b, stride=stride)
    trim = k - stride
    if trim > 0:
        out = out[..., :-trim]
    return out


def fold_weight_norm(weight_v: jnp.ndarray, weight_g: jnp.ndarray) -> jnp.ndarray:
    """Fold torch weight_norm parametrization into a plain kernel:
    ``w = g * v / ||v||`` with the norm over all dims except dim 0 (torch
    ``weight_norm(..., dim=0)``, reference vocoder.py:423-424)."""
    v = weight_v.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(v * v, axis=tuple(range(1, v.ndim)), keepdims=True))
    return (weight_g.astype(jnp.float32) * v / norm).astype(weight_v.dtype)
