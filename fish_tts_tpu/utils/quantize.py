"""Weight-only int8 quantization for the decode hot path.

Single-stream autoregressive decode on TPU is HBM-bandwidth-bound: every
frame streams the full LM (~1.4 GB bf16 at S1-mini shapes, the fast stack 10x
over).  Storing matmul weights as int8 with per-output-channel scales halves
that traffic; the MXU consumes the int8 tiles after an in-VMEM upcast that
XLA fuses into the matmul, so arithmetic stays bf16/fp32 and only the HBM
format changes.  This is weight-only quantization — activations, norms,
embedderived scales and all tiny tensors stay in bf16.

No reference equivalent (the reference runs pure bf16 CUDA); opt-in via
``FishTTS(precision="int8")`` or ``quantize_lm_params`` directly.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]

# Keys quantized inside a stacked layer dict (leading layer axis).
_LAYER_MATMUL_KEYS = ("wqkv", "wo", "w1", "w3", "w2")


def quantize_weight(w: jnp.ndarray, axis: int) -> Params:
    """Symmetric per-channel int8: scale over ``axis`` (the contraction dim).

    Returns {"q": int8 same-shape, "s": f32 scale broadcastable to w}.
    """
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "s": scale}


def is_quantized(w) -> bool:
    return isinstance(w, dict) and "q" in w and "s" in w


def qmm(x: jnp.ndarray, w) -> jnp.ndarray:
    """Matmul that accepts plain or quantized weights.

    Plain: ``x @ w``.  Quantized: the int8 tile is upcast in VMEM and the
    per-output-channel scale folds into the product.
    """
    if not is_quantized(w):
        return x @ w
    deq = w["q"].astype(x.dtype)
    out = x @ deq
    # scale: (..., 1, out) -> broadcast over the row dims of out
    s = w["s"]
    return (out.astype(jnp.float32) * jnp.squeeze(s, axis=-2)).astype(x.dtype)


def qgather(table, idx: jnp.ndarray, out_dtype) -> jnp.ndarray:
    """Embedding-row gather that accepts plain or row-quantized tables."""
    if not is_quantized(table):
        return table[idx]
    rows = table["q"][idx].astype(jnp.float32)
    scales = table["s"][idx]  # (..., 1)
    return (rows * scales).astype(out_dtype)


def qhead(h: jnp.ndarray, table) -> jnp.ndarray:
    """Tied LM head against a (possibly row-quantized) embedding table:
    logits[v] = h . emb[v]."""
    if not is_quantized(table):
        return jnp.einsum("btd,vd->btv", h, table)
    logits = jnp.einsum("btd,vd->btv", h, table["q"].astype(h.dtype))
    return (logits.astype(jnp.float32) * table["s"][:, 0]).astype(h.dtype)


def _quantize_layer_stack(stack: Params) -> Params:
    out = dict(stack)
    for k in _LAYER_MATMUL_KEYS:
        # stacked (L, in, out): scale over the contraction (in) axis
        out[k] = quantize_weight(stack[k], axis=1)
    return out


def quantize_lm_params(params: Params) -> Params:
    """Quantize the DualAR decode hot path.

    Quantized: both layer stacks' matmuls, the fast output head, the tied
    embedding table (per-row, shared by gather + LM head), and the codebook
    embedding table (per-row).  Everything else (norms, rope, biases,
    fast_project_in) stays as-is.
    """
    out = dict(params)
    out["layers"] = _quantize_layer_stack(params["layers"])
    out["fast_layers"] = _quantize_layer_stack(params["fast_layers"])
    out["fast_output"] = quantize_weight(params["fast_output"], axis=0)
    out["embeddings"] = quantize_weight(params["embeddings"], axis=1)
    out["fast_embeddings"] = quantize_weight(params["fast_embeddings"], axis=1)
    out["codebook_embeddings"] = quantize_weight(params["codebook_embeddings"], axis=1)
    if "output" in params:
        out["output"] = quantize_weight(params["output"], axis=0)
    return out


def quantized_bytes(params: Params) -> int:
    import numpy as np

    total = 0
    for leaf in jax.tree_util.tree_leaves(params):
        total += leaf.size * leaf.dtype.itemsize
    return total
