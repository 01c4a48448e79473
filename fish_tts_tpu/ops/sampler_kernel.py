"""Pallas slow-token sampler: penalty + exact top-p + Gumbel argmax.

The slow-token sample over the 155k vocab is the last non-kernel stage of
the decode step.  Under XLA the threshold-bisection top-p
(engine/sampling.top_p_threshold_mask) makes ~40 masked reductions over the
(B, V) logits plus a full-vocab Gumbel draw — each pass re-touching HBM and
re-materializing (B, V) intermediates.  This kernel runs the whole sampler
in one ``pallas_call`` with the logits VMEM-resident:

1. mask padded vocab lanes (the fused LM head emits HEAD_TILE-aligned rows),
2. repetition penalty over the (1+K)-entry window column (reference
   inference.py:39-45: divide positive / multiply negative scores; the
   window may contain zeros early in decode — penalizing token id 0 then is
   reference behavior),
3. exact sort-free top-p: the nucleus is the upper level set
   ``{logit >= tau*}`` with ``tau*`` found by bisection over the softmax
   mass (identical set to the reference's sort+cumsum, inference.py:47-57;
   the argmax always survives),
4. temperature, then Gumbel-max over the masked logits.

Gumbel noise is drawn OUTSIDE with the engine's per-slot keys (one
``jax.random.gumbel`` row per slot, exactly like the XLA sampler path) and
passed in — a stream's noise depends only on its own key, never on
co-tenants or batch size (the continuous-batching invariance).  The win is
the bisection: 40 masked reductions run against VMEM-resident logits
instead of XLA re-materializing (B, V) intermediates per pass.

No reference analog: the reference sorts the full vocab on every step
(inference.py:48).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = dict[str, Any]

_NEG = -1e30

MAX_BATCH = 16
BISECT_ITERS = 40


def _make_kernel(batch: int, vocab: int, vocab_padded: int, window: int):
    B = batch
    V = vocab
    Vp = vocab_padded
    W = window

    def kernel(prev_ref, logits_ref, gumbel_ref,
               temp_ref, top_p_ref, rep_ref, out_ref):
        v_iota = jax.lax.broadcasted_iota(jnp.int32, (B, Vp), 1)
        logits = logits_ref[...].astype(jnp.float32)
        logits = jnp.where(v_iota < V, logits, _NEG)  # mask head padding

        # repetition penalty over each row's window column
        # (reference inference.py:39-45)
        rep = rep_ref[...]  # (B, 1)
        # int32 accumulator: Mosaic cannot materialize a (B, Vp) i1 zeros
        # vector (i8->i1 trunci is unsupported at this width)
        nhit = jnp.zeros((B, Vp), jnp.int32)
        for w in range(W):
            nhit = nhit + (v_iota == prev_ref[:, w:w + 1]).astype(jnp.int32)
        hit = (nhit > 0) & (v_iota < V)
        logits = jnp.where(
            hit, jnp.where(logits < 0, logits * rep, logits / rep), logits
        )

        # exact top-p as an upper level set: bisection for tau*
        # (same math as engine/sampling.top_p_threshold_mask)
        z = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - z)  # (B, Vp); padded lanes contribute 0
        amax = jnp.max(logits, axis=-1, keepdims=True)
        lo = amax - 30.0
        hi = amax + 1.0

        def body(_, carry):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            mass = jnp.sum(jnp.where(logits >= mid, p, 0.0),
                           axis=-1, keepdims=True)
            take_hi = mass <= top_p_ref[...]
            return jnp.where(take_hi, lo, mid), jnp.where(take_hi, mid, hi)

        lo, hi = jax.lax.fori_loop(0, BISECT_ITERS, body, (lo, hi))
        # keep iff logits >= min(hi, amax)  (== (>= hi) | (== argmax));
        # top_p >= 1 keeps every real lane: the threshold drops strictly
        # above the _NEG padding floor.  Float threshold instead of a bool
        # select — Mosaic cannot select between (B, Vp) i1 vectors.
        thresh = jnp.minimum(hi, amax)
        thresh = jnp.where(top_p_ref[...] >= 1.0, 0.5 * _NEG, thresh)
        masked = jnp.where(logits >= thresh, logits, _NEG)
        scaled = masked / jnp.maximum(temp_ref[...], 1e-5)

        choice = jnp.argmax(scaled + gumbel_ref[...], axis=-1)
        out_ref[...] = choice[:, None].astype(jnp.int32)

    return kernel


def supports(batch: int, top_k: int) -> bool:
    """The kernel implements exactly the sort-free threshold sampler
    (``top_k == -1``, the engine default); other sampler modes keep XLA."""
    return 1 <= batch <= MAX_BATCH and top_k == -1


@functools.partial(jax.jit, static_argnames=("vocab", "interpret"))
def sample_slow(
    keys: jax.Array,         # (B,) per-slot PRNG keys (this frame's)
    logits: jnp.ndarray,     # (B, Vp) f32 (padded vocab allowed)
    prev_col: jnp.ndarray,   # (B, W) int32 token ids to penalize
    temperature: jnp.ndarray,  # scalar or (B, 1)
    top_p: jnp.ndarray,
    repetition_penalty: jnp.ndarray,
    *,
    vocab: int,              # real vocab size V <= Vp
    interpret: bool = False,
) -> jnp.ndarray:
    """Sample one token id per row.  Returns (B,) int32."""
    B, Vp = logits.shape
    W = prev_col.shape[1]

    def col(x):
        x = jnp.asarray(x, jnp.float32)
        return jnp.broadcast_to(x.reshape(-1, 1), (B, 1))

    gumbel = jax.vmap(
        lambda k: jax.random.gumbel(k, (Vp,), jnp.float32)
    )(keys)

    kernel = _make_kernel(B, vocab, Vp, W)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        prev_col.astype(jnp.int32),
        logits.astype(jnp.float32),
        gumbel,
        col(temperature), col(top_p), col(repetition_penalty),
    )
    return out[:, 0]
