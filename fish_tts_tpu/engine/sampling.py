"""On-device sampling: repetition penalty + top-p + Gumbel-max.

Re-designs the reference sampler (/root/reference/fish_tts/models/inference.py:24-80)
for TPU:

- The reference sorts the *full* vocab (155k logits) every step
  (inference.py:48).  Here the default path takes ``lax.top_k(k=1024)`` and
  normalizes with a full-vocab ``logsumexp`` so cumulative probabilities are
  exactly the full-softmax values; the result is bit-identical to a full sort
  whenever the nucleus fits inside the top-k (with TTS's peaked distributions
  and top_p<=0.95, always).  ``top_k=0`` selects the exact full-sort path.
- The reference's exponential-race multinomial (inference.py:24-27) is an
  argmax-Gumbel trick; we sample with ``jax.random.gumbel`` directly —
  identical distribution, no host sync.

Replicated quirks (documented in SURVEY §7):
- repetition penalty divides positive / multiplies negative scores
  (inference.py:42-44),
- the "keep at least one" rule keeps only the single top logit
  (inference.py:53),
- the penalty window may contain zero-padding early in decode; penalizing
  token id 0 in that case is reference behavior (inference.py:187-191).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def _gumbel_rows(key: jax.Array, shape: tuple[int, ...]) -> jnp.ndarray:
    """Gumbel noise for a (B, V) draw from either ONE key (all rows from a
    single stream of bits — the batch-static path) or a batch of keys (row
    ``b`` drawn from ``key[b]`` alone — the per-slot path, where a stream's
    noise must not depend on its co-tenants or slot count)."""
    single = (
        key.ndim == 0
        if jnp.issubdtype(key.dtype, jax.dtypes.prng_key)
        else key.ndim == 1
    )
    if single:
        return jax.random.gumbel(key, shape, jnp.float32)
    assert key.shape[0] == shape[0], (key.shape, shape)
    return jax.vmap(
        lambda k: jax.random.gumbel(k, shape[1:], jnp.float32)
    )(key)


def apply_repetition_penalty(
    logits: jnp.ndarray,  # (B, V) float
    prev_idx: jnp.ndarray,  # (B, W) int32 token indices
    penalty: jnp.ndarray,  # scalar
) -> jnp.ndarray:
    """Penalize previously-emitted tokens (reference inference.py:39-45).

    Duplicate indices resolve to the same penalized value, so scatter order
    does not matter.
    """
    score = jnp.take_along_axis(logits, prev_idx, axis=-1)
    penalized = jnp.where(score < 0, score * penalty, score / penalty)
    b_idx = jnp.arange(logits.shape[0])[:, None]
    return logits.at[b_idx, prev_idx].set(penalized)


def top_p_gumbel_sample(
    key: jax.Array,
    logits: jnp.ndarray,  # (B, V) float
    temperature: jnp.ndarray,  # scalar
    top_p: jnp.ndarray,  # scalar
    top_k: int = 0,
    approx: bool = False,
) -> jnp.ndarray:
    """Nucleus sampling; returns (B,) int32 token ids.

    Follows the reference ordering exactly (inference.py:47-61): top-p mask is
    computed on *unscaled* logits; temperature is applied after masking.

    ``approx=True`` uses the TPU-native ``lax.approx_max_k`` (tiled binning,
    much faster than an exact sort over a 150k vocab) for the candidate set;
    the full-vocab logsumexp normalizer keeps cumulative probabilities exact
    over whatever candidates are returned.
    """
    logits = logits.astype(jnp.float32)
    V = logits.shape[-1]
    if top_k > 0 and top_k < V:
        z = jax.nn.logsumexp(logits, axis=-1, keepdims=True)  # full-vocab normalizer
        if approx:
            vals, idx = jax.lax.approx_max_k(
                logits, top_k, recall_target=0.99, aggregate_to_topk=True
            )
        else:
            vals, idx = jax.lax.top_k(logits, top_k)  # sorted desc
    else:
        vals, idx = jax.lax.top_k(logits, V)
        z = jax.nn.logsumexp(vals, axis=-1, keepdims=True)

    probs = jnp.exp(vals - z)
    cum = jnp.cumsum(probs, axis=-1)
    remove = cum > top_p
    remove = remove.at[..., 0].set(False)  # keep at least the argmax
    masked = jnp.where(remove, _NEG_INF, vals)

    scaled = masked / jnp.clip(temperature, 1e-5)
    g = _gumbel_rows(key, scaled.shape)
    choice = jnp.argmax(scaled + g, axis=-1)  # (B,)
    return jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0].astype(jnp.int32)


def top_p_threshold_mask(
    logits: jnp.ndarray,  # (B, V) float32
    top_p: jnp.ndarray,
    iters: int = 40,
) -> jnp.ndarray:
    """Exact nucleus membership without any sort.

    For DISTINCT logits the sorted-cumsum rule "keep i iff cum_i <= top_p
    or i is the argmax" (inference.py:48-57) is equivalent to a *threshold*
    rule: with ``g(l) = sum of softmax mass at logits >= l`` (monotone
    decreasing), token i is kept iff ``g(l_i) <= top_p``.  The kept set is
    then an upper level set ``{l_i >= tau*}``, and ``tau*`` is found by
    bisection — ``iters`` masked reductions over the vocab instead of a
    155k-entry sort.  40 iterations over a <=30-logit bracket resolve far
    below float32 resolution.

    Tie semantics (documented deviation): a group of EQUAL logits straddling
    the nucleus boundary is kept or dropped as a whole (a level set cannot
    split it), whereas the reference's sort keeps an arbitrary-order prefix
    of the group.  E.g. p = (.5, .25, .25) with top_p=0.6: the sort keeps
    {argmax, one of the ties}; this rule keeps {argmax} alone, because
    including the tie group overshoots 0.6.  For continuous logits ties at
    the exact boundary have measure zero; both rules always keep the argmax
    and never keep anything past the reference's cut+group.
    """
    z = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - z)
    amax = jnp.max(logits, axis=-1, keepdims=True)
    # mass({l >= amax - 30}) ~ 1 (the excluded tail is < V * e^-30) and
    # mass({l > amax}) = 0, so [amax-30, amax+1] brackets tau*.
    lo = amax - 30.0
    hi = amax + 1.0

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        mass = jnp.sum(jnp.where(logits >= mid, p, 0.0), axis=-1, keepdims=True)
        take_hi = mass <= top_p
        return jnp.where(take_hi, lo, mid), jnp.where(take_hi, mid, hi)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    keep = (logits >= hi) | (logits >= amax)  # argmax always survives
    return jnp.where(top_p >= 1.0, jnp.ones_like(keep), keep)


def top_p_threshold_sample(
    key: jax.Array,
    logits: jnp.ndarray,  # (B, V) float
    temperature: jnp.ndarray,
    top_p: jnp.ndarray,
) -> jnp.ndarray:
    """Nucleus sampling with the sort-free threshold mask: full-vocab
    membership with no candidate truncation, at a fraction of the cost of
    ``lax.top_k`` over a 155k vocab (equal to the sort rule except for
    boundary tie groups — see :func:`top_p_threshold_mask`)."""
    logits = logits.astype(jnp.float32)
    keep = top_p_threshold_mask(logits, top_p)
    masked = jnp.where(keep, logits, _NEG_INF)
    scaled = masked / jnp.clip(temperature, 1e-5)
    g = _gumbel_rows(key, logits.shape)
    return jnp.argmax(scaled + g, axis=-1).astype(jnp.int32)


def sample(
    key: jax.Array,
    logits: jnp.ndarray,  # (B, V)
    temperature: jnp.ndarray,
    top_p: jnp.ndarray,
    repetition_penalty: jnp.ndarray,
    prev_idx: jnp.ndarray | None = None,  # (B, W) or None
    top_k: int = 0,
    approx: bool = False,
) -> jnp.ndarray:
    """Full sampling step (reference ``sample``, inference.py:64-80).

    ``top_k = -1`` selects the sort-free threshold path (exact full-vocab
    top-p, no truncation); ``top_k = 0`` the exact full sort; ``top_k > 0``
    the truncated candidate search.  ``approx`` only applies to the
    truncated search (``top_k > 0``) — the exact modes have no candidate
    set to approximate.

    ``key`` may be one key (batch-static noise stream) or a (B,)-shaped key
    batch (row b's noise depends only on key[b] — required by continuous
    batching, where a stream's samples must be invariant to co-tenants).
    """
    if prev_idx is not None:
        logits = apply_repetition_penalty(
            logits.astype(jnp.float32), prev_idx, repetition_penalty
        )
    if top_k == -1:
        return top_p_threshold_sample(key, logits, temperature, top_p)
    return top_p_gumbel_sample(
        key, logits, temperature, top_p, top_k=top_k, approx=approx
    )


def logits_to_probs_exact(
    logits: jnp.ndarray,  # (V,)
    temperature: jnp.ndarray,
    top_p: jnp.ndarray,
    repetition_penalty: jnp.ndarray,
    prev_idx: jnp.ndarray | None = None,  # (W,)
) -> jnp.ndarray:
    """Reference-parity probability computation for testing
    (inference.py:30-61): returns the post-top-p softmax distribution."""
    logits = logits.astype(jnp.float32)
    if prev_idx is not None:
        score = logits[prev_idx]
        penalized = jnp.where(score < 0, score * repetition_penalty, score / repetition_penalty)
        logits = logits.at[prev_idx].set(penalized)
    order = jnp.argsort(-logits)
    sorted_logits = logits[order]
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits), axis=-1)
    remove_sorted = cum > top_p
    remove_sorted = remove_sorted.at[0].set(False)
    remove = jnp.zeros_like(remove_sorted).at[order].set(remove_sorted)
    logits = jnp.where(remove, _NEG_INF, logits)
    logits = logits / jnp.clip(temperature, 1e-5)
    return jax.nn.softmax(logits)
