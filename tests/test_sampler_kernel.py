"""Fused slow-token sampler kernel (interpret mode, tiny vocab).

With unpadded logits the kernel consumes the SAME per-slot Gumbel rows as
the XLA threshold sampler, so it must sample bit-identically — switching
the kernel on/off can never change a generation.
"""

import jax
import jax.numpy as jnp
import numpy as np

from fish_tts_tpu.engine import sampling
from fish_tts_tpu.ops import sampler_kernel as sk

V = 96


def _keys(n, seed=7):
    return jax.vmap(
        lambda i: jax.random.fold_in(jax.random.PRNGKey(seed), i)
    )(jnp.arange(n))


def test_matches_xla_threshold_sampler_exactly():
    """Same keys, same logits, same params -> same token as
    sampling.sample(top_k=-1) for every row."""
    B = 4
    rng = jax.random.PRNGKey(1)
    logits = jax.random.normal(rng, (B, V), jnp.float32) * 4.0
    prev = jax.random.randint(jax.random.PRNGKey(2), (B, 5), 0, V)
    keys = _keys(B)
    for t, p, r in ((0.7, 0.8, 1.1), (1.3, 0.5, 1.5), (0.9, 1.0, 1.0)):
        got = sk.sample_slow(
            keys, logits, prev, jnp.float32(t), jnp.float32(p),
            jnp.float32(r), vocab=V, interpret=True,
        )
        want = sampling.sample(
            keys, logits, jnp.float32(t), jnp.float32(p), jnp.float32(r),
            prev_idx=prev, top_k=-1,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_padded_vocab_never_sampled():
    """Padded head lanes (>= vocab) are masked out even when their raw
    logits are huge."""
    B, Vp = 2, 128
    logits = jnp.full((B, Vp), -1.0, jnp.float32)
    logits = logits.at[:, V:].set(50.0)  # poison the padding
    logits = logits.at[:, 3].set(5.0)
    toks = sk.sample_slow(
        _keys(B), logits, jnp.zeros((B, 1), jnp.int32),
        jnp.float32(0.7), jnp.float32(0.8), jnp.float32(1.0),
        vocab=V, interpret=True,
    )
    assert (np.asarray(toks) < V).all()


def test_penalty_changes_argmax():
    """A strongly-penalized previous token loses to the runner-up at tiny
    temperature (deterministic check of the penalty formula wiring)."""
    B = 1
    logits = jnp.zeros((B, V), jnp.float32).at[0, 10].set(4.0).at[0, 20].set(3.9)
    prev = jnp.full((B, 4), 10, jnp.int32)
    tok = sk.sample_slow(
        _keys(B, seed=3), logits, prev,
        jnp.float32(1e-4), jnp.float32(0.5), jnp.float32(1.8),
        vocab=V, interpret=True,
    )
    assert int(tok[0]) == 20  # 4.0/1.8 = 2.2 < 3.9


def test_per_slot_noise_is_cotenant_invariant():
    """Row b's sample depends only on keys[b]: a batched call equals
    per-row solo calls (the continuous-batching invariance)."""
    B = 3
    logits = jax.random.normal(jax.random.PRNGKey(4), (B, V), jnp.float32) * 3
    prev = jax.random.randint(jax.random.PRNGKey(5), (B, 5), 0, V)
    keys = _keys(B, seed=11)
    batched = np.asarray(sk.sample_slow(
        keys, logits, prev, jnp.float32(0.8), jnp.float32(0.8),
        jnp.float32(1.2), vocab=V, interpret=True,
    ))
    for b in range(B):
        solo = sk.sample_slow(
            keys[b:b + 1], logits[b:b + 1], prev[b:b + 1],
            jnp.float32(0.8), jnp.float32(0.8), jnp.float32(1.2),
            vocab=V, interpret=True,
        )
        assert batched[b] == int(solo[0])


def test_sampled_tokens_in_nucleus():
    """Every sample is a member of the exact reference nucleus."""
    B = 2
    logits = jax.random.normal(jax.random.PRNGKey(6), (B, V), jnp.float32) * 4
    top_p = 0.7
    for seed in range(4):
        toks = np.asarray(sk.sample_slow(
            _keys(B, seed=100 + seed), logits, jnp.zeros((B, 1), jnp.int32),
            jnp.float32(0.8), jnp.float32(top_p), jnp.float32(1.0),
            vocab=V, interpret=True,
        ))
        for b in range(B):
            probs = np.asarray(sampling.logits_to_probs_exact(
                logits[b], jnp.float32(0.8), jnp.float32(top_p),
                jnp.float32(1.0),
            ))
            assert probs[toks[b]] > 0, f"row {b}: {toks[b]} outside nucleus"
