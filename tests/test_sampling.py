"""Sampler tests: top-p semantics, repetition penalty, distribution checks
(reference contract: inference.py:24-80)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_tts_tpu.engine.sampling import (
    apply_repetition_penalty,
    logits_to_probs_exact,
    sample,
    top_p_gumbel_sample,
)


def test_repetition_penalty_signs():
    logits = jnp.array([[2.0, -2.0, 1.0, 0.5]])
    prev = jnp.array([[0, 1]])
    out = apply_repetition_penalty(logits, prev, jnp.float32(2.0))
    # positive scores divided, negative multiplied (inference.py:42-44)
    np.testing.assert_allclose(out[0, 0], 1.0)
    np.testing.assert_allclose(out[0, 1], -4.0)
    np.testing.assert_allclose(out[0, 2], 1.0)


def test_repetition_penalty_duplicate_indices_deterministic():
    logits = jnp.array([[3.0, 1.0]])
    prev = jnp.array([[0, 0, 0]])
    out = apply_repetition_penalty(logits, prev, jnp.float32(1.5))
    np.testing.assert_allclose(out[0, 0], 2.0)


def test_top_p_keeps_only_nucleus():
    # One dominant logit: top_p=0.5 must always return it.
    logits = jnp.array([[10.0, 0.0, 0.0, 0.0]])
    for seed in range(20):
        tok = top_p_gumbel_sample(
            jax.random.PRNGKey(seed), logits, jnp.float32(1.0), jnp.float32(0.5)
        )
        assert int(tok[0]) == 0


def test_top_p_one_keeps_everything():
    logits = jnp.zeros((1, 8))
    seen = set()
    for seed in range(200):
        tok = top_p_gumbel_sample(
            jax.random.PRNGKey(seed), logits, jnp.float32(1.0), jnp.float32(1.0)
        )
        seen.add(int(tok[0]))
    assert len(seen) == 8  # uniform sampling reaches all tokens


def test_top_k_truncation_matches_full_sort():
    """With the nucleus inside top-k, the truncated path samples the same
    distribution as the exact full-sort path."""
    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (1, 512)) * 3.0
    for seed in range(50):
        k = jax.random.PRNGKey(1000 + seed)
        exact = top_p_gumbel_sample(k, logits, jnp.float32(0.7), jnp.float32(0.8), top_k=0)
        trunc = top_p_gumbel_sample(k, logits, jnp.float32(0.7), jnp.float32(0.8), top_k=64)
        assert int(exact[0]) == int(trunc[0])


def test_sampled_distribution_matches_exact_probs():
    """Empirical frequencies track logits_to_probs_exact."""
    logits_1d = jnp.array([2.0, 1.0, 0.0, -1.0, -30.0])
    probs = np.asarray(
        logits_to_probs_exact(
            logits_1d, jnp.float32(0.9), jnp.float32(0.95), jnp.float32(1.0)
        )
    )
    counts = np.zeros(5)
    n = 3000
    keys = jax.random.split(jax.random.PRNGKey(42), n)
    sample_fn = jax.jit(
        lambda k: top_p_gumbel_sample(
            k, logits_1d[None], jnp.float32(0.9), jnp.float32(0.95)
        )
    )
    for k in keys:
        counts[int(sample_fn(k)[0])] += 1
    freqs = counts / n
    np.testing.assert_allclose(freqs, probs, atol=0.03)


def test_sample_with_window_penalty():
    logits = jnp.array([[5.0, 4.9, 0.0, 0.0]])
    prev = jnp.array([[0, 0]])
    # Penalizing token 0 hard should flip the argmax to token 1.
    tok = sample(
        jax.random.PRNGKey(0), logits, jnp.float32(0.1), jnp.float32(0.1),
        jnp.float32(1.9), prev_idx=prev,
    )
    assert int(tok[0]) == 1


def test_approx_top_k_recalls_nucleus_on_peaked_dist():
    """The opt-in ``approx=True`` path (lax.approx_max_k, recall 0.99) must
    still recover the nucleus on TTS-like peaked distributions: every sampled
    token has to be a member of the exact top-p candidate set."""
    key = jax.random.PRNGKey(3)
    # peaked: a few dominant logits over a 4096 vocab
    logits = jax.random.normal(key, (1, 4096)) * 0.5
    logits = logits.at[0, 17].add(8.0).at[0, 99].add(7.0).at[0, 1234].add(6.5)
    probs = np.asarray(
        logits_to_probs_exact(
            logits[0], jnp.float32(0.7), jnp.float32(0.8), jnp.float32(1.0)
        )
    )
    nucleus = set(np.nonzero(probs)[0].tolist())
    for seed in range(50):
        tok = top_p_gumbel_sample(
            jax.random.PRNGKey(500 + seed), logits,
            jnp.float32(0.7), jnp.float32(0.8), top_k=64, approx=True,
        )
        assert int(tok[0]) in nucleus


def test_approx_top_k_matches_exact_on_flat_dist():
    """Flat distributions are the hard case for approximate top-k: with the
    same key, the approx path must sample a token the exact truncated path
    also considers valid (a top-k member)."""
    logits = jax.random.normal(jax.random.PRNGKey(4), (1, 2048)) * 0.1
    exact_topk = set(np.asarray(jax.lax.top_k(logits, 256)[1])[0].tolist())
    for seed in range(30):
        tok = top_p_gumbel_sample(
            jax.random.PRNGKey(900 + seed), logits,
            jnp.float32(1.0), jnp.float32(0.95), top_k=256, approx=True,
        )
        assert int(tok[0]) in exact_topk


def test_engine_default_is_exact_top_k():
    """approx_top_k ships off by default (it can miss nucleus members)."""
    from fish_tts_tpu.config import EngineConfig

    assert EngineConfig().approx_top_k is False


def test_exact_probs_nucleus_boundary():
    """Token exactly crossing top_p is removed; first survivor stays."""
    logits = jnp.array([0.0, 0.0, 0.0, 0.0])
    probs = np.asarray(
        logits_to_probs_exact(
            logits, jnp.float32(1.0), jnp.float32(0.5), jnp.float32(1.0)
        )
    )
    # uniform 0.25 each; cumsum 0.25, 0.5, 0.75, 1.0; remove where cum > 0.5
    assert np.count_nonzero(probs) == 2
    np.testing.assert_allclose(probs[probs > 0], 0.5)


def test_default_sampler_is_exact_threshold_path():
    """The engine default is the sort-free threshold sampler (-1): exact
    full-vocab top-p, no candidate truncation at all.  The k=512 truncated
    path stays available and covers a peaked 155k-vocab nucleus (std-4
    Gaussian logits keep the top_p=0.8 nucleus near 400)."""
    from fish_tts_tpu.config import EngineConfig

    assert EngineConfig().sample_top_k == -1
    k_default = 512
    logits = jax.random.normal(jax.random.PRNGKey(11), (155776,)) * 4.0
    probs = np.asarray(
        logits_to_probs_exact(
            logits, jnp.float32(0.7), jnp.float32(0.8), jnp.float32(1.0)
        )
    )
    nucleus_size = int((probs > 0).sum())
    assert nucleus_size < k_default, nucleus_size
    # truncated sampler agrees with the exact full sort under the same key
    l2 = logits[None]
    for seed in range(10):
        k = jax.random.PRNGKey(2000 + seed)
        exact = top_p_gumbel_sample(k, l2, jnp.float32(0.7), jnp.float32(0.8), top_k=0)
        trunc = top_p_gumbel_sample(
            k, l2, jnp.float32(0.7), jnp.float32(0.8), top_k=k_default
        )
        assert int(exact[0]) == int(trunc[0])


def test_threshold_mask_equals_sorted_nucleus():
    """The sort-free threshold mask must select exactly the sorted-cumsum
    nucleus (reference inference.py:48-57) across spreads and top_p values."""
    from fish_tts_tpu.engine.sampling import top_p_threshold_mask

    for seed, std in ((0, 0.5), (1, 2.0), (2, 4.0), (3, 8.0)):
        for tp in (0.3, 0.8, 0.95):
            logits = jax.random.normal(jax.random.PRNGKey(seed), (4096,)) * std
            probs = np.asarray(
                logits_to_probs_exact(
                    logits, jnp.float32(0.7), jnp.float32(tp), jnp.float32(1.0)
                )
            )
            expected = probs > 0
            got = np.asarray(
                top_p_threshold_mask(logits[None].astype(jnp.float32),
                                     jnp.float32(tp))
            )[0]
            np.testing.assert_array_equal(got, expected, err_msg=f"{std=} {tp=}")


def test_threshold_mask_top_p_one_keeps_all():
    from fish_tts_tpu.engine.sampling import top_p_threshold_mask

    logits = jax.random.normal(jax.random.PRNGKey(5), (1, 512)) * 3.0
    mask = np.asarray(top_p_threshold_mask(logits, jnp.float32(1.0)))
    assert mask.all()


def test_threshold_sample_distribution_matches_exact():
    """Threshold-path empirical frequencies track the exact distribution."""
    from fish_tts_tpu.engine.sampling import top_p_threshold_sample

    logits_1d = jnp.array([2.0, 1.0, 0.0, -1.0, -30.0])
    probs = np.asarray(
        logits_to_probs_exact(
            logits_1d, jnp.float32(0.9), jnp.float32(0.95), jnp.float32(1.0)
        )
    )
    counts = np.zeros(5)
    n = 3000
    fn = jax.jit(lambda k: top_p_threshold_sample(
        k, logits_1d[None], jnp.float32(0.9), jnp.float32(0.95)))
    for k in jax.random.split(jax.random.PRNGKey(7), n):
        counts[int(fn(k)[0])] += 1
    np.testing.assert_allclose(counts / n, probs, atol=0.03)


def test_per_stream_param_columns_match_scalar_rows():
    """(B, 1) sampling-param columns are row-exact with per-scalar calls:
    batched sample() with params [a, b] must reproduce row 0 of a scalar-a
    run and row 1 of a scalar-b run (same key => same Gumbel rows)."""
    from fish_tts_tpu.engine.sampling import sample

    key = jax.random.PRNGKey(7)
    logits = jax.random.normal(jax.random.PRNGKey(8), (2, 256)) * 3.0
    prev = jnp.asarray([[3, 5, 9], [1, 2, 3]], jnp.int32)

    def run(t, p, r):
        return np.asarray(sample(
            key, logits, t, p, r, prev_idx=prev, top_k=-1,
        ))

    vec = run(jnp.asarray([[0.6], [1.3]]), jnp.asarray([[0.5], [0.9]]),
              jnp.asarray([[1.1], [1.4]]))
    row0 = run(jnp.float32(0.6), jnp.float32(0.5), jnp.float32(1.1))
    row1 = run(jnp.float32(1.3), jnp.float32(0.9), jnp.float32(1.4))
    assert vec[0] == row0[0]
    assert vec[1] == row1[1]


def test_per_stream_param_columns_top_k_path():
    """Same row-exactness through the truncated top-k candidate path."""
    from fish_tts_tpu.engine.sampling import sample

    key = jax.random.PRNGKey(9)
    logits = jax.random.normal(jax.random.PRNGKey(10), (2, 256)) * 3.0

    def run(t, p):
        return np.asarray(sample(
            key, logits, t, p, jnp.float32(1.0), prev_idx=None, top_k=64,
        ))

    vec = run(jnp.asarray([[0.6], [1.3]]), jnp.asarray([[0.5], [0.9]]))
    row0 = run(jnp.float32(0.6), jnp.float32(0.5))
    row1 = run(jnp.float32(1.3), jnp.float32(0.9))
    assert vec[0] == row0[0]
    assert vec[1] == row1[1]


def test_threshold_mask_tie_group_all_or_none():
    """Documented deviation: a tie group straddling the nucleus boundary is
    kept or dropped as a WHOLE (level-set rule), never split into an
    arbitrary-order prefix like the reference's sort."""
    from fish_tts_tpu.engine.sampling import top_p_threshold_mask

    # p = (.5, .25, .25); top_p = 0.6: including the tie group overshoots,
    # so only the argmax survives (the sort would keep argmax + one tie)
    logits = jnp.log(jnp.asarray([[0.5, 0.25, 0.25]], jnp.float32))
    keep = np.asarray(top_p_threshold_mask(logits, jnp.float32(0.6)))
    assert keep.tolist() == [[True, False, False]]
    # p = (.5, .2, .2, .1), top_p = 0.95: mass at the tie level is 0.9
    # <= 0.95, so the whole group is admitted (but not the 0.1 tail)
    logits4 = jnp.log(jnp.asarray([[0.5, 0.2, 0.2, 0.1]], jnp.float32))
    keep = np.asarray(top_p_threshold_mask(logits4, jnp.float32(0.95)))
    assert keep.tolist() == [[True, True, True, False]]
    # all-equal logits: every token ties with the argmax -> all kept
    flat = jnp.zeros((1, 16), jnp.float32)
    keep = np.asarray(top_p_threshold_mask(flat, jnp.float32(0.5)))
    assert keep.all()
