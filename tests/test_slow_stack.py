"""Pallas slow-stack decode-step kernel tests (interpret mode, tiny config).

The kernel must reproduce dual_ar.slow_forward's single-token decode step:
same hidden state, same new K/V rows, against the same read-only cache.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_tts_tpu.config import TINY_CONFIG
from fish_tts_tpu.engine import decode as decode_mod
from fish_tts_tpu.models import dual_ar
from fish_tts_tpu.models.dual_ar import TokenIds
from fish_tts_tpu.ops import slow_stack
from fish_tts_tpu.utils.quantize import quantize_lm_params

CFG = TINY_CONFIG
IDS = TokenIds(semantic_begin=400, semantic_end=447, im_end=5)
NEG = float(np.finfo(np.float32).min)


@pytest.fixture(scope="module")
def qsetup():
    params = dual_ar.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    qp = quantize_lm_params(params)
    rope = dual_ar.make_rope_tables(CFG)
    # prefill a few positions so the cache has live rows
    state = decode_mod.init_state(qp, CFG, batch=1)
    rng = np.random.RandomState(0)
    prompt = np.zeros((1, 1 + CFG.num_codebooks, 16), np.int32)
    prompt[0, 0, :12] = rng.randint(0, 300, 12)
    state, _ = decode_mod.prefill(
        qp, rope, state, jnp.asarray(prompt), jnp.asarray([12], jnp.int32),
        jax.random.PRNGKey(1), jnp.float32(0.7), jnp.float32(0.8),
        jnp.float32(1.1), cfg=CFG, ids=IDS, kv_bucket=0,
    )
    return qp, rope, state


def _xla_step(qp, rope, state, frame, pos, read_len):
    S = state["kv"]["k"].shape[3]
    R = read_len
    k_pos = jnp.arange(R, dtype=jnp.int32)
    cache_bias = jnp.where(
        k_pos[None, None, None, :] < pos[:, None, None, None], 0.0, NEG
    ).astype(jnp.float32)
    hidden, kv = dual_ar.slow_forward(
        qp, CFG, IDS, rope, frame[:, :, None], pos[:, None], state["kv"],
        cache_bias, jnp.zeros((1, 1, 1, 1), jnp.float32), read_len=R,
    )
    return hidden, kv


def test_slow_stack_matches_xla_step(qsetup):
    qp, rope, state = qsetup
    pos = jnp.asarray([12], jnp.int32)
    frame = jnp.zeros((1, 1 + CFG.num_codebooks), jnp.int32)
    frame = frame.at[0, 0].set(417).at[0, 1].set(17)  # semantic token + code
    R = 32

    hidden_x, kv_x = _xla_step(qp, rope, state, frame, pos, R)

    x_emb = dual_ar.embed_inputs(qp, CFG, IDS, frame[:, :, None])
    hidden_k, new_k, new_v, _ = slow_stack.slow_stack_step(
        qp, CFG, rope["slow"], x_emb[:, 0], state["kv"], pos,
        read_len=R, interpret=True,
    )

    np.testing.assert_allclose(
        np.asarray(hidden_k)[0, 0], np.asarray(hidden_x)[0, -1],
        rtol=2e-3, atol=5e-3,
    )
    # new rows must match what the XLA path scattered at pos
    k_rows_x = np.asarray(kv_x["k"][:, 0, :, 12])  # (L, Hkv, Dh)
    v_rows_x = np.asarray(kv_x["v"][:, 0, :, 12])
    np.testing.assert_allclose(
        np.asarray(new_k)[:, 0, :, 0], k_rows_x, rtol=2e-3, atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(new_v)[:, 0, :, 0], v_rows_x, rtol=2e-3, atol=5e-3
    )


def test_slow_stack_position_mask(qsetup):
    """Rows at and beyond pos must not influence the output: poisoning them
    with huge values changes nothing."""
    qp, rope, state = qsetup
    pos = jnp.asarray([12], jnp.int32)
    frame = jnp.zeros((1, 1 + CFG.num_codebooks), jnp.int32)
    frame = frame.at[0, 0].set(100)
    x_emb = dual_ar.embed_inputs(qp, CFG, IDS, frame[:, :, None])
    R = 32

    clean, _, _, _ = slow_stack.slow_stack_step(
        qp, CFG, rope["slow"], x_emb[:, 0], state["kv"], pos,
        read_len=R, interpret=True,
    )
    poisoned_cache = {
        "k": state["kv"]["k"].at[:, :, :, 12:R].set(1e4),
        "v": state["kv"]["v"].at[:, :, :, 12:R].set(1e4),
    }
    poisoned, _, _, _ = slow_stack.slow_stack_step(
        qp, CFG, rope["slow"], x_emb[:, 0], poisoned_cache, pos,
        read_len=R, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(clean), np.asarray(poisoned), rtol=1e-6, atol=1e-6
    )


def test_decode_chunk_slow_kernel_integration(qsetup):
    """decode_chunk with the Pallas slow path emits valid frames."""
    qp, rope, state0 = qsetup
    state = jax.tree_util.tree_map(jnp.copy, state0)
    t, p, r = jnp.float32(0.7), jnp.float32(0.8), jnp.float32(1.1)
    state, frames, emitted = decode_mod.decode_chunk(
        qp, rope, state, jax.random.PRNGKey(3), t, p, r,
        cfg=CFG, ids=IDS, num_frames=2, top_k=16, kv_bucket=32,
        fast_kernel=True,
    )
    frames = np.asarray(frames)
    assert frames.shape == (1, 2, 1 + CFG.num_codebooks)
    assert (frames >= 0).all()
    assert (frames[:, :, 1] < CFG.codebook_size).all()


def test_supports_gates():
    params = dual_ar.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    qp = quantize_lm_params(params)
    assert slow_stack.supports(CFG, qp, batch=1)
    assert slow_stack.supports(CFG, qp, batch=slow_stack.MAX_BATCH)
    assert not slow_stack.supports(CFG, qp, batch=slow_stack.MAX_BATCH + 1)
    assert not slow_stack.supports(CFG, params, batch=1)


def test_fused_head_logits_match_lm_logits(qsetup):
    """prepare_head + head grid phase must reproduce dual_ar.lm_logits."""
    qp, rope, state = qsetup
    qph = slow_stack.prepare_head(qp, CFG)
    assert "_slow_head" in qph
    pos = jnp.asarray([12], jnp.int32)
    frame = jnp.zeros((1, 1 + CFG.num_codebooks), jnp.int32)
    frame = frame.at[0, 0].set(433).at[0, 1].set(5)
    x_emb = dual_ar.embed_inputs(qph, CFG, IDS, frame[:, :, None])

    hidden, _, _, logits = slow_stack.slow_stack_step(
        qph, CFG, rope["slow"], x_emb[:, 0], state["kv"], pos,
        read_len=32, interpret=True,
    )
    assert logits is not None and logits.shape == (1, CFG.vocab_size)
    ref = np.asarray(dual_ar.lm_logits(qp, CFG, hidden))[0, -1]
    np.testing.assert_allclose(np.asarray(logits)[0], ref, rtol=2e-3, atol=5e-3)
    # argmax (the sampling-critical statistic) must agree
    assert int(np.asarray(logits)[0].argmax()) == int(ref.argmax())


def test_slow_stack_batched_matches_per_stream(qsetup):
    """B=3 with different per-stream positions must equal three independent
    B=1 kernel runs (per-stream attention masks and rope rows)."""
    qp, rope, state = qsetup
    B = 3
    rng = np.random.RandomState(7)
    frames = np.zeros((B, 1 + CFG.num_codebooks), np.int32)
    frames[:, 0] = rng.randint(400, 448, B)
    frames[:, 1] = rng.randint(0, CFG.codebook_size, B)
    pos = jnp.asarray([12, 7, 3], jnp.int32)

    # batched cache: copy stream 0's prefilled cache and vary it per stream
    kb = jnp.concatenate([state["kv"]["k"]] * B, axis=1)
    vb = jnp.concatenate([state["kv"]["v"]] * B, axis=1)
    kb = kb.at[:, 1].multiply(0.5).at[:, 2].multiply(-1.0)
    vb = vb.at[:, 1].multiply(0.5).at[:, 2].multiply(-1.0)
    cache_b = {"k": kb, "v": vb}

    x_emb = dual_ar.embed_inputs(qp, CFG, IDS, jnp.asarray(frames)[:, :, None])
    hid_b, nk_b, nv_b, _ = slow_stack.slow_stack_step(
        qp, CFG, rope["slow"], x_emb[:, 0], cache_b, pos,
        read_len=32, interpret=True,
    )

    for b in range(B):
        cache_1 = {"k": kb[:, b:b + 1], "v": vb[:, b:b + 1]}
        hid_1, nk_1, nv_1, _ = slow_stack.slow_stack_step(
            qp, CFG, rope["slow"], x_emb[b:b + 1, 0], cache_1, pos[b:b + 1],
            read_len=32, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(hid_b)[b], np.asarray(hid_1)[0], rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(nk_b)[:, b], np.asarray(nk_1)[:, 0], rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(nv_b)[:, b], np.asarray(nv_1)[:, 0], rtol=1e-5, atol=1e-5
        )


def test_vmem_fit_gate_falls_back_to_xla(qsetup, monkeypatch):
    """When the (B, R) kernel variant would exceed the VMEM budget,
    decode_chunk silently takes the XLA slow path instead of failing to
    compile — deep-context batched decode must degrade, not crash."""
    from fish_tts_tpu.config import S1_MINI_CONFIG

    # budget table at production shapes: single-stream keeps the kernel at
    # full context; batched decode falls back beyond its depth
    # with the R-blocked online-softmax grid, every 512-multiple bucket
    # fits at any supported batch (VMEM scales with B*RB, not B*R);
    # non-RB-multiple read lengths cannot tile and fall back
    assert slow_stack.fits(S1_MINI_CONFIG, 1, 4096)
    assert slow_stack.fits(S1_MINI_CONFIG, 8, 512)
    assert slow_stack.fits(S1_MINI_CONFIG, 8, 4096)
    assert not slow_stack.fits(S1_MINI_CONFIG, 8, 768)  # 768 % 512 != 0

    qp, rope, state = qsetup
    monkeypatch.setattr(slow_stack, "fits", lambda cfg, b, r: False)
    calls = []
    real = slow_stack.slow_stack_step

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(slow_stack, "slow_stack_step", spy)
    st = decode_mod.init_state(qp, CFG, batch=1)
    st["pos"] = jnp.asarray([8], jnp.int32)
    t, p, r = jnp.float32(0.7), jnp.float32(0.8), jnp.float32(1.1)
    st, frames, _ = decode_mod.decode_chunk(
        qp, rope, st, jax.random.PRNGKey(0), t, p, r,
        cfg=CFG, ids=IDS, num_frames=2, top_k=-1, kv_bucket=32,
        fast_kernel=True,
    )
    assert not calls  # the slow kernel was never entered
    frames = np.asarray(frames)
    assert frames.shape == (1, 2, 1 + CFG.num_codebooks)
    assert (frames[:, :, 1] < CFG.codebook_size).all()


def test_multi_block_online_softmax_matches_single_block(qsetup, monkeypatch):
    """Streaming the cache in RB-row blocks with online softmax must equal
    the single-block pass exactly (flash-attention accumulation identity) —
    this is what keeps deep-context batched decode on the kernel."""
    qp, rope, state = qsetup
    pos = jnp.asarray([12], jnp.int32)
    frame = jnp.zeros((1, 1 + CFG.num_codebooks), jnp.int32)
    frame = frame.at[0, 0].set(417).at[0, 1].set(17)
    x_emb = dual_ar.embed_inputs(qp, CFG, IDS, frame[:, :, None])

    one, nk1, nv1, _ = slow_stack.slow_stack_step(
        qp, CFG, rope["slow"], x_emb[:, 0], state["kv"], pos,
        read_len=32, interpret=True,
    )
    # force 4 blocks of 8 rows over the same 32-row window
    monkeypatch.setattr(slow_stack, "RB_ROWS", 8)
    slow_stack.slow_stack_step._clear_cache()
    multi, nk2, nv2, _ = slow_stack.slow_stack_step(
        qp, CFG, rope["slow"], x_emb[:, 0], state["kv"], pos,
        read_len=32, interpret=True,
    )
    slow_stack.slow_stack_step._clear_cache()
    np.testing.assert_allclose(
        np.asarray(multi), np.asarray(one), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(nk2), np.asarray(nk1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(nv2), np.asarray(nv1), rtol=1e-6)
