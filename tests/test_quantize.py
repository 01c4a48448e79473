"""Weight-only int8 quantization tests (utils/quantize.py).

Covers the kernel-level contracts (qmm/qgather/qhead vs their exact bf16/fp32
counterparts) and a tiny end-to-end decode comparing int8 vs full-precision
logits, so the ``precision="int8"`` serving path ships validated.
"""

import jax
import jax.numpy as jnp
import numpy as np

from fish_tts_tpu.config import TINY_CONFIG
from fish_tts_tpu.engine import decode as decode_mod
from fish_tts_tpu.models import dual_ar
from fish_tts_tpu.models.dual_ar import TokenIds
from fish_tts_tpu.utils.quantize import (
    is_quantized,
    qgather,
    qhead,
    qmm,
    quantize_lm_params,
    quantize_weight,
    quantized_bytes,
)

IDS = TokenIds(semantic_begin=400, semantic_end=447, im_end=5)


def test_quantize_weight_roundtrip_error_bound():
    """Dequantized int8 stays within half a quantization step of the input."""
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 128), jnp.float32)
    q = quantize_weight(w, axis=0)
    assert q["q"].dtype == jnp.int8
    deq = q["q"].astype(jnp.float32) * q["s"]
    step = np.asarray(q["s"])  # one LSB of the int8 grid per output channel
    err = np.abs(np.asarray(deq - w))
    assert (err <= step / 2 + 1e-7).all()


def test_qmm_matches_exact_matmul():
    k = jax.random.PRNGKey(1)
    x = jax.random.normal(k, (3, 64), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(2), (64, 96), jnp.float32) * 0.05
    exact = x @ w
    quant = qmm(x, quantize_weight(w, axis=0))
    # per-channel int8: relative error bounded by ~contraction_dim * step/2
    np.testing.assert_allclose(np.asarray(quant), np.asarray(exact), atol=2e-2)
    # plain weights pass through untouched
    np.testing.assert_allclose(np.asarray(qmm(x, w)), np.asarray(exact))


def test_qmm_stacked_layer_axis():
    """Stacked (L, in, out) weights quantized over axis=1 work under scan."""
    w = jax.random.normal(jax.random.PRNGKey(3), (4, 32, 48), jnp.float32) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 32), jnp.float32)
    q = quantize_weight(w, axis=1)
    for layer in range(4):
        lw = {"q": q["q"][layer], "s": q["s"][layer]}
        np.testing.assert_allclose(
            np.asarray(qmm(x, lw)), np.asarray(x @ w[layer]), atol=2e-2
        )


def test_qgather_matches_rows():
    table = jax.random.normal(jax.random.PRNGKey(5), (50, 64), jnp.float32)
    idx = jnp.asarray([[0, 7], [49, 3]])
    q = quantize_weight(table, axis=1)  # per-row scales
    exact = table[idx]
    quant = qgather(q, idx, jnp.float32)
    np.testing.assert_allclose(np.asarray(quant), np.asarray(exact), atol=2e-2)
    np.testing.assert_allclose(np.asarray(qgather(table, idx, jnp.float32)), np.asarray(exact))


def test_qhead_matches_einsum():
    table = jax.random.normal(jax.random.PRNGKey(6), (50, 64), jnp.float32) * 0.2
    h = jax.random.normal(jax.random.PRNGKey(7), (1, 2, 64), jnp.float32)
    exact = jnp.einsum("btd,vd->btv", h, table)
    quant = qhead(h, quantize_weight(table, axis=1))
    np.testing.assert_allclose(np.asarray(quant), np.asarray(exact), atol=0.15)
    # the argmax (what sampling mostly cares about) must be preserved
    assert (jnp.argmax(quant, -1) == jnp.argmax(exact, -1)).all()


def test_quantize_lm_params_structure_and_size():
    params = dual_ar.init_params(jax.random.PRNGKey(0), TINY_CONFIG, jnp.float32)
    qparams = quantize_lm_params(params)
    for key in ("wqkv", "wo", "w1", "w3", "w2"):
        assert is_quantized(qparams["layers"][key])
        assert is_quantized(qparams["fast_layers"][key])
    assert is_quantized(qparams["embeddings"])
    assert is_quantized(qparams["fast_output"])
    # norms and rope stay untouched
    assert not is_quantized(qparams["norm"])
    # int8 payload shrinks the matmul weights ~4x vs fp32; whole tree must
    # come out well under half the original footprint
    assert quantized_bytes(qparams) < 0.5 * quantized_bytes(params)


def _decode_logits(params, state, frame, pos, cfg=TINY_CONFIG):
    """One slow forward + head, mirroring engine/decode._decode_one."""
    S = state["kv"]["k"].shape[3]
    NEG = float(np.finfo(np.float32).min)
    inp = frame[:, :, None]
    positions = pos[:, None]
    k_pos = jnp.arange(S, dtype=jnp.int32)
    cache_bias = jnp.where(
        k_pos[None, None, None, :] < pos[:, None, None, None], 0.0, NEG
    ).astype(jnp.float32)
    block_bias = jnp.zeros((1, 1, 1, 1), jnp.float32)
    rope = dual_ar.make_rope_tables(cfg)
    hidden, _ = dual_ar.slow_forward(
        params, cfg, IDS, rope, inp, positions, state["kv"], cache_bias, block_bias
    )
    return dual_ar.lm_logits(params, cfg, hidden)[:, -1]


def test_int8_slow_logits_track_fp32():
    """End-to-end slow forward: int8 logits stay close to fp32 logits and
    agree on the top-k candidate set that sampling consumes."""
    cfg = TINY_CONFIG
    params = dual_ar.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    qparams = quantize_lm_params(params)
    state = decode_mod.init_state(params, cfg, batch=1)
    frame = jnp.zeros((1, 1 + cfg.num_codebooks), jnp.int32)
    pos = jnp.asarray([4], jnp.int32)

    exact = np.asarray(_decode_logits(params, state, frame, pos))
    quant = np.asarray(_decode_logits(qparams, state, frame, pos))
    # logits live on a small scale for random tiny weights; demand closeness
    assert np.max(np.abs(exact - quant)) < 0.1 * (np.max(np.abs(exact)) + 1.0)
    top_exact = set(np.argsort(-exact[0])[:8].tolist())
    top_quant = set(np.argsort(-quant[0])[:8].tolist())
    assert len(top_exact & top_quant) >= 6


def test_int8_decode_chunk_runs_and_emits_valid_frames():
    """The full jitted decode path accepts quantized params."""
    cfg = TINY_CONFIG
    params = dual_ar.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    qparams = quantize_lm_params(params)
    rope = dual_ar.make_rope_tables(cfg)
    state = decode_mod.init_state(qparams, cfg, batch=1)
    state["pos"] = jnp.asarray([8], jnp.int32)
    t, p, r = jnp.float32(0.7), jnp.float32(0.8), jnp.float32(1.1)
    state, frames, emitted = decode_mod.decode_chunk(
        qparams, rope, state, jax.random.PRNGKey(1), t, p, r,
        cfg=cfg, ids=IDS, num_frames=4, top_k=16,
    )
    frames = np.asarray(frames)
    assert frames.shape == (1, 4, 1 + cfg.num_codebooks)
    assert (frames[:, :, 0] >= 0).all() and (frames[:, :, 0] < cfg.vocab_size).all()
    assert (frames[:, :, 1] >= 0).all() and (frames[:, :, 1] < cfg.codebook_size).all()
    assert (frames[:, :, 2:] >= 0).all() and (
        frames[:, :, 2:] < cfg.residual_codebook_size
    ).all()
