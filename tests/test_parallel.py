"""Multi-device tests on the 8-way virtual CPU mesh: sharded prefill+decode
runs and matches the single-device result where determinism allows."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_tts_tpu.config import DualARConfig
from fish_tts_tpu.engine import decode as decode_mod
from fish_tts_tpu.models import dual_ar
from fish_tts_tpu.models.dual_ar import TokenIds
from fish_tts_tpu.parallel import mesh as mesh_mod
from fish_tts_tpu.parallel import sharding

CFG = DualARConfig(
    vocab_size=1024, n_layer=2, n_head=8, n_local_heads=4, dim=128,
    head_dim=16, intermediate_size=256, max_seq_len=128,
    num_codebooks=4, codebook_size=48, residual_codebook_size=24,
    n_fast_layer=2, fast_dim=128,
)
IDS = TokenIds(semantic_begin=400, semantic_end=447, im_end=5)


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (see conftest XLA_FLAGS)")
    return jax.devices()[:8]


def _run(mesh=None, batch=1, tp=1):
    params = dual_ar.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    rope = dual_ar.make_rope_tables(CFG)
    state = decode_mod.init_state(params, CFG, batch=batch)
    if mesh is not None:
        params = sharding.shard_params(params, CFG, mesh)
        rope = sharding.shard_rope(rope, mesh)
        state = sharding.shard_state(state, mesh)

    T = 16
    prompt = np.zeros((batch, 1 + CFG.num_codebooks, T), np.int32)
    prompt[:, 0] = np.random.RandomState(0).randint(0, 300, (batch, T))
    lengths = jnp.asarray([T] * batch, jnp.int32)
    t, p, r = jnp.float32(0.7), jnp.float32(0.8), jnp.float32(1.1)

    state, first = decode_mod.prefill(
        params, rope, state, jnp.asarray(prompt), lengths,
        jax.random.PRNGKey(1), t, p, r, cfg=CFG, ids=IDS, top_k=32,
    )
    state, frames, emitted = decode_mod.decode_chunk(
        params, rope, state, jax.random.PRNGKey(2), t, p, r,
        cfg=CFG, ids=IDS, num_frames=3, top_k=32,
    )
    return np.asarray(first), np.asarray(frames)


def test_mesh_shapes(eight_devices):
    m = mesh_mod.make_mesh(tp=4, devices=eight_devices)
    assert m.shape == {"dp": 2, "tp": 4}
    m2 = mesh_mod.make_mesh(tp=2, dp=2, devices=eight_devices[:4])
    assert m2.shape == {"dp": 2, "tp": 2}
    with pytest.raises(ValueError):
        mesh_mod.make_mesh(tp=3, devices=eight_devices)


def test_tp_matches_single_device(eight_devices):
    """Tensor-parallel decode must be numerically equivalent to single-device
    (same fp32 math, GSPMD only changes layout)."""
    f1, fr1 = _run(mesh=None, batch=1)
    m = mesh_mod.make_mesh(tp=4, dp=1, devices=eight_devices[:4])
    f2, fr2 = _run(mesh=m, batch=1)
    np.testing.assert_array_equal(f1, f2)
    np.testing.assert_array_equal(fr1, fr2)


def test_dp_tp_mesh_runs(eight_devices):
    """Full (dp=2, tp=4) mesh with a 2-stream batch compiles and runs."""
    m = mesh_mod.make_mesh(tp=4, dp=2, devices=eight_devices)
    first, frames = _run(mesh=m, batch=2)
    assert first.shape == (2, 1 + CFG.num_codebooks)
    assert frames.shape == (2, 3, 1 + CFG.num_codebooks)
    assert frames.min() >= 0


def test_tp_divisibility_guard(eight_devices):
    m = mesh_mod.make_mesh(tp=8, dp=1, devices=eight_devices)
    params = dual_ar.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    with pytest.raises(ValueError):
        sharding.shard_params(params, CFG, m)  # tp=8 > n_local_heads=4
