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


# ---------------------------------------------------------------------------
# int8 pytrees on the mesh
# ---------------------------------------------------------------------------


def test_int8_params_shard(eight_devices):
    """Weight-only int8 {"q","s"} leaves get valid TP placements (scales
    never sharded over size-1 axes) and the sharded matmul matches."""
    from fish_tts_tpu.utils.quantize import qmm, quantize_lm_params

    params = dual_ar.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    qparams = quantize_lm_params(params)
    m = mesh_mod.make_mesh(tp=4, dp=2, devices=eight_devices)
    sharded = sharding.shard_params(qparams, CFG, m)

    # column-parallel wqkv: int8 tile sharded on the out axis, scale likewise
    wqkv = sharded["layers"]["wqkv"]
    assert wqkv["q"].sharding.spec == jax.sharding.PartitionSpec(None, None, "tp")
    assert wqkv["s"].sharding.spec == jax.sharding.PartitionSpec(None, None, "tp")
    # row-parallel wo: int8 sharded on the contraction axis; the scale's
    # contraction axis is size 1 so it must stay unsharded there
    wo = sharded["layers"]["wo"]
    assert wo["q"].sharding.spec == jax.sharding.PartitionSpec(None, "tp", None)
    assert wo["s"].sharding.spec == jax.sharding.PartitionSpec(None, None, None)

    x = jax.random.normal(jax.random.PRNGKey(3), (1, 4, CFG.dim), jnp.float32)
    mm = jax.jit(lambda x, w: qmm(x, {"q": w["q"][0], "s": w["s"][0]}))
    want = mm(x, qparams["layers"]["wqkv"])
    got = mm(x, sharded["layers"]["wqkv"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_prepare_head_params_rejected(eight_devices):
    """Fused-kernel head tiles are single-device; sharding them must fail
    loudly rather than silently replicate."""
    m = mesh_mod.make_mesh(tp=4, dp=2, devices=eight_devices)
    params = dual_ar.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    params["_slow_head"] = {"q": jnp.zeros((8, 8), jnp.int8),
                            "s": jnp.zeros((1, 8), jnp.float32)}
    with pytest.raises(ValueError, match="_slow_head"):
        sharding.shard_params(params, CFG, m)


# ---------------------------------------------------------------------------
# Through the engine (EngineConfig.tp_size/dp_size -> product path)
# ---------------------------------------------------------------------------


def _tiny_engine(tokenizer, tp=1, dp=1, int8=False, seed=0):
    from fish_tts_tpu.config import EngineConfig
    from fish_tts_tpu.engine.generate import GenerationEngine
    from fish_tts_tpu.utils.quantize import quantize_lm_params

    # CFG dims chosen so tp=4 divides heads/FFN; tokenizer ids fit vocab 1024
    params = dual_ar.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    if int8:
        params = quantize_lm_params(params)
    ecfg = EngineConfig(
        tp_size=tp, dp_size=dp,
        prompt_buckets=(32, 64), decode_chunk=4, first_chunk=4,
        kv_bucket_step=64, sample_top_k=32,
    )
    return GenerationEngine(params, CFG, tokenizer, engine_cfg=ecfg, seed=seed)


@pytest.fixture(scope="module")
def engine_tokenizer(tmp_path_factory):
    from fish_tts_tpu.models.tokenizer import (
        FishTokenizer, tiny_special_tokens, write_tiny_vocab,
    )

    path = tmp_path_factory.mktemp("vocab_par") / "tokenizer.tiktoken"
    write_tiny_vocab(path)
    return FishTokenizer(path, tiny_special_tokens(num_semantic=CFG.codebook_size))


def _collect_codes(engine, text, **kw):
    out = []
    for r in engine.generate_long(text, max_new_tokens=8, **kw):
        if r.action == "sample":
            out.append(r.codes)
    return np.concatenate(out, axis=1) if out else np.zeros((CFG.num_codebooks, 0))


def test_engine_tp_generate_long(eight_devices, engine_tokenizer):
    """generate_long through a tp=4 engine runs and matches the tp=1 engine
    exactly (same fp32 math; GSPMD only changes layout)."""
    e1 = _tiny_engine(engine_tokenizer, tp=1, dp=1)
    e4 = _tiny_engine(engine_tokenizer, tp=4, dp=1)
    c1 = _collect_codes(e1, "hello world")
    c4 = _collect_codes(e4, "hello world")
    np.testing.assert_array_equal(c1, c4)


def test_engine_tp_dp_int8(eight_devices, engine_tokenizer):
    """The production precision (weight-only int8) composes with (dp=2, tp=4):
    generate_long, the KV-prefix path, and generate_batch all run sharded."""
    eng = _tiny_engine(engine_tokenizer, tp=4, dp=2, int8=True)
    assert eng.mesh is not None and eng.mesh.shape == {"dp": 2, "tp": 4}

    codes = _collect_codes(eng, "hello world")
    assert codes.shape[0] == CFG.num_codebooks
    assert codes.min() >= 0

    # voice-profile KV prefix on the mesh
    ref_codes = np.random.RandomState(0).randint(
        0, 24, (CFG.num_codebooks, 6)
    ).astype(np.int64)
    eng.set_prefix(["ref text"], [ref_codes])
    codes2 = _collect_codes(eng, "hello again")
    assert codes2.shape[0] == CFG.num_codebooks

    # dp-sharded batch (B=2 divides dp=2)
    outs = eng.generate_batch(["one text", "two text"], max_new_tokens=6)
    assert len(outs) == 2
    for c in outs:
        assert c.shape[0] == CFG.num_codebooks and c.min() >= 0

    # batched streaming over the same mesh, per-stream sampling params
    acc = [0, 0]
    for chunk in eng.generate_batch_stream(
        ["one text", "two text"], max_new_tokens=6, temperature=[0.6, 1.0],
    ):
        for b, codes in enumerate(chunk):
            if codes is not None:
                assert codes.shape[0] == CFG.num_codebooks
                acc[b] += codes.shape[1]
    assert all(a >= 1 for a in acc)


def test_continuous_batching_on_mesh(eight_devices, engine_tokenizer):
    """The slot scheduler runs on a (dp=2, tp=4) mesh: the pool state is
    GSPMD-sharded, admission installs into slots through sharded
    dynamic_update_slice, and a served request still matches its solo run
    (same seed) — the co-tenant/admission invariance composes with TP."""
    from fish_tts_tpu.engine.serve import ContinuousBatcher

    eng = _tiny_engine(engine_tokenizer, tp=4, dp=1)

    eng.reseed(17)
    solo = []
    for r in eng.generate_long("mesh served", max_new_tokens=10,
                               streaming=True, temperature=0.7, top_p=0.8,
                               repetition_penalty=1.1):
        if r.action == "sample":
            solo.append(r.codes)
    solo = np.concatenate(solo, axis=1)

    srv = ContinuousBatcher(eng, slots=2)
    rid = srv.submit("mesh served", max_new_tokens=10, seed=17,
                     temperature=0.7, top_p=0.8, repetition_penalty=1.1)
    rid2 = srv.submit("co tenant", max_new_tokens=6)
    got = {}
    for ev in srv.run():
        got.setdefault(ev.request_id, []).append(ev.codes)
    served = np.concatenate(got[rid], axis=1)
    np.testing.assert_array_equal(served, solo)
    assert rid2 in got


def test_mesh_engine_disables_pallas_kernels(
    eight_devices, engine_tokenizer, monkeypatch
):
    """Kernel x TP composition is pinned OFF: the Pallas kernels are
    single-device programs (they run outside GSPMD), so an engine built
    over a mesh must cleanly bypass them — never hand sharded params to a
    pallas_call.  A single-device engine on TPU would enable them; on any
    mesh the gate must win regardless of the fast_kernel config flag.

    On CPU the backend gate alone would make this vacuous, so the backend
    probe is faked to "tpu" during construction: the MESH gate must turn
    the kernels off by itself."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    eng = _tiny_engine(engine_tokenizer, tp=4, dp=2, int8=True)
    assert eng.mesh is not None
    assert eng._fast_kernel is False
    monkeypatch.undo()
    # and the product path actually runs (XLA path on the mesh)
    segs = eng.generate_long("ab", max_new_tokens=4)
    assert len(list(segs)) >= 1
