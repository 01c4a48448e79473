"""Checkpoint conversion tests with synthetic torch-style state dicts:
key transforms, weight-norm folding, transposes, and safetensors round-trip."""

import numpy as np
import pytest

from fish_tts_tpu.config import TINY_CONFIG
from fish_tts_tpu.utils import checkpoint as ckpt

CFG = TINY_CONFIG


def _lm_state_dict(prefix="", legacy_qkv=False):
    """Build a torch-layout LM state dict matching TINY_CONFIG shapes."""
    rng = np.random.RandomState(0)
    sd = {}

    def add(key, shape):
        sd[prefix + key] = rng.randn(*shape).astype(np.float32)

    qkv_out = (CFG.n_head + 2 * CFG.n_local_heads) * CFG.head_dim
    add("embeddings.weight", (CFG.vocab_size, CFG.dim))
    add("codebook_embeddings.weight", (CFG.codebook_size * CFG.num_codebooks, CFG.dim))
    for i in range(CFG.n_layer):
        if legacy_qkv:
            q = CFG.n_head * CFG.head_dim
            kv = CFG.n_local_heads * CFG.head_dim
            add(f"layers.{i}.attention.wq.weight", (q, CFG.dim))
            add(f"layers.{i}.attention.wk.weight", (kv, CFG.dim))
            add(f"layers.{i}.attention.wv.weight", (kv, CFG.dim))
        else:
            add(f"layers.{i}.attention.wqkv.weight", (qkv_out, CFG.dim))
        add(f"layers.{i}.attention.wo.weight", (CFG.dim, CFG.n_head * CFG.head_dim))
        add(f"layers.{i}.feed_forward.w1.weight", (CFG.intermediate_size, CFG.dim))
        add(f"layers.{i}.feed_forward.w3.weight", (CFG.intermediate_size, CFG.dim))
        add(f"layers.{i}.feed_forward.w2.weight", (CFG.dim, CFG.intermediate_size))
        add(f"layers.{i}.attention_norm.weight", (CFG.dim,))
        add(f"layers.{i}.ffn_norm.weight", (CFG.dim,))
    add("norm.weight", (CFG.dim,))
    add("fast_embeddings.weight", (CFG.codebook_size, CFG.fast_dim))
    for i in range(CFG.n_fast_layer):
        add(f"fast_layers.{i}.attention.wqkv.weight", (qkv_out, CFG.dim))
        add(f"fast_layers.{i}.attention.wo.weight", (CFG.dim, CFG.n_head * CFG.head_dim))
        add(f"fast_layers.{i}.feed_forward.w1.weight", (CFG.intermediate_size, CFG.dim))
        add(f"fast_layers.{i}.feed_forward.w3.weight", (CFG.intermediate_size, CFG.dim))
        add(f"fast_layers.{i}.feed_forward.w2.weight", (CFG.dim, CFG.intermediate_size))
        add(f"fast_layers.{i}.attention_norm.weight", (CFG.dim,))
        add(f"fast_layers.{i}.ffn_norm.weight", (CFG.dim,))
    add("fast_norm.weight", (CFG.dim,))
    add("fast_output.weight", (CFG.codebook_size, CFG.fast_dim))
    # audio_* keys must be dropped (llama.py:494-496)
    add("audio_projector.weight", (8, 8))
    return sd


def test_lm_conversion_shapes_and_transposes():
    sd = _lm_state_dict()
    params = ckpt.convert_lm_state_dict(sd, CFG)
    assert params["embeddings"].shape == (CFG.vocab_size, CFG.dim)
    qkv_out = (CFG.n_head + 2 * CFG.n_local_heads) * CFG.head_dim
    assert params["layers"]["wqkv"].shape == (CFG.n_layer, CFG.dim, qkv_out)
    # transpose correctness: ours[w][l] == torch[l].T
    np.testing.assert_array_equal(
        params["layers"]["wqkv"][0], sd["layers.0.attention.wqkv.weight"].T
    )
    np.testing.assert_array_equal(
        params["layers"]["w2"][1], sd["layers.1.feed_forward.w2.weight"].T
    )
    assert "audio_projector" not in str(params.keys())


def test_lm_conversion_model_prefix_and_wrap():
    sd = {"state_dict": _lm_state_dict(prefix="model.")}
    params = ckpt.convert_lm_state_dict(sd, CFG)
    assert params["norm"].shape == (CFG.dim,)


def test_lm_conversion_legacy_wqkv_fusion():
    """wq/wk/wv are concatenated in q,k,v order (llama.py:222-227)."""
    sd = _lm_state_dict(legacy_qkv=True)
    params = ckpt.convert_lm_state_dict(sd, CFG)
    q = CFG.n_head * CFG.head_dim
    kv = CFG.n_local_heads * CFG.head_dim
    fused = params["layers"]["wqkv"][0]  # (dim, qkv_out) = torch cat([q,k,v]).T
    np.testing.assert_array_equal(fused[:, :q], sd["layers.0.attention.wq.weight"].T)
    np.testing.assert_array_equal(
        fused[:, q : q + kv], sd["layers.0.attention.wk.weight"].T
    )
    np.testing.assert_array_equal(
        fused[:, q + kv :], sd["layers.0.attention.wv.weight"].T
    )


def test_lm_coverage_report_surfaces_extra_and_misspelled_keys():
    """The coverage audit catches both failure shapes: an extra key the
    converter never reads (reported UNCONSUMED) and a misspelled expected
    key (raises, naming the closest present keys)."""
    # extra (unexpected) key -> unconsumed in the report, audio_* whitelisted
    sd = _lm_state_dict()
    sd["mystery_adapter.weight"] = np.zeros((4, 4), np.float32)
    out = []
    ckpt.convert_lm_state_dict(sd, CFG, report_out=out)
    (rep,) = out
    assert rep.unconsumed == ("mystery_adapter.weight",)
    assert not rep.ok
    assert "audio_projector.weight" in rep.expected_dropped
    assert rep.consumed + len(rep.expected_dropped) + len(rep.unconsumed) == rep.total
    assert "UNCONSUMED: mystery_adapter.weight" in rep.summary()

    # misspelled key (converter expects norm.weight) -> loud raise with hint
    sd2 = _lm_state_dict()
    sd2["nrom.weight"] = sd2.pop("norm.weight")
    with pytest.raises(KeyError, match="norm.weight"):
        ckpt.convert_lm_state_dict(sd2, CFG)


def test_clean_lm_conversion_reports_ok():
    sd = _lm_state_dict()
    out = []
    ckpt.convert_lm_state_dict(sd, CFG, report_out=out)
    assert out[0].ok
    assert out[0].unconsumed == ()


def test_converted_params_run_forward():
    """Converted params drive the engine (structure exactly matches init)."""
    import jax
    import jax.numpy as jnp

    from fish_tts_tpu.engine import decode
    from fish_tts_tpu.models import dual_ar
    from fish_tts_tpu.models.dual_ar import TokenIds

    params = ckpt.convert_lm_state_dict(_lm_state_dict(), CFG)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    # scale down magnitudes so softmax doesn't saturate
    params = jax.tree_util.tree_map(lambda x: x * 0.05, params)
    ref = dual_ar.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(ref)

    rope = dual_ar.make_rope_tables(CFG)
    ids = TokenIds(400, 447, 5)
    state = decode.init_state(params, CFG, batch=1)
    prompt = np.zeros((1, 1 + CFG.num_codebooks, 16), np.int32)
    prompt[0, 0, :8] = np.arange(8)
    state, first = decode.prefill(
        params, rope, state, jnp.asarray(prompt), jnp.asarray([8], jnp.int32),
        jax.random.PRNGKey(1), jnp.float32(0.7), jnp.float32(0.8),
        jnp.float32(1.1), cfg=CFG, ids=ids,
    )
    assert first.shape == (1, 1 + CFG.num_codebooks)


def test_weight_norm_conv_folding_both_namings():
    rng = np.random.RandomState(1)
    v = rng.randn(6, 3, 5).astype(np.float32)
    g = (rng.rand(6, 1, 1) + 0.5).astype(np.float32)
    expected = g * v / np.sqrt((v**2).sum(axis=(1, 2), keepdims=True))
    b = rng.randn(6).astype(np.float32)

    for naming in ("parametrizations", "legacy"):
        if naming == "parametrizations":
            sd = ckpt._SD({
                "c.parametrizations.weight.original0": g,
                "c.parametrizations.weight.original1": v,
                "c.bias": b,
            })
        else:
            sd = ckpt._SD({"c.weight_g": g, "c.weight_v": v, "c.bias": b})
        conv = sd.conv("c")
        np.testing.assert_allclose(conv["w"], expected, rtol=1e-5)
        np.testing.assert_array_equal(conv["b"], b)

    # plain conv without weight norm
    sd = ckpt._SD({"c.weight": v, "c.bias": b})
    np.testing.assert_array_equal(sd.conv("c")["w"], v)


def test_safetensors_roundtrip(tmp_path):
    import jax

    tree = {
        "a": np.arange(6, dtype=np.float32).reshape(2, 3),
        "nested": {"b": np.ones((4,), np.int32)},
        "list": [{"w": np.zeros((2, 2))}, {"w": np.ones((2, 2))}],
    }
    path = tmp_path / "p.safetensors"
    ckpt.save_params(path, tree)
    loaded = ckpt.load_params(path)
    assert jax.tree_util.tree_structure(loaded) == jax.tree_util.tree_structure(tree)
    np.testing.assert_array_equal(loaded["a"], tree["a"])
    np.testing.assert_array_equal(loaded["list"][1]["w"], tree["list"][1]["w"])


def test_safetensors_bf16_storage(tmp_path):
    """Weight leaves (ndim>1 f32) store as bfloat16 (half the bytes, the
    precision the reference torch checkpoints ship in); 1-D leaves and
    non-f32 leaves keep their dtype; fp32 mode is lossless."""
    import ml_dtypes

    tree = {
        "w": np.random.RandomState(0).randn(64, 64).astype(np.float32),
        "norm": np.random.RandomState(1).randn(64).astype(np.float32),
        "codes": np.arange(8, dtype=np.int32),
    }
    p16 = tmp_path / "bf16.safetensors"
    p32 = tmp_path / "fp32.safetensors"
    ckpt.save_params(p16, tree)                 # bf16 default
    ckpt.save_params(p32, tree, dtype="fp32")
    assert p16.stat().st_size < 0.65 * p32.stat().st_size

    l16 = ckpt.load_params(p16)
    assert l16["w"].dtype == ml_dtypes.bfloat16
    assert l16["norm"].dtype == np.float32      # 1-D stays f32
    assert l16["codes"].dtype == np.int32
    np.testing.assert_allclose(
        l16["w"].astype(np.float32), tree["w"], rtol=1e-2, atol=1e-2
    )
    l32 = ckpt.load_params(p32)
    np.testing.assert_array_equal(l32["w"], tree["w"])


def test_lm_prefix_strip_survives_stray_first_key():
    """The strip decision must not hinge on dict order: a metadata entry
    ordered first (reference quirk: llama.py:487 keys off next(iter(sd)))
    must not disable the model. prefix strip."""
    sd = {"epoch": np.zeros(1, np.float32)}
    sd.update(_lm_state_dict(prefix="model."))
    params = ckpt.convert_lm_state_dict(sd, CFG)
    assert params["norm"].shape == (CFG.dim,)


def test_save_params_rejects_unknown_dtype(tmp_path):
    with pytest.raises(ValueError, match="dtype"):
        ckpt.save_params(tmp_path / "x.safetensors",
                         {"w": np.zeros((2, 2), np.float32)}, dtype="fp16")
