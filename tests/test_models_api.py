"""models-subpackage export parity + object-style API layer
(reference fish_tts/models/__init__.py:19-34)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


REFERENCE_EXPORTS = [
    "BaseModelArgs", "DualARModelArgs", "DualARTransformer", "FishTokenizer",
    "DAC", "DownsampleResidualVectorQuantize", "VocoderModelArgs",
    "WindowLimitedTransformer", "init_model", "generate_long",
    "GenerateResponse", "ContentSequence", "TextPart", "VQPart",
]


def test_models_export_surface():
    import fish_tts_tpu.models as m

    assert set(m.__all__) == set(REFERENCE_EXPORTS)
    for name in REFERENCE_EXPORTS:
        assert getattr(m, name) is not None


def test_dual_ar_transformer_handle(tiny_tokenizer):
    """The object handle delegates to the functional core — a one-token
    forward through the handle matches calling dual_ar directly."""
    from fish_tts_tpu.config import TINY_CONFIG
    from fish_tts_tpu.models import DualARTransformer
    from fish_tts_tpu.models import dual_ar

    cfg = TINY_CONFIG
    params = dual_ar.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    model = DualARTransformer(cfg, params, tiny_tokenizer)
    kv = model.setup_caches(batch=1)
    assert kv["k"].shape == (cfg.n_layer, 1, cfg.n_local_heads,
                             cfg.max_seq_len, cfg.head_dim)
    inp = jnp.zeros((1, 1 + cfg.num_codebooks, 1), jnp.int32)
    pos = jnp.zeros((1, 1), jnp.int32)
    NEG = float(np.finfo(np.float32).min)
    cache_bias = jnp.full((1, 1, 1, cfg.max_seq_len), NEG, jnp.float32)
    block_bias = jnp.zeros((1, 1, 1, 1), jnp.float32)
    h, kv2 = model.forward_generate(inp, pos, kv, cache_bias, block_bias)
    logits = model.lm_logits(h)
    assert logits.shape == (1, 1, cfg.vocab_size)
    ids = model.token_ids()
    h2, _ = dual_ar.slow_forward(
        params, cfg, ids, model.rope, inp, pos, kv2 and model.setup_caches(1),
        cache_bias, block_bias,
    )
    np.testing.assert_allclose(np.asarray(h), np.asarray(h2), rtol=1e-6)


def test_dac_handle_roundtrip():
    from fish_tts_tpu.config import TINY_VOCODER_CONFIG
    from fish_tts_tpu.models import DAC
    from fish_tts_tpu.models import vocoder as voc

    cfg = TINY_VOCODER_CONFIG
    params = voc.init_vocoder_params(jax.random.PRNGKey(1), cfg)
    dac = DAC(cfg, params)
    assert dac.sample_rate == 44100
    audio = jnp.asarray(
        np.random.RandomState(0).randn(1, 1, 3 * cfg.frame_length)
        .astype(np.float32) * 0.1
    )
    codes, lengths = dac.encode(audio)
    assert codes.shape == (1, cfg.num_codebooks, 3)
    assert int(lengths[0]) == 3
    out, audio_len = dac.decode(codes, lengths)
    assert out.shape == (1, 1, 3 * cfg.frame_length)
    assert int(audio_len[0]) == 3 * cfg.frame_length
    # quantizer sub-handle decodes the same latent the functional core does
    lat = dac.quantizer.decode(codes)
    lat2 = voc.quantizer_decode(params["quantizer"], cfg, codes)
    np.testing.assert_allclose(np.asarray(lat), np.asarray(lat2))


def test_module_level_generate_long(tiny_tokenizer):
    """The reference-signature generate_long drives the engine."""
    from fish_tts_tpu.config import TINY_CONFIG
    from fish_tts_tpu.engine.generate import GenerationEngine
    from fish_tts_tpu.models import generate_long, dual_ar

    params = dual_ar.init_params(jax.random.PRNGKey(2), TINY_CONFIG,
                                 dtype=jnp.float32)
    eng = GenerationEngine(params, TINY_CONFIG, tiny_tokenizer)
    responses = list(generate_long(
        model=eng, text="api parity", max_new_tokens=8, temperature=0.7,
    ))
    assert responses[-1].action == "next"
    assert any(r.action == "sample" for r in responses)
