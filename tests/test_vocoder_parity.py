"""Numeric cross-validation of the JAX codec against the reference torch
vocoder (/root/reference/fish_tts/models/vocoder.py).

The reference module is imported read-only with stub ``dac``/``audiotools``
packages implementing the public descript-audio-codec semantics it depends on
(Snake1d, weight-normed convs, ResidualVectorQuantize with L2-normalized
nearest-neighbour lookup).  A tiny reference DAC is built with the exact
wiring of the reference synthesizer (_load_vocoder, synthesizer.py:199-269),
its ``state_dict()`` goes through our checkpoint converter, and we compare:

- WindowLimitedTransformer forward (attention + LayerScale residuals),
- ConvNeXtBlock forward,
- quantizer ``decode`` (RVQ from_codes + post WLT + upsample),
- full ``DAC.decode`` waveform,
- full ``DAC.encode`` code indices (nearest-neighbour quantization).
"""

from __future__ import annotations

import importlib.util
import math
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

from fish_tts_tpu.config import TINY_VOCODER_CONFIG, VocoderTransformerConfig
from fish_tts_tpu.models import vocoder as jvoc
from fish_tts_tpu.utils.checkpoint import convert_vocoder_state_dict


# ---------------------------------------------------------------------------
# dac / audiotools stubs (public descript-audio-codec semantics)
# ---------------------------------------------------------------------------


def _install_dac_stubs():
    if "dac.nn.quantize" in sys.modules:
        return
    from torch.nn.utils.parametrizations import weight_norm

    def WNConv1d(*args, **kwargs):
        return weight_norm(tnn.Conv1d(*args, **kwargs))

    def WNConvTranspose1d(*args, **kwargs):
        return weight_norm(tnn.ConvTranspose1d(*args, **kwargs))

    class Snake1d(tnn.Module):
        def __init__(self, channels):
            super().__init__()
            self.alpha = tnn.Parameter(torch.ones(1, channels, 1))

        def forward(self, x):
            shape = x.shape
            x = x.reshape(shape[0], shape[1], -1)
            x = x + (self.alpha + 1e-9).reciprocal() * torch.sin(self.alpha * x).pow(2)
            return x.reshape(shape)

    class VectorQuantize(tnn.Module):
        def __init__(self, input_dim, codebook_size, codebook_dim):
            super().__init__()
            self.codebook_size = codebook_size
            self.codebook_dim = codebook_dim
            self.in_proj = WNConv1d(input_dim, codebook_dim, kernel_size=1)
            self.out_proj = WNConv1d(codebook_dim, input_dim, kernel_size=1)
            self.codebook = tnn.Embedding(codebook_size, codebook_dim)

        def decode_code(self, embed_id):
            return self.codebook(embed_id).transpose(1, 2)

        def decode_latents(self, latents):
            b, d, t = latents.shape
            encodings = latents.permute(0, 2, 1).reshape(-1, d)
            codebook = self.codebook.weight
            encodings = tF.normalize(encodings)
            codebook = tF.normalize(codebook)
            dist = (
                encodings.pow(2).sum(1, keepdim=True)
                - 2 * encodings @ codebook.t()
                + codebook.pow(2).sum(1, keepdim=True).t()
            )
            indices = (-dist).max(1)[1].reshape(b, t)
            return self.decode_code(indices), indices

        def forward(self, z):
            z_e = self.in_proj(z)
            z_q, indices = self.decode_latents(z_e)
            zeros = torch.zeros(z.shape[0], device=z.device)
            z_q = z_e + (z_q - z_e).detach()
            z_q = self.out_proj(z_q)
            return z_q, zeros, zeros, indices, z_e

    class ResidualVectorQuantize(tnn.Module):
        def __init__(self, input_dim=512, n_codebooks=9, codebook_size=1024,
                     codebook_dim=8, quantizer_dropout=0.0):
            super().__init__()
            if isinstance(codebook_dim, int):
                codebook_dim = [codebook_dim] * n_codebooks
            self.n_codebooks = n_codebooks
            self.codebook_size = codebook_size
            self.quantizers = tnn.ModuleList(
                VectorQuantize(input_dim, codebook_size, codebook_dim[i])
                for i in range(n_codebooks)
            )

        def forward(self, z, n_quantizers=None):
            z_q = 0.0
            residual = z
            indices_all, latents_all = [], []
            if n_quantizers is None:
                n_quantizers = self.n_codebooks
            loss = torch.zeros(z.shape[0], device=z.device)
            for i, quantizer in enumerate(self.quantizers):
                if self.training is False and i >= n_quantizers:
                    break
                z_q_i, _, _, indices_i, z_e_i = quantizer(residual)
                z_q = z_q + z_q_i
                residual = residual - z_q_i
                indices_all.append(indices_i)
                latents_all.append(z_e_i)
            return (z_q, torch.stack(indices_all, dim=1),
                    torch.cat(latents_all, dim=1), loss, loss)

        def from_codes(self, codes):
            z_q = 0.0
            z_p = []
            for i in range(codes.shape[1]):
                z_p_i = self.quantizers[i].decode_code(codes[:, i])
                z_p.append(z_p_i)
                z_q = z_q + self.quantizers[i].out_proj(z_p_i)
            return z_q, torch.cat(z_p, dim=1), codes

    dac_pkg = types.ModuleType("dac")
    dac_model = types.ModuleType("dac.model")
    dac_base = types.ModuleType("dac.model.base")
    dac_nn = types.ModuleType("dac.nn")
    dac_layers = types.ModuleType("dac.nn.layers")
    dac_quant = types.ModuleType("dac.nn.quantize")
    at_pkg = types.ModuleType("audiotools")
    at_ml = types.ModuleType("audiotools.ml")

    class CodecMixin:
        def get_delay(self):
            return 0

    dac_base.CodecMixin = CodecMixin
    dac_layers.Snake1d = Snake1d
    dac_layers.WNConv1d = WNConv1d
    dac_layers.WNConvTranspose1d = WNConvTranspose1d
    dac_quant.ResidualVectorQuantize = ResidualVectorQuantize
    dac_quant.VectorQuantize = VectorQuantize
    at_ml.BaseModel = tnn.Module
    for name, mod in (
        ("dac", dac_pkg), ("dac.model", dac_model), ("dac.model.base", dac_base),
        ("dac.nn", dac_nn), ("dac.nn.layers", dac_layers),
        ("dac.nn.quantize", dac_quant),
        ("audiotools", at_pkg), ("audiotools.ml", at_ml),
    ):
        sys.modules[name] = mod


def _load_reference_vocoder():
    _install_dac_stubs()
    if "ref_vocoder" in sys.modules:
        return sys.modules["ref_vocoder"]
    spec = importlib.util.spec_from_file_location(
        "ref_vocoder", "/root/reference/fish_tts/models/vocoder.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_vocoder"] = mod
    spec.loader.exec_module(mod)
    return mod


CFG = TINY_VOCODER_CONFIG


def _build_reference_dac(rv):
    """Tiny reference DAC wired exactly like synthesizer.py:199-269."""
    tq = CFG.quantizer_transformer

    def transformer_config_fn(**kw):
        return rv.VocoderModelArgs(
            block_size=tq.block_size,
            n_layer=kw.get("n_layer", tq.n_layer),
            n_head=kw.get("n_head", tq.n_head),
            dim=kw.get("dim", tq.dim),
            intermediate_size=kw.get("intermediate_size", tq.intermediate_size),
            n_local_heads=-1,
            head_dim=tq.head_dim,
            rope_base=10000,
            norm_eps=1e-5,
            dropout_rate=0.1,
            attn_dropout_rate=0.1,
            channels_first=True,
        )

    pre = rv.WindowLimitedTransformer(
        causal=True, window_size=CFG.quantizer_window,
        input_dim=CFG.quantizer_input_dim, config=transformer_config_fn(),
    )
    post = rv.WindowLimitedTransformer(
        causal=True, window_size=CFG.quantizer_window,
        input_dim=CFG.quantizer_input_dim, config=transformer_config_fn(),
    )
    quantizer = rv.DownsampleResidualVectorQuantize(
        input_dim=CFG.quantizer_input_dim,
        n_codebooks=CFG.n_residual_codebooks,
        codebook_size=CFG.residual_codebook_size,
        codebook_dim=CFG.codebook_dim,
        quantizer_dropout=0.5,
        downsample_factor=tuple(CFG.downsample_factor),
        pre_module=pre,
        post_module=post,
        semantic_codebook_size=CFG.semantic_codebook_size,
    )

    def general_config_fn(**kw):
        return rv.VocoderModelArgs(
            block_size=16384,
            n_layer=kw.get("n_layer", 8),
            n_head=kw.get("n_head", 8),
            dim=kw.get("dim", 512),
            intermediate_size=kw.get("intermediate_size", 1536),
            n_local_heads=-1,
            head_dim=64,
            rope_base=10000,
            norm_eps=1e-5,
            dropout_rate=0.1,
            attn_dropout_rate=0.1,
            channels_first=True,
        )

    torch.manual_seed(0)
    dac = rv.DAC(
        sample_rate=CFG.sample_rate,
        encoder_dim=CFG.encoder_dim,
        encoder_rates=list(CFG.encoder_rates),
        decoder_dim=CFG.decoder_dim,
        decoder_rates=list(CFG.decoder_rates),
        encoder_transformer_layers=list(CFG.encoder_transformer_layers),
        decoder_transformer_layers=list(CFG.decoder_transformer_layers),
        quantizer=quantizer,
        transformer_general_config=general_config_fn,
    )
    return dac.float().eval()


@pytest.fixture(scope="module")
def codecs():
    rv = _load_reference_vocoder()
    tdac = _build_reference_dac(rv)
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32),
        convert_vocoder_state_dict(tdac.state_dict(), CFG),
    )
    return rv, tdac, params


def test_wlt_forward_matches(codecs):
    """WindowLimitedTransformer incl. LayerScale residuals + window mask
    (reference vocoder.py:159-354)."""
    _, tdac, params = codecs
    T = 40
    rng = np.random.RandomState(0)
    x = rng.randn(1, CFG.quantizer_input_dim, T).astype(np.float32) * 0.3

    with torch.no_grad():
        t_out = tdac.quantizer.post_module(torch.from_numpy(x)).numpy()
    j_out = np.asarray(
        jvoc._wlt_forward(
            params["quantizer"]["post"], CFG.quantizer_transformer,
            CFG.quantizer_window, jnp.asarray(x),
        )
    )
    np.testing.assert_allclose(j_out, t_out, rtol=1e-4, atol=2e-5)


def test_wlt_window_longer_than_window_size(codecs):
    """Sequences longer than the 128-token window exercise the sliding mask."""
    _, tdac, params = codecs
    T = CFG.quantizer_window + 37
    rng = np.random.RandomState(1)
    x = rng.randn(1, CFG.quantizer_input_dim, T).astype(np.float32) * 0.3
    with torch.no_grad():
        t_out = tdac.quantizer.pre_module(torch.from_numpy(x)).numpy()
    j_out = np.asarray(
        jvoc._wlt_forward(
            params["quantizer"]["pre"], CFG.quantizer_transformer,
            CFG.quantizer_window, jnp.asarray(x),
        )
    )
    np.testing.assert_allclose(j_out, t_out, rtol=1e-4, atol=3e-5)


def test_convnext_block_matches(codecs):
    """ConvNeXtBlock: causal dwconv + LN + pointwise MLP + gamma
    (reference vocoder.py:644-680)."""
    _, tdac, params = codecs
    rng = np.random.RandomState(2)
    x = rng.randn(1, CFG.quantizer_input_dim, 21).astype(np.float32) * 0.5
    t_block = tdac.quantizer.downsample[0][1]
    with torch.no_grad():
        t_out = t_block(torch.from_numpy(x)).numpy()
    j_out = np.asarray(
        jvoc._convnext(
            params["quantizer"]["downsample"][0]["convnext"], jnp.asarray(x)
        )
    )
    np.testing.assert_allclose(j_out, t_out, rtol=1e-4, atol=2e-5)


def test_quantizer_decode_matches(codecs):
    """RVQ code lookup + post WLT + upsample (reference vocoder.py:800-814),
    including the out-of-range clamp."""
    _, tdac, params = codecs
    rng = np.random.RandomState(3)
    N = 12
    codes = np.zeros((1, 1 + CFG.n_residual_codebooks, N), np.int64)
    codes[0, 0] = rng.randint(0, CFG.semantic_codebook_size, N)
    codes[0, 1:] = rng.randint(0, CFG.residual_codebook_size,
                               (CFG.n_residual_codebooks, N))
    codes[0, 0, 0] = CFG.semantic_codebook_size + 7  # clamp path
    codes[0, 1, 1] = CFG.residual_codebook_size + 3

    with torch.no_grad():
        t_z = tdac.quantizer.decode(torch.from_numpy(codes)).numpy()
    j_z = np.asarray(
        jvoc.quantizer_decode(params["quantizer"], CFG, jnp.asarray(codes))
    )
    np.testing.assert_allclose(j_z, t_z, rtol=1e-4, atol=3e-5)


def test_full_dac_decode_waveform_matches(codecs):
    """codes -> waveform through quantizer.decode + Decoder conv stack
    (reference DAC.decode, vocoder.py:906-912)."""
    _, tdac, params = codecs
    rng = np.random.RandomState(4)
    N = 6
    codes = np.zeros((1, CFG.num_codebooks, N), np.int64)
    codes[0, 0] = rng.randint(0, CFG.semantic_codebook_size, N)
    codes[0, 1:] = rng.randint(0, CFG.residual_codebook_size,
                               (CFG.n_residual_codebooks, N))

    with torch.no_grad():
        t_audio, t_len = tdac.decode(
            torch.from_numpy(codes), torch.LongTensor([N])
        )
    t_audio = t_audio.numpy()
    j_audio = np.asarray(jvoc.dac_decode(params, CFG, jnp.asarray(codes)))
    assert int(t_len[0]) == N * CFG.frame_length
    assert j_audio.shape == t_audio.shape
    np.testing.assert_allclose(j_audio, t_audio, rtol=1e-3, atol=2e-4)


def test_full_dac_encode_codes_match(codecs):
    """audio -> codes through Encoder + downsample + pre WLT + nearest-
    neighbour RVQ (reference DAC.encode, vocoder.py:885-904)."""
    _, tdac, params = codecs
    rng = np.random.RandomState(5)
    n_frames = 3
    T = n_frames * CFG.frame_length - 100  # also exercises right-pad
    audio = (rng.randn(1, 1, T) * 0.1).astype(np.float32)

    with torch.no_grad():
        t_codes, t_lens = tdac.encode(torch.from_numpy(audio))
    j_codes = np.asarray(jvoc.dac_encode(params, CFG, jnp.asarray(audio)))
    assert int(t_lens[0]) == n_frames
    assert j_codes.shape == tuple(t_codes.shape)
    mismatch = (j_codes != t_codes.numpy()).mean()
    # nearest-neighbour ties can flip a code on numerically-equal distances;
    # demand essentially exact agreement
    assert mismatch <= 0.02, f"code mismatch rate {mismatch:.3f}"


def test_vocoder_conversion_full_coverage(codecs):
    """A faithful codec.pth-style state dict converts with every key
    consumed (the audit proves the converter's key paths match the real
    module layout, not just that no read failed)."""
    _, tdac, _ = codecs
    out = []
    convert_vocoder_state_dict(
        {f"generator.{k}": v for k, v in tdac.state_dict().items()},
        CFG, report_out=out,
    )
    assert out[0].ok, out[0].summary()
    # everything is either a consumed weight or a derived buffer
    # (freqs_cis / causal_mask, recomputed from config)
    assert out[0].consumed + len(out[0].expected_dropped) == out[0].total
    assert all(
        k.endswith((".freqs_cis", ".causal_mask"))
        for k in out[0].expected_dropped
    )


def test_vocoder_coverage_surfaces_drops_and_typos(codecs):
    """Decoder-side transformer weights (DecoderBlock ignores n_t_layer,
    reference vocoder.py:578-599) are whitelisted expected drops; any other
    unconsumed key is surfaced loudly."""
    _, tdac, _ = codecs
    sd = dict(tdac.state_dict())
    sd["decoder.model.1.block.2.attention.wqkv.weight"] = torch.zeros(4, 4)
    sd["quantizer.typo_module.weight"] = torch.zeros(2, 2)
    out = []
    convert_vocoder_state_dict(sd, CFG, report_out=out)
    (rep,) = out
    assert "decoder.model.1.block.2.attention.wqkv.weight" in rep.expected_dropped
    assert rep.unconsumed == ("quantizer.typo_module.weight",)
    assert not rep.ok


def test_wlt_conformer_mode_matches():
    """pos_embed_type="conformer" parity: the reference allocates
    rel_pos_embeddings but never applies them (vocoder.py:174-180 vs
    183-217) — attention runs position-free.  Our forward must match, and
    the dead table must still convert from the checkpoint (it is a real
    nn.Parameter that would otherwise be an unconsumed key)."""
    rv = _load_reference_vocoder()
    cfg_t = rv.VocoderModelArgs(
        block_size=256, n_layer=2, n_head=4, dim=64, intermediate_size=128,
        n_local_heads=-1, head_dim=16, rope_base=10000, norm_eps=1e-5,
        dropout_rate=0.0, attn_dropout_rate=0.0, channels_first=True,
        pos_embed_type="conformer", max_relative_position=16,
    )
    torch.manual_seed(3)
    twlt = rv.WindowLimitedTransformer(
        config=cfg_t, input_dim=32, window_size=24, causal=True
    ).float().eval()
    # the conformer table exists in the checkpoint surface
    sd = twlt.state_dict()
    assert "layers.0.attention.rel_pos_embeddings" in sd

    from fish_tts_tpu.utils.checkpoint import _SD, _wlt_from_sd

    sdv = _SD({f"m.{k}": v for k, v in sd.items()})
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32), _wlt_from_sd(sdv, "m", 2)
    )
    # every key consumed (freqs_cis is None in conformer mode, not a buffer
    # in the state_dict; causal_mask is a buffer the converter never needs)
    leftover = {
        k for k in sdv.sd if k not in sdv.used and "causal_mask" not in k
    }
    assert not leftover, leftover
    assert "rel_pos_embeddings" in params["layers"]

    jcfg = VocoderTransformerConfig(
        block_size=256, n_layer=2, n_head=4, dim=64, intermediate_size=128,
        head_dim=16, pos_embed_type="conformer", max_relative_position=16,
    )
    T = 40
    rng = np.random.RandomState(7)
    x = rng.randn(1, 32, T).astype(np.float32) * 0.3
    with torch.no_grad():
        t_out = twlt(torch.from_numpy(x)).numpy()
    j_out = np.asarray(jvoc._wlt_forward(params, jcfg, 24, jnp.asarray(x)))
    np.testing.assert_allclose(j_out, t_out, rtol=1e-4, atol=2e-5)

    # and rope mode on the same shapes still differs (the gate is real)
    jcfg_rope = VocoderTransformerConfig(
        block_size=256, n_layer=2, n_head=4, dim=64, intermediate_size=128,
        head_dim=16, pos_embed_type="rope",
    )
    j_rope = np.asarray(jvoc._wlt_forward(params, jcfg_rope, 24, jnp.asarray(x)))
    assert not np.allclose(j_rope, t_out, atol=1e-3)


def test_vocoder_prefix_strip_ignores_bare_generator_substring(codecs):
    """A NON-prefixed checkpoint containing a key with the bare substring
    "generator" (e.g. "generator_ema") must not trigger the prefix filter
    and lose every real key (reference quirk at synthesizer.py:277-282:
    triggers on "generator", filters on "generator.")."""
    _, tdac, _ = codecs
    sd = dict(tdac.state_dict())
    sd["generator_ema"] = torch.zeros(1)
    out = []
    convert_vocoder_state_dict(sd, CFG, report_out=out)
    (rep,) = out
    # conversion consumed the real keys; only the stray entry is unconsumed
    assert rep.unconsumed == ("generator_ema",)
