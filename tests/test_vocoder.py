"""Vocoder tests: conv-lowering parity vs torch, causality/streaming
exactness, shape contracts, quantizer behavior.

Torch (CPU) is used as an *oracle for primitive numerics only* — our
causal-conv lowering onto lax.conv_general_dilated must match
torch.nn.functional conv semantics bit-for-bit in fp32, since cloned-voice
fidelity depends on it (SURVEY §7 hard part d).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_tts_tpu.config import TINY_VOCODER_CONFIG
from fish_tts_tpu.models import vocoder
from fish_tts_tpu.ops.conv import (
    causal_conv1d,
    causal_conv_transpose1d,
    conv_transpose1d,
    fold_weight_norm,
)
from fish_tts_tpu.ops.norms import snake

VCFG = TINY_VOCODER_CONFIG


@pytest.fixture(scope="module")
def vparams():
    return vocoder.init_vocoder_params(jax.random.PRNGKey(0), VCFG)


# ---------------------------------------------------------------------------
# Primitive parity vs torch
# ---------------------------------------------------------------------------


def test_causal_conv_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 50).astype(np.float32)
    w = rng.randn(5, 3, 7).astype(np.float32)
    b = rng.randn(5).astype(np.float32)

    for stride, dilation in [(1, 1), (1, 3), (2, 1), (4, 1)]:
        eff_k = (7 - 1) * dilation + 1
        pad = eff_k - stride
        # reference pads (pad, extra) then convs with no padding
        from fish_tts_tpu.ops.conv import extra_padding_for_conv1d

        extra = extra_padding_for_conv1d(50, eff_k, stride, pad)
        xt = F.pad(torch.from_numpy(x), (pad, extra))
        ref = F.conv1d(
            xt, torch.from_numpy(w), torch.from_numpy(b),
            stride=stride, dilation=dilation,
        ).numpy()
        ours = np.asarray(
            causal_conv1d(
                jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                stride=stride, dilation=dilation,
            )
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_conv_transpose_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(1)
    x = rng.randn(2, 4, 20).astype(np.float32)
    for stride, k in [(2, 2), (2, 4), (8, 16), (1, 3)]:
        w = rng.randn(4, 6, k).astype(np.float32)
        b = rng.randn(6).astype(np.float32)
        ref = F.conv_transpose1d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
            stride=stride,
        ).numpy()
        ours = np.asarray(
            conv_transpose1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=stride)
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)
        # causal variant trims k - stride from the right
        ours_c = np.asarray(
            causal_conv_transpose1d(
                jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=stride
            )
        )
        trim = k - stride
        expect = ref[..., :-trim] if trim else ref
        np.testing.assert_allclose(ours_c, expect, rtol=1e-4, atol=1e-4)


def test_phase_transpose_equals_dilated_lowering():
    """The phase-decomposed (depth-to-space) transposed-conv lowering is
    bit-equivalent to the textbook lhs_dilation form on every shape class:
    K multiple of stride (all DAC layers), K not a multiple, and T=1."""
    from fish_tts_tpu.ops import conv as conv_mod

    rng = np.random.RandomState(7)
    for cin, cout, k, s, t in [
        (8, 6, 16, 8, 5), (6, 4, 4, 2, 33), (5, 3, 5, 3, 9), (4, 4, 3, 2, 1),
    ]:
        x = jnp.asarray(rng.randn(2, cin, t).astype(np.float32))
        w = jnp.asarray(rng.randn(cin, cout, k).astype(np.float32))
        a = np.asarray(conv_mod._conv_transpose1d_dilated(x, w, s))
        p = np.asarray(conv_mod._conv_transpose1d_phase(x, w, s))
        assert a.shape == p.shape
        np.testing.assert_allclose(p, a, rtol=1e-5, atol=1e-5)


def test_weight_norm_folding_matches_torch():
    import torch

    rng = np.random.RandomState(2)
    v = rng.randn(8, 4, 7).astype(np.float32)
    g = rng.rand(8, 1, 1).astype(np.float32) + 0.5
    vt = torch.from_numpy(v)
    norm = vt.norm(dim=(1, 2), keepdim=True)
    ref = (torch.from_numpy(g) * vt / norm).numpy()
    ours = np.asarray(fold_weight_norm(jnp.asarray(v), jnp.asarray(g)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_snake_formula():
    """snake(x) = x + sin^2(alpha x)/(alpha + 1e-9) (dac.nn.layers.Snake1d)."""
    x = np.linspace(-2, 2, 32, dtype=np.float32).reshape(1, 2, 16)
    alpha = np.array([0.5, 2.0], np.float32).reshape(1, 2, 1)
    expected = x + np.sin(alpha * x) ** 2 / (alpha + 1e-9)
    ours = np.asarray(snake(jnp.asarray(x), jnp.asarray(alpha)))
    np.testing.assert_allclose(ours, expected, rtol=1e-6)


# ---------------------------------------------------------------------------
# Codec-level contracts
# ---------------------------------------------------------------------------


def _rand_codes(n, seed=0):
    rng = np.random.RandomState(seed)
    codes = rng.randint(0, VCFG.residual_codebook_size, (1, VCFG.num_codebooks, n))
    codes[:, 0] = rng.randint(0, VCFG.semantic_codebook_size, (1, n))
    return codes.astype(np.int32)


def test_decode_shape_contract(vparams):
    """n codes -> exactly n * frame_length samples (vocoder.py:906-912)."""
    codes = _rand_codes(6)
    audio = np.asarray(vocoder.dac_decode(vparams, VCFG, jnp.asarray(codes)))
    assert audio.shape == (1, 1, 6 * VCFG.frame_length)
    assert np.abs(audio).max() <= 1.0  # tanh output


def test_decode_causal_prefix_property(vparams):
    """decode(codes[:n]) == decode(codes)[:n*frame_length]: every op in the
    decode path is causal, which is what makes chunked streaming decode
    sample-exact for the prefix."""
    codes = _rand_codes(10)
    full = np.asarray(vocoder.dac_decode(vparams, VCFG, jnp.asarray(codes)))
    part = np.asarray(vocoder.dac_decode(vparams, VCFG, jnp.asarray(codes[:, :, :4])))
    np.testing.assert_allclose(
        part[0, 0], full[0, 0, : 4 * VCFG.frame_length], rtol=1e-4, atol=1e-5
    )


def test_decode_clamps_out_of_range(vparams):
    """Reference clamps indices to codebook size (vocoder.py:800-807)."""
    codes = _rand_codes(4)
    big = codes.copy()
    big[:, :, :] = 10**6
    clamped = codes.copy()
    clamped[:, 0] = VCFG.semantic_codebook_size - 1
    clamped[:, 1:] = VCFG.residual_codebook_size - 1
    a1 = np.asarray(vocoder.dac_decode(vparams, VCFG, jnp.asarray(big)))
    a2 = np.asarray(vocoder.dac_decode(vparams, VCFG, jnp.asarray(clamped)))
    np.testing.assert_allclose(a1, a2, rtol=1e-5)


def test_encode_shape_contract(vparams):
    """T samples -> ceil(T / frame_length) codes (vocoder.py:885-904)."""
    fl = VCFG.frame_length
    for T in (3 * fl, 3 * fl + 1, 3 * fl - 1):
        audio = np.random.RandomState(3).randn(1, 1, T).astype(np.float32) * 0.1
        codes = np.asarray(vocoder.dac_encode(vparams, VCFG, jnp.asarray(audio)))
        n_expected = -(-T // fl)
        assert codes.shape == (1, VCFG.num_codebooks, n_expected)
        assert codes[:, 0].max() < VCFG.semantic_codebook_size
        assert codes[:, 1:].max() < VCFG.residual_codebook_size
        assert codes.min() >= 0


def test_encode_decode_roundtrip_stability(vparams):
    """encode(decode(codes)) with random weights won't reproduce codes, but
    the full loop must run and produce valid ranges (smoke of both paths)."""
    codes = _rand_codes(4)
    audio = vocoder.dac_decode(vparams, VCFG, jnp.asarray(codes))
    codes2 = np.asarray(vocoder.dac_encode(vparams, VCFG, audio))
    assert codes2.shape == codes.shape


def test_quantizer_residual_reduces_error(vparams):
    """Each residual codebook must not increase reconstruction error of the
    quantized latent (greedy RVQ property)."""
    rng = np.random.RandomState(4)
    z = rng.randn(1, VCFG.quantizer_input_dim, 8).astype(np.float32)
    qp = vparams["quantizer"]
    from fish_tts_tpu.models.vocoder import _vq_embed_codes, _vq_in_proj, _vq_nearest

    sem_codes = _vq_nearest(qp["semantic"], _vq_in_proj(qp["semantic"], jnp.asarray(z)))
    acc = np.asarray(_vq_embed_codes(qp["semantic"], sem_codes))
    err_prev = np.linalg.norm(z - acc)
    for vq in qp["residual"]:
        resid = jnp.asarray(z - acc)
        c = _vq_nearest(vq, _vq_in_proj(vq, resid))
        acc = acc + np.asarray(_vq_embed_codes(vq, c))
        err = np.linalg.norm(z - acc)
        # out_proj is random, so strict monotonicity isn't guaranteed — just
        # require boundedness and finiteness of the greedy loop.
        assert np.isfinite(err)
        err_prev = err


# ---------------------------------------------------------------------------
# Stateful streaming decode (models/vocoder_stream.py)
# ---------------------------------------------------------------------------


def test_streaming_decode_matches_joint(vparams):
    """Carried-state chunked decode == one joint dac_decode, for uneven
    chunk splits — the exactness contract (no context recompute at all)."""
    import jax.numpy as jnp

    from fish_tts_tpu.models import vocoder_stream as vs

    params, cfg = vparams, TINY_VOCODER_CONFIG
    rng = np.random.RandomState(0)
    T = 37
    codes = rng.randint(0, 24, (1, cfg.num_codebooks, T)).astype(np.int32)
    codes[0, 0] = rng.randint(0, 48, T)

    full = np.asarray(vocoder.dac_decode(params, cfg, jnp.asarray(codes)))

    for splits in ([10, 20, 7], [1, 1, 35], [37], [5] * 7 + [2]):
        st = vs.init_decode_state(params, cfg, batch=1)
        out = []
        t0 = 0
        for n in splits:
            st, audio = vs.decode_chunk(
                params, cfg, st, jnp.asarray(codes[:, :, t0:t0 + n])
            )
            out.append(np.asarray(audio))
            t0 += n
        streamed = np.concatenate(out, axis=-1)
        assert streamed.shape == full.shape
        np.testing.assert_allclose(streamed, full, rtol=1e-4, atol=2e-5)


def test_streaming_decode_beyond_wlt_window(vparams):
    """Sequences longer than the WLT window exercise the rolling-KV
    eviction: equality must hold when early positions have left the
    window."""
    import jax.numpy as jnp

    from fish_tts_tpu.models import vocoder_stream as vs

    params, cfg = vparams, TINY_VOCODER_CONFIG
    W = cfg.quantizer_window
    T = W + 13
    rng = np.random.RandomState(1)
    codes = rng.randint(0, 24, (1, cfg.num_codebooks, T)).astype(np.int32)
    codes[0, 0] = rng.randint(0, 48, T)
    full = np.asarray(vocoder.dac_decode(params, cfg, jnp.asarray(codes)))

    st = vs.init_decode_state(params, cfg, batch=1)
    out = []
    t0 = 0
    for n in ([16] * (T // 16) + ([T % 16] if T % 16 else [])):
        st, audio = vs.decode_chunk(
            params, cfg, st, jnp.asarray(codes[:, :, t0:t0 + n])
        )
        out.append(np.asarray(audio))
        t0 += n
    streamed = np.concatenate(out, axis=-1)
    np.testing.assert_allclose(streamed, full, rtol=1e-4, atol=3e-5)


def test_streaming_decode_batched_matches_per_stream(vparams):
    """B=2 streaming decode equals two independent B=1 streams (state is
    per-stream; batching only vectorizes)."""
    import jax.numpy as jnp

    from fish_tts_tpu.models import vocoder_stream as vs

    params, cfg = vparams, TINY_VOCODER_CONFIG
    rng = np.random.RandomState(5)
    T = 24
    codes = rng.randint(0, 24, (2, cfg.num_codebooks, T)).astype(np.int32)
    codes[:, 0] = rng.randint(0, 48, (2, T))

    st = vs.init_decode_state(params, cfg, batch=2)
    out_b = []
    for t0 in range(0, T, 8):
        st, audio = vs.decode_chunk(params, cfg, st,
                                    jnp.asarray(codes[:, :, t0:t0 + 8]))
        out_b.append(np.asarray(audio))
    batched = np.concatenate(out_b, axis=-1)

    for b in range(2):
        st1 = vs.init_decode_state(params, cfg, batch=1)
        out1 = []
        for t0 in range(0, T, 8):
            st1, audio = vs.decode_chunk(
                params, cfg, st1, jnp.asarray(codes[b:b + 1, :, t0:t0 + 8]))
            out1.append(np.asarray(audio))
        solo = np.concatenate(out1, axis=-1)
        np.testing.assert_allclose(batched[b], solo[0], rtol=1e-5, atol=1e-6)


def test_streaming_decode_pool_joins_and_leaves(vparams):
    """Slot-pool decode (decode_chunk_pool): streams join (reset), idle
    (inactive), end on a ragged zero-padded tail, and get replaced — each
    stream's emitted audio equals its solo B=1 stream decode, with the
    padded tail truncated host-side (causality makes padding invisible)."""
    import jax.numpy as jnp

    from fish_tts_tpu.models import vocoder_stream as vs

    params, cfg = vparams, TINY_VOCODER_CONFIG
    fl = cfg.frame_length
    N = 8  # pool chunk width
    rng = np.random.RandomState(7)

    def mk(T, seed):
        c = rng.randint(0, 24, (1, cfg.num_codebooks, T)).astype(np.int32)
        c[0, 0] = rng.randint(0, 48, T)
        return c

    A = mk(32, 0)   # slot 0, rounds 0-3, aligned
    B = mk(13, 1)   # slot 1, joins round 1, ragged tail (13 = 8 + 5)
    C = mk(8, 2)    # slot 2, round 0 only
    D = mk(8, 3)    # slot 2 successor, resets at round 3

    # schedule: per round, per slot -> (codes_chunk|None, reset)
    rounds = [
        [(A[:, :, 0:8], True), (None, False), (C, True)],
        [(A[:, :, 8:16], False), (B[:, :, 0:8], True), (None, False)],
        [(A[:, :, 16:24], False), (B[:, :, 8:13], False), (None, False)],
        [(A[:, :, 24:32], False), (None, False), (D, True)],
    ]

    st = vs.init_decode_state(params, cfg, batch=3)
    got: dict[str, list[np.ndarray]] = {}
    names = [["A"] * 4, [None, "B", "B", None], ["C", None, None, "D"]]
    for r, row in enumerate(rounds):
        codes = np.zeros((3, cfg.num_codebooks, N), np.int32)
        active = np.zeros((3,), bool)
        reset = np.zeros((3,), bool)
        m = [0] * 3
        for s, (chunk, rs) in enumerate(row):
            if chunk is not None:
                m[s] = chunk.shape[-1]
                codes[s, :, : m[s]] = chunk[0]
                active[s] = True
                reset[s] = rs
        st, audio = vs.decode_chunk_pool(
            params, cfg, st, jnp.asarray(codes),
            jnp.asarray(active), jnp.asarray(reset),
        )
        audio = np.asarray(audio)
        for s in range(3):
            if m[s]:
                got.setdefault(names[s][r], []).append(
                    audio[s: s + 1, :, : m[s] * fl]
                )

    for name, codes, splits in (
        ("A", A, [8, 8, 8, 8]), ("B", B, [8, 5]), ("C", C, [8]),
        ("D", D, [8]),
    ):
        st1 = vs.init_decode_state(params, cfg, batch=1)
        solo = []
        t0 = 0
        for n in splits:
            st1, audio = vs.decode_chunk(
                params, cfg, st1, jnp.asarray(codes[:, :, t0:t0 + n])
            )
            solo.append(np.asarray(audio))
            t0 += n
        np.testing.assert_allclose(
            np.concatenate(got[name], axis=-1),
            np.concatenate(solo, axis=-1), rtol=1e-5, atol=1e-5,
        )


def test_stream_wlt_positions_beyond_rope_table(vparams):
    """A continuous stream older than ``block_size`` frames (long-form
    serving carries ONE vocoder stream across chain segments) must keep
    rotating correctly: positions beyond the precomputed RoPE table use
    on-the-fly angles.  Oracle: the same positions fully inside an enlarged
    table.  A clamped gather (the old behavior) freezes rotation at the last
    row and fails both assertions."""
    import dataclasses

    from fish_tts_tpu.models import vocoder_stream as vs

    params, cfg = vparams, TINY_VOCODER_CONFIG
    qp = params["quantizer"]["post"]
    tcfg = cfg.quantizer_transformer
    window = cfg.quantizer_window
    cin = qp["input_proj"]["w"].shape[0] if "input_proj" in qp else tcfg.dim
    x = jax.random.normal(jax.random.PRNGKey(7), (1, cin, 8), jnp.float32)
    dtype = qp["layers"]["wqkv"].dtype

    def run(tc, off_delta):
        st = vs.init_wlt_state(qp, tc, window, 1, dtype)
        st["off"] = st["off"] + off_delta
        st, o = vs.stream_wlt(st, qp, tc, window, x)
        return np.asarray(o)

    delta = tcfg.block_size + 37  # beyond the table
    fixed = run(tcfg, delta)
    oracle = run(dataclasses.replace(tcfg, block_size=8192), delta)
    np.testing.assert_allclose(fixed, oracle, rtol=0, atol=2e-3)
    # windowed attention is translation-invariant up to angle rounding
    np.testing.assert_allclose(fixed, run(tcfg, 0), rtol=0, atol=2e-3)
