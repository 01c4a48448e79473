"""Fused Pallas fast-decoder tests (interpret mode on CPU, tiny config).

The kernel must reproduce the XLA fast-codebook loop: per-step logits to fp
tolerance, the greedy (argmax) code chain exactly, nucleus membership under
random Gumbel noise, and repetition-penalty behavior.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_tts_tpu.config import TINY_CONFIG
from fish_tts_tpu.engine import decode as decode_mod
from fish_tts_tpu.engine.sampling import logits_to_probs_exact
from fish_tts_tpu.models import dual_ar
from fish_tts_tpu.models.dual_ar import TokenIds
from fish_tts_tpu.ops import fast_decoder
from fish_tts_tpu.utils.quantize import qgather, quantize_lm_params

CFG = TINY_CONFIG
IDS = TokenIds(semantic_begin=400, semantic_end=447, im_end=5)
K = CFG.num_codebooks
Vr = CFG.residual_codebook_size
W = decode_mod.WINDOW


@pytest.fixture(scope="module")
def qsetup():
    params = dual_ar.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    qp = quantize_lm_params(params)
    rope = dual_ar.make_rope_tables(CFG)
    return qp, rope


def _xla_chain(qp, rope, h, a0, codes_override=None):
    """XLA fast loop fed a fixed code path; returns per-step logits."""
    dt = jnp.float32
    cache = dual_ar.new_fast_cache(qp, CFG, 1)
    _, cache = dual_ar.fast_step(qp, CFG, rope, h[:, None], jnp.int32(0), cache)
    emb = qgather(qp["fast_embeddings"], a0, dt)[:, None]
    out = []
    for cb in range(1, K):
        lg, cache = dual_ar.fast_step(qp, CFG, rope, emb, jnp.int32(cb), cache)
        short = np.asarray(lg[:, -1, :Vr], np.float32)
        out.append(short)
        nxt = (
            np.asarray([codes_override[cb - 1]])
            if codes_override is not None
            else short.argmax(-1)
        )
        emb = qgather(qp["fast_embeddings"], jnp.asarray(nxt), dt)[:, None]
    return out


def _run_kernel(qp, rope, h, a0, prev=None, gumbel=None,
                t=1e-4, p=0.8, r=1.0):
    if prev is None:
        prev = jnp.zeros((1, K - 1, W), jnp.int32)
    if gumbel is None:
        gumbel = jnp.zeros((1, K - 1, Vr), jnp.float32)
    return fast_decoder.fast_decode_frame(
        qp, CFG, rope["fast"], h, a0, prev, gumbel,
        jnp.float32(t), jnp.float32(p), jnp.float32(r),
        window=W, interpret=True,
    )


def test_kernel_matches_xla_argmax_chain(qsetup):
    """Deterministic sampling (tiny temperature, zero Gumbel): the kernel's
    greedy code chain and per-step logits match the XLA loop."""
    qp, rope = qsetup
    h = jax.random.normal(jax.random.PRNGKey(1), (1, CFG.fast_dim)) * 0.3
    a0 = jnp.asarray([7], jnp.int32)
    codes, klogits = _run_kernel(qp, rope, h, a0)
    codes = np.asarray(codes)[0]
    klogits = np.asarray(klogits)[0]

    xl = _xla_chain(qp, rope, h, a0, codes_override=codes)
    for cb in range(1, K):
        np.testing.assert_allclose(
            klogits[cb - 1], xl[cb - 1][0], rtol=2e-3, atol=5e-3
        )
        assert codes[cb - 1] == xl[cb - 1].argmax(-1)[0]


def test_kernel_codes_stay_in_nucleus(qsetup):
    """Random Gumbel draws: every sampled code is a member of the exact
    top-p nucleus of the kernel's own (penalized) logits."""
    qp, rope = qsetup
    h = jax.random.normal(jax.random.PRNGKey(2), (1, CFG.fast_dim)) * 0.5
    a0 = jnp.asarray([3], jnp.int32)
    top_p = 0.8
    for seed in range(5):
        g = jax.random.gumbel(jax.random.PRNGKey(100 + seed), (1, K - 1, Vr))
        codes, klogits = _run_kernel(
            qp, rope, h, a0, gumbel=g, t=0.7, p=top_p, r=1.0
        )
        codes = np.asarray(codes)[0]
        klogits = np.asarray(klogits)[0]
        for cb in range(K - 1):
            probs = np.asarray(
                logits_to_probs_exact(
                    jnp.asarray(klogits[cb]), jnp.float32(0.7),
                    jnp.float32(top_p), jnp.float32(1.0),
                )
            )
            assert probs[codes[cb]] > 0, (
                f"step {cb}: code {codes[cb]} outside the exact nucleus"
            )


def test_kernel_repetition_penalty_applied(qsetup):
    """A window full of the greedy code with a strong penalty must change
    the logits exactly as the reference formula prescribes."""
    qp, rope = qsetup
    h = jax.random.normal(jax.random.PRNGKey(3), (1, CFG.fast_dim)) * 0.4
    a0 = jnp.asarray([5], jnp.int32)
    _, base_logits = _run_kernel(qp, rope, h, a0, r=1.0)
    base = np.asarray(base_logits)[0, 0]  # step cb=1, unpenalized
    target = int(base.argmax())

    prev = jnp.full((1, K - 1, W), target, jnp.int32)
    _, pen_logits = _run_kernel(qp, rope, h, a0, prev=prev, r=1.9)
    pen = np.asarray(pen_logits)[0, 0]
    expected = base[target] * 1.9 if base[target] < 0 else base[target] / 1.9
    np.testing.assert_allclose(pen[target], expected, rtol=1e-4)
    others = np.delete(np.arange(Vr), target)
    np.testing.assert_allclose(pen[others], base[others], rtol=1e-5)


def test_decode_chunk_with_fast_kernel_interpret(qsetup):
    """decode_chunk(fast_kernel=True) runs end-to-end and emits frames with
    the same validity contract as the XLA path."""
    qp, rope = qsetup
    state = decode_mod.init_state(qp, CFG, batch=1)
    state["pos"] = jnp.asarray([8], jnp.int32)
    t, p, r = jnp.float32(0.7), jnp.float32(0.8), jnp.float32(1.1)
    state, frames, emitted = decode_mod.decode_chunk(
        qp, rope, state, jax.random.PRNGKey(1), t, p, r,
        cfg=CFG, ids=IDS, num_frames=2, top_k=16, fast_kernel=True,
    )
    frames = np.asarray(frames)
    assert frames.shape == (1, 2, 1 + K)
    assert (frames[:, :, 1] >= 0).all() and (frames[:, :, 1] < CFG.codebook_size).all()
    assert (frames[:, :, 2:] >= 0).all() and (frames[:, :, 2:] < Vr).all()


def test_supports_gates():
    params = dual_ar.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    qp = quantize_lm_params(params)
    assert fast_decoder.supports(CFG, qp, batch=1)
    assert fast_decoder.supports(CFG, qp, batch=fast_decoder.MAX_BATCH)
    assert not fast_decoder.supports(CFG, qp, batch=fast_decoder.MAX_BATCH + 1)
    assert not fast_decoder.supports(CFG, params, batch=1)  # bf16/fp32 params


def test_supports_rejects_fast_stack_over_vmem():
    """A quantized fast stack larger than the kernel's VMEM budget must be
    rejected by supports() (fall back to XLA) instead of passing the gate
    and dying in Mosaic compilation."""
    import dataclasses

    import numpy as _np

    big_cfg = dataclasses.replace(
        CFG, fast_dim=2048, fast_intermediate_size=8192, n_fast_layer=8,
    )
    L, D, I = 8, 2048, 8192
    H, Dh = big_cfg.fast_n_head, big_cfg.fast_head_dim
    Hkv = big_cfg.fast_n_local_heads

    def q(shape):
        # np.empty: shapes are what the estimate reads; contents never are
        return {"q": _np.empty(shape, _np.int8),
                "s": _np.empty((shape[0], 1, shape[-1]), _np.float32)}

    big_params = {
        "fast_layers": {
            "wqkv": q((L, D, (H + 2 * Hkv) * Dh)),
            "wo": q((L, H * Dh, D)),
            "w1": q((L, D, I)),
            "w3": q((L, D, I)),
            "w2": q((L, I, D)),
            "attention_norm": _np.empty((L, D), _np.float32),
            "ffn_norm": _np.empty((L, D), _np.float32),
        },
        "fast_embeddings": q((4096, D)),
        "fast_output": q((D, 4096)),
        "fast_norm": _np.empty((D,), _np.float32),
    }
    assert fast_decoder._vmem_estimate(big_cfg, big_params, 1) \
        > fast_decoder._VMEM_BUDGET
    assert not fast_decoder.supports(big_cfg, big_params, batch=1)


def test_batched_kernel_matches_per_stream_runs(qsetup):
    """B concurrent streams through one kernel produce exactly what B
    separate B=1 invocations produce for the same per-stream inputs —
    batching must be semantics-free (it only amortizes weight streaming)."""
    qp, rope = qsetup
    B = 3
    rng = jax.random.PRNGKey(40)
    h = jax.random.normal(rng, (B, CFG.fast_dim)) * 0.4
    a0 = jnp.asarray([1, 9, 4], jnp.int32)
    prev = jax.random.randint(
        jax.random.PRNGKey(41), (B, K - 1, W), 0, Vr).astype(jnp.int32)
    g = jax.random.gumbel(jax.random.PRNGKey(42), (B, K - 1, Vr))
    # per-stream sampling params exercise the (B, 1) column path
    temps = jnp.asarray([[0.7], [0.9], [0.5]], jnp.float32)
    tops = jnp.asarray([[0.8], [0.6], [0.95]], jnp.float32)
    reps = jnp.asarray([[1.1], [1.3], [1.0]], jnp.float32)

    codes_b, logits_b = fast_decoder.fast_decode_frame(
        qp, CFG, rope["fast"], h, a0, prev, g, temps, tops, reps,
        window=W, interpret=True,
    )
    for b in range(B):
        codes_1, logits_1 = fast_decoder.fast_decode_frame(
            qp, CFG, rope["fast"], h[b:b + 1], a0[b:b + 1],
            prev[b:b + 1], g[b:b + 1],
            temps[b, 0], tops[b, 0], reps[b, 0],
            window=W, interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(codes_b)[b], np.asarray(codes_1)[0]
        )
        np.testing.assert_allclose(
            np.asarray(logits_b)[b], np.asarray(logits_1)[0],
            rtol=1e-5, atol=1e-5,
        )


def test_decode_chunk_batched_fast_kernel_interpret(qsetup):
    """decode_chunk(fast_kernel=True) at B>1: the fused fast decoder runs
    for the whole batch and emits valid frames per stream."""
    qp, rope = qsetup
    B = 3
    state = decode_mod.init_state(qp, CFG, batch=B)
    state["pos"] = jnp.asarray([8, 10, 9], jnp.int32)
    t, p, r = jnp.float32(0.7), jnp.float32(0.8), jnp.float32(1.1)
    state, frames, emitted = decode_mod.decode_chunk(
        qp, rope, state, jax.random.PRNGKey(1), t, p, r,
        cfg=CFG, ids=IDS, num_frames=2, top_k=-1, fast_kernel=True,
    )
    frames = np.asarray(frames)
    assert frames.shape == (B, 2, 1 + K)
    assert (frames[:, :, 1] >= 0).all() and (frames[:, :, 1] < CFG.codebook_size).all()
    assert (frames[:, :, 2:] >= 0).all() and (frames[:, :, 2:] < Vr).all()


def test_prefill_chunk_first_frame_matches_bare_prefill_kernel_path(qsetup):
    """prefill_chunk forwards fast_kernel to the inner prefill, so the fused
    TTFA path's first frame is bit-identical to serve admission's bare
    prefill(fast_kernel=True) for the same key (the fused kernel consumes
    its gumbel draw differently from the XLA path, so the flag must not be
    dropped on one side)."""
    qp, rope = qsetup
    T = 8
    prompt = np.zeros((1, 1 + K, T), np.int32)
    prompt[0, 0] = np.arange(1, T + 1)
    lengths = jnp.asarray([T], jnp.int32)
    t, p, r = jnp.float32(0.7), jnp.float32(0.8), jnp.float32(1.1)
    key = jax.random.PRNGKey(7)

    st1 = decode_mod.init_state(qp, CFG, batch=1)
    _, frames, _ = decode_mod.prefill_chunk(
        qp, rope, st1, jnp.asarray(prompt), lengths, key, t, p, r,
        cfg=CFG, ids=IDS, num_frames=2, fast_kernel=True,
    )
    st2 = decode_mod.init_state(qp, CFG, batch=1)
    k1 = jax.vmap(lambda k: jax.random.fold_in(k, 0x7FFFFFFF))(
        decode_mod.normalize_keys(key, 1)
    )
    _, first = decode_mod.prefill(
        qp, rope, st2, jnp.asarray(prompt), lengths, k1, t, p, r,
        cfg=CFG, ids=IDS, fast_kernel=True,
    )
    np.testing.assert_array_equal(np.asarray(frames)[:, 0], np.asarray(first))


def test_dequant_modes_agree(qsetup):
    """The three dequant modes (ops/fast_decoder.DEQUANT_MODES): "scratch"
    and "value" are both exact s8->bf16 dequantization and must agree to the
    bit; "s8" adds per-row 8-bit activation rounding and must stay within a
    small relative tolerance of the exact logits while sampling only codes
    from its OWN exact nucleus (self-consistency is the quality bar — the
    sampled code may differ from the exact modes')."""
    qp, rope = qsetup
    h = jax.random.normal(jax.random.PRNGKey(50), (2, CFG.fast_dim)) * 0.4
    a0 = jnp.asarray([7, 3], jnp.int32)
    prev = jnp.zeros((2, K - 1, W), jnp.int32)
    g = jax.random.gumbel(jax.random.PRNGKey(51), (2, K - 1, Vr))

    outs = {}
    for mode in fast_decoder.DEQUANT_MODES:
        codes, logits = fast_decoder.fast_decode_frame(
            qp, CFG, rope["fast"], h, a0, prev, g,
            jnp.float32(0.7), jnp.float32(0.8), jnp.float32(1.1),
            window=W, interpret=True, dequant=mode,
        )
        outs[mode] = (np.asarray(codes), np.asarray(logits))

    np.testing.assert_array_equal(outs["scratch"][0], outs["value"][0])
    np.testing.assert_array_equal(outs["scratch"][1], outs["value"][1])

    exact, s8 = outs["value"][1], outs["s8"][1]
    scale = np.abs(exact).max()
    assert np.abs(exact - s8).max() <= 0.03 * scale, (
        "s8 activation quantization drifted beyond 3% of the logit range"
    )
    # every s8-sampled code is in the exact top-p nucleus of s8's own logits
    codes_s8 = outs["s8"][0]
    for b in range(codes_s8.shape[0]):
        for cb in range(K - 1):
            probs = np.asarray(
                logits_to_probs_exact(
                    jnp.asarray(s8[b, cb]), jnp.float32(0.7),
                    jnp.float32(0.8), jnp.float32(1.0),
                )
            )
            assert probs[codes_s8[b, cb]] > 0


def test_default_dequant_supported_at_s1_shapes():
    """The production default mode must pass the supports() gate at S1-mini
    shapes for every serving batch size — round 4 shipped a silently gated
    kernel (supports() returned False at S1-mini, decode fell back to the
    XLA fast loop, and the driver recorded it as a 532 -> 339 tok/s
    regression)."""
    import numpy as _np

    from fish_tts_tpu.config import S1_MINI_CONFIG as scfg

    L, D, I = scfg.n_fast_layer, scfg.fast_dim, scfg.fast_intermediate_size
    H, Dh, Hkv = scfg.fast_n_head, scfg.fast_head_dim, scfg.fast_n_local_heads

    def q(shape):
        return {"q": _np.empty(shape, _np.int8),
                "s": _np.empty((shape[0], 1, shape[-1]), _np.float32)}

    p = {
        "fast_layers": {
            "wqkv": q((L, D, (H + 2 * Hkv) * Dh)),
            "wo": q((L, H * Dh, D)),
            "w1": q((L, D, I)), "w3": q((L, D, I)), "w2": q((L, I, D)),
            "attention_norm": _np.empty((L, D), _np.float32),
            "ffn_norm": _np.empty((L, D), _np.float32),
        },
        "fast_embeddings": q((scfg.codebook_size, D)),
        "fast_output": q((D, scfg.codebook_size)),
        "fast_norm": _np.empty((D,), _np.float32),
    }
    for B in (1, 8, fast_decoder.MAX_BATCH):
        assert fast_decoder.supports(scfg, p, B), (
            f"default dequant mode gated off at S1-mini B={B}"
        )
