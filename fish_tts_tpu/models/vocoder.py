"""DAC-style neural audio codec, TPU-native.

Functional JAX re-design of the reference vocoder
(/root/reference/fish_tts/models/vocoder.py) and of the pieces it pulls from
the external ``dac``/``audiotools`` packages (``ResidualVectorQuantize``,
``Snake1d``, ``WNConv1d`` — vocoder.py:18-23).  Everything here is plain
pytrees + pure functions lowered to XLA convs; weight norm is folded at load
time (ops/conv.py:fold_weight_norm).

Architecture (wiring fixed by reference synthesizer.py:199-269):

  audio 44.1 kHz
    │ Encoder: stem conv → 4× EncoderBlock (3 dilated ResidualUnits + Snake +
    │          stride conv [+ window-512 transformer in the last stage]),
    │          rates (2,4,8,8) ⇒ hop 512            (vocoder.py:474-575)
    ▼
  latent (B, 1024, T/512)
    │ Quantizer (DownsampleResidualVectorQuantize, vocoder.py:683-814):
    │   2× (causal stride-2 conv + ConvNeXt) downsample ⇒ /4
    │   pre window-128 transformer
    │   semantic RVQ (1×4096, dim 8) + residual RVQ (9×1024, dim 8)
    │   post window-128 transformer
    │   2× (causal transposed conv + ConvNeXt) upsample
    ▼
  codes (B, 10, T/2048)  —  21.53 tokens/s of audio
    │ Decoder: stem conv → 4× DecoderBlock (Snake + transposed conv +
    │          3 ResidualUnits), rates (8,8,4,2) → Snake → conv → tanh
    ▼
  audio (B, 1, T)

Replicated quirk: ``decoder_transformer_layers`` is accepted but dropped, as
the reference ``DecoderBlock`` ignores ``n_t_layer`` (vocoder.py:578-599) and
those checkpoint weights never load.

All convs are causal (reference DAC built with causal=True, synthesizer.py:259),
so right-padding codes/audio never changes earlier outputs — that property is
what makes chunked streaming decode exact (tests/test_vocoder.py).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from fish_tts_tpu.config import VocoderConfig, VocoderTransformerConfig
from fish_tts_tpu.ops.attention import attention, window_causal_bias
from fish_tts_tpu.ops.conv import causal_conv1d, causal_conv_transpose1d
from fish_tts_tpu.ops.norms import layer_norm, silu, snake, vocoder_rms_norm
from fish_tts_tpu.ops.rope import apply_rotary_emb, precompute_freqs_cis

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# Initializers (random; checkpoint loading replaces these leaves 1:1)
# ---------------------------------------------------------------------------


def _conv_p(key, c_out, c_in, k, dtype, groups=1):
    w = jax.random.truncated_normal(key, -2, 2, (c_out, c_in // groups, k), jnp.float32)
    w = w * 0.02
    return {"w": w.astype(dtype), "b": jnp.zeros((c_out,), dtype)}


def _tconv_p(key, c_in, c_out, k, dtype):
    w = jax.random.truncated_normal(key, -2, 2, (c_in, c_out, k), jnp.float32) * 0.02
    return {"w": w.astype(dtype), "b": jnp.zeros((c_out,), dtype)}


def _linear_p(key, d_in, d_out, dtype, bias=True):
    w = jax.random.truncated_normal(key, -2, 2, (d_in, d_out), jnp.float32) * 0.02
    p = {"w": w.astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def _snake_p(dim, dtype):
    return jnp.ones((1, dim, 1), dtype)


def _residual_unit_p(key, dim, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "snake1": _snake_p(dim, dtype),
        "conv1": _conv_p(k1, dim, dim, 7, dtype),
        "snake2": _snake_p(dim, dtype),
        "conv2": _conv_p(k2, dim, dim, 1, dtype),
    }


def _wlt_p(key, tcfg: VocoderTransformerConfig, input_dim: int, dtype):
    """WindowLimitedTransformer params, stacked layers (vocoder.py:296-354)."""
    ks = jax.random.split(key, 8)
    L, D, I = tcfg.n_layer, tcfg.dim, tcfg.intermediate_size
    qkv_out = (tcfg.n_head + 2 * tcfg.n_local_heads) * tcfg.head_dim

    def stack(k, d_in, d_out):
        return (
            jax.random.truncated_normal(k, -2, 2, (L, d_in, d_out), jnp.float32) * 0.02
        ).astype(dtype)

    p: Params = {
        "layers": {
            "wqkv": stack(ks[0], D, qkv_out),
            "wo": stack(ks[1], tcfg.n_head * tcfg.head_dim, D),
            "w1": stack(ks[2], D, I),
            "w3": stack(ks[3], D, I),
            "w2": stack(ks[4], I, D),
            "attention_norm": jnp.ones((L, D), dtype),
            "ffn_norm": jnp.ones((L, D), dtype),
            "attn_scale": jnp.full((L, D), 1e-2, dtype),
            "ffn_scale": jnp.full((L, D), 1e-2, dtype),
        },
        "norm": jnp.ones((D,), dtype),
    }
    if input_dim != tcfg.dim:
        p["input_proj"] = _linear_p(ks[5], input_dim, D, dtype)
        p["output_proj"] = _linear_p(ks[6], D, input_dim, dtype)
    if tcfg.pos_embed_type == "conformer":
        # Allocated-but-unused, replicating the reference quirk
        # (vocoder.py:174-180 creates the table; forward never reads it).
        p["layers"]["rel_pos_embeddings"] = (
            jax.random.truncated_normal(
                ks[7], -2, 2,
                (L, 2 * tcfg.max_relative_position + 1, tcfg.head_dim),
                jnp.float32,
            ) * 0.02
        ).astype(dtype)
    return p


def _convnext_p(key, dim, dtype, mlp_ratio=4.0):
    ks = jax.random.split(key, 3)
    hidden = int(mlp_ratio * dim)
    return {
        "dwconv": _conv_p(ks[0], dim, dim, 7, dtype, groups=dim),
        "norm_w": jnp.ones((dim,), dtype),
        "norm_b": jnp.zeros((dim,), dtype),
        "pw1": _linear_p(ks[1], dim, hidden, dtype),
        "pw2": _linear_p(ks[2], hidden, dim, dtype),
        "gamma": jnp.full((dim,), 1e-6, dtype),
    }


def _vq_p(key, input_dim, codebook_size, codebook_dim, dtype):
    """One VectorQuantize: in/out 1x1 convs + codebook (dac.nn.quantize)."""
    ks = jax.random.split(key, 3)
    return {
        "in_proj": _conv_p(ks[0], codebook_dim, input_dim, 1, dtype),
        "out_proj": _conv_p(ks[1], input_dim, codebook_dim, 1, dtype),
        "codebook": (
            jax.random.normal(ks[2], (codebook_size, codebook_dim), jnp.float32)
        ).astype(dtype),
    }


def _stage_tcfg(d: int, n_t: int) -> VocoderTransformerConfig:
    """Encoder-stage WLT wiring (reference vocoder.py:513-524): heads of 64,
    3x FFN.  One definition shared by init and forward so the two cannot
    drift apart."""
    return VocoderTransformerConfig(
        block_size=16384, n_layer=n_t, n_head=d // 64, dim=d,
        intermediate_size=d * 3, head_dim=64,
    )


def _key_stream(key):
    """Unbounded stream of fresh subkeys (a fixed-size split would cap the
    config sizes init can handle)."""
    while True:
        key, sub = jax.random.split(key)
        yield sub


def init_vocoder_params(key, cfg: VocoderConfig, dtype=jnp.float32) -> Params:
    """Random-init the full codec parameter pytree."""
    ks = _key_stream(key)
    tq = cfg.quantizer_transformer

    # --- encoder ---
    d = cfg.encoder_dim
    enc: Params = {"stem": _conv_p(next(ks), d, 1, 7, dtype), "blocks": []}
    for stride, n_t in zip(cfg.encoder_rates, cfg.encoder_transformer_layers):
        d *= 2
        block = {
            "units": [_residual_unit_p(next(ks), d // 2, dtype) for _ in range(3)],
            "snake": _snake_p(d // 2, dtype),
            "down": _conv_p(next(ks), d, d // 2, 2 * stride, dtype),
        }
        if n_t > 0:
            block["wlt"] = _wlt_p(next(ks), _stage_tcfg(d, n_t), d, dtype)
        enc["blocks"].append(block)
    enc["final_snake"] = _snake_p(d, dtype)
    enc["final_conv"] = _conv_p(next(ks), cfg.latent_dim, d, 3, dtype)

    # --- quantizer ---
    qd = cfg.quantizer_input_dim
    quant: Params = {
        "downsample": [
            {
                "conv": _conv_p(next(ks), qd, qd, f, dtype),
                "convnext": _convnext_p(next(ks), qd, dtype),
            }
            for f in cfg.downsample_factor
        ],
        "pre": _wlt_p(next(ks), tq, qd, dtype),
        "post": _wlt_p(next(ks), tq, qd, dtype),
        "semantic": _vq_p(next(ks), qd, cfg.semantic_codebook_size, cfg.codebook_dim, dtype),
        "residual": [
            _vq_p(next(ks), qd, cfg.residual_codebook_size, cfg.codebook_dim, dtype)
            for _ in range(cfg.n_residual_codebooks)
        ],
        "upsample": [
            {
                "tconv": _tconv_p(next(ks), qd, qd, f, dtype),
                "convnext": _convnext_p(next(ks), qd, dtype),
            }
            for f in reversed(cfg.downsample_factor)
        ],
    }

    # --- decoder ---
    ch = cfg.decoder_dim
    dec: Params = {"stem": _conv_p(next(ks), ch, cfg.latent_dim, 7, dtype), "blocks": []}
    out_dim = ch
    for i, stride in enumerate(cfg.decoder_rates):
        in_dim = ch // (2**i)
        out_dim = ch // (2 ** (i + 1))
        dec["blocks"].append(
            {
                "snake": _snake_p(in_dim, dtype),
                "up": _tconv_p(next(ks), in_dim, out_dim, 2 * stride, dtype),
                "units": [_residual_unit_p(next(ks), out_dim, dtype) for _ in range(3)],
            }
        )
    dec["final_snake"] = _snake_p(out_dim, dtype)
    dec["final_conv"] = _conv_p(next(ks), 1, out_dim, 7, dtype)

    return {"encoder": enc, "quantizer": quant, "decoder": dec}


# ---------------------------------------------------------------------------
# Forward pieces
# ---------------------------------------------------------------------------


def _residual_unit(p: Params, x: jnp.ndarray, dilation: int) -> jnp.ndarray:
    """Snake → dilated conv7 → Snake → conv1, residual (vocoder.py:474-495).
    Causal stride-1 convs preserve length, so no trim is needed."""
    y = snake(x, p["snake1"])
    y = causal_conv1d(y, p["conv1"]["w"], p["conv1"]["b"], dilation=dilation)
    y = snake(y, p["snake2"])
    y = causal_conv1d(y, p["conv2"]["w"], p["conv2"]["b"])
    return x + y


def wlt_layer_body(
    lp: Params,
    h: jnp.ndarray,  # (B, T, D)
    tcfg: VocoderTransformerConfig,
    freqs: jnp.ndarray | None,  # (T, Dh/2, 2) or per-stream (B, T, Dh/2, 2)
    bias: jnp.ndarray,
    kv_cache: tuple[jnp.ndarray, jnp.ndarray] | None = None,
):
    """One WindowLimitedTransformer layer (reference vocoder.py:159-241):
    RMSNorm → fused-QKV attention with the kv_size split quirk
    (vocoder.py:191-192) → LayerScale residual → SwiGLU FFN.

    THE single source of the layer math: both the full-sequence forward
    (:func:`_wlt_forward`) and the streaming continuation
    (``vocoder_stream.stream_wlt``) run this body, so the
    chunked-vs-joint bit parity contract cannot drift.

    ``kv_cache``: optional (kc, vc) ``(B, Hkv, W, Dh)`` carried window,
    prepended to this chunk's keys/values.  Returns ``(h, (k_all, v_all))``
    with keys/values in (B, Hkv, T[+W], Dh) layout for the caller's window
    bookkeeping.
    """
    H, Hkv, Dh = tcfg.n_head, tcfg.n_local_heads, tcfg.head_dim
    kv_size = Hkv * Dh
    B, T = h.shape[0], h.shape[1]
    a_in = vocoder_rms_norm(h, lp["attention_norm"], tcfg.norm_eps)
    qkv = a_in @ lp["wqkv"]
    q, k, v = jnp.split(qkv, [kv_size, 2 * kv_size], axis=-1)
    q = q.reshape(B, T, H, Dh)
    k = k.reshape(B, T, Hkv, Dh)
    v = v.reshape(B, T, Hkv, Dh)
    if tcfg.pos_embed_type == "rope":
        # conformer mode skips rotary entirely (reference vocoder.py:198-200;
        # its rel_pos_embeddings are never applied)
        q = apply_rotary_emb(q, freqs)
        k = apply_rotary_emb(k, freqs)
    q, k, v = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))
    if kv_cache is not None:
        k = jnp.concatenate([kv_cache[0], k], axis=2)  # (B, Hkv, W+T, Dh)
        v = jnp.concatenate([kv_cache[1], v], axis=2)
    att = attention(q, k, v, bias)
    att = jnp.swapaxes(att, 1, 2).reshape(B, T, H * Dh)
    h = h + (att @ lp["wo"]) * lp["attn_scale"]
    f_in = vocoder_rms_norm(h, lp["ffn_norm"], tcfg.norm_eps)
    f = (silu(f_in @ lp["w1"]) * (f_in @ lp["w3"])) @ lp["w2"]
    h = h + f * lp["ffn_scale"]
    return h, (k, v)


def _wlt_forward(
    p: Params, tcfg: VocoderTransformerConfig, window: int, x: jnp.ndarray
) -> jnp.ndarray:
    """WindowLimitedTransformer on channels-first input (vocoder.py:296-354).

    Full-sequence (non-cached) attention with a sliding-window causal mask.
    """
    x = jnp.swapaxes(x, 1, 2)  # (B, T, C)
    if "input_proj" in p:
        x = x @ p["input_proj"]["w"] + p["input_proj"]["b"]
    T = x.shape[1]
    pos = jnp.arange(T, dtype=jnp.int32)
    # conformer mode never applies rotary (see below) — skip the table
    freqs = (
        precompute_freqs_cis(T, tcfg.head_dim, tcfg.rope_base)
        if tcfg.pos_embed_type == "rope" else None
    )
    bias = window_causal_bias(pos, pos, window)

    def body(carry, lp):
        h, _ = wlt_layer_body(lp, carry, tcfg, freqs, bias)
        return h, None

    x, _ = jax.lax.scan(body, x, p["layers"])
    x = vocoder_rms_norm(x, p["norm"], tcfg.norm_eps)
    if "output_proj" in p:
        x = x @ p["output_proj"]["w"] + p["output_proj"]["b"]
    return jnp.swapaxes(x, 1, 2)  # (B, C, T)


def _convnext(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """ConvNeXt block, channels-first (vocoder.py:644-680)."""
    inp = x
    dim = x.shape[1]
    x = causal_conv1d(x, p["dwconv"]["w"], p["dwconv"]["b"], groups=dim)
    x = jnp.swapaxes(x, 1, 2)
    x = layer_norm(x, p["norm_w"], p["norm_b"], eps=1e-6)
    x = x @ p["pw1"]["w"] + p["pw1"]["b"]
    x = jax.nn.gelu(x, approximate=False)
    x = x @ p["pw2"]["w"] + p["pw2"]["b"]
    x = x * p["gamma"]
    x = jnp.swapaxes(x, 1, 2)
    return inp + x


# --- quantizer -------------------------------------------------------------


def _vq_embed_codes(vq: Params, codes: jnp.ndarray) -> jnp.ndarray:
    """codes (B, T) -> out_proj(codebook[codes]) (B, C, T)
    (dac VectorQuantize.decode_code + out_proj)."""
    emb = vq["codebook"][codes]  # (B, T, cb_dim)
    w = vq["out_proj"]["w"][:, :, 0]  # (C, cb_dim)
    out = jnp.einsum("btd,cd->bct", emb, w)
    return out + vq["out_proj"]["b"][None, :, None]


def _vq_nearest(vq: Params, z_e: jnp.ndarray) -> jnp.ndarray:
    """Nearest-codebook-entry indices under L2 on *normalized* vectors
    (dac VectorQuantize.decode_latents).  z_e: (B, cb_dim, T) -> (B, T)."""
    enc = jnp.swapaxes(z_e, 1, 2)  # (B, T, d)
    enc = enc / (jnp.linalg.norm(enc, axis=-1, keepdims=True) + 1e-12)
    cb = vq["codebook"].astype(enc.dtype)
    cb = cb / (jnp.linalg.norm(cb, axis=-1, keepdims=True) + 1e-12)
    # argmin ||e - c||^2 = argmax e.c for normalized vectors
    sim = jnp.einsum("btd,nd->btn", enc, cb)
    return jnp.argmax(sim, axis=-1).astype(jnp.int32)


def _vq_in_proj(vq: Params, z: jnp.ndarray) -> jnp.ndarray:
    w = vq["in_proj"]["w"][:, :, 0]  # (cb_dim, C)
    return jnp.einsum("bct,dc->bdt", z, w) + vq["in_proj"]["b"][None, :, None]


def quantizer_decode(
    qp: Params, cfg: VocoderConfig, indices: jnp.ndarray
) -> jnp.ndarray:
    """codes (B, 1+R, T) -> latent (B, C, T*downsample)
    (reference DownsampleResidualVectorQuantize.decode, vocoder.py:800-814)."""
    sem = jnp.clip(indices[:, 0], 0, cfg.semantic_codebook_size - 1)
    res = jnp.clip(indices[:, 1:], 0, cfg.residual_codebook_size - 1)

    z = _vq_embed_codes(qp["semantic"], sem)
    for i, vq in enumerate(qp["residual"]):
        z = z + _vq_embed_codes(vq, res[:, i])

    z = _wlt_forward(qp["post"], cfg.quantizer_transformer, cfg.quantizer_window, z)
    for stage, f in zip(qp["upsample"], tuple(reversed(cfg.downsample_factor))):
        z = causal_conv_transpose1d(z, stage["tconv"]["w"], stage["tconv"]["b"], stride=f)
        z = _convnext(stage["convnext"], z)
    return z


def quantizer_encode(
    qp: Params, cfg: VocoderConfig, z: jnp.ndarray
) -> jnp.ndarray:
    """latent (B, C, T) -> codes (B, 1+R, T/downsample)
    (reference quantizer forward path, vocoder.py:765-798)."""
    for stage, f in zip(qp["downsample"], cfg.downsample_factor):
        z = causal_conv1d(z, stage["conv"]["w"], stage["conv"]["b"], stride=f)
        z = _convnext(stage["convnext"], z)
    z = _wlt_forward(qp["pre"], cfg.quantizer_transformer, cfg.quantizer_window, z)

    sem_codes = _vq_nearest(qp["semantic"], _vq_in_proj(qp["semantic"], z))
    z_q_sem = _vq_embed_codes(qp["semantic"], sem_codes)

    residual = z - z_q_sem
    codes = [sem_codes]
    for vq in qp["residual"]:
        c = _vq_nearest(vq, _vq_in_proj(vq, residual))
        codes.append(c)
        residual = residual - _vq_embed_codes(vq, c)
    return jnp.stack(codes, axis=1)  # (B, 1+R, T')


# --- encoder / decoder -----------------------------------------------------


def encoder_forward(ep: Params, cfg: VocoderConfig, x: jnp.ndarray) -> jnp.ndarray:
    """audio (B, 1, T) -> latent (B, latent_dim, T/hop) (vocoder.py:542-575)."""
    d = cfg.encoder_dim
    x = causal_conv1d(x, ep["stem"]["w"], ep["stem"]["b"])
    for block, stride, n_t in zip(
        ep["blocks"], cfg.encoder_rates, cfg.encoder_transformer_layers
    ):
        d *= 2
        for dil, unit in zip((1, 3, 9), block["units"]):
            x = _residual_unit(unit, x, dil)
        x = snake(x, block["snake"])
        x = causal_conv1d(x, block["down"]["w"], block["down"]["b"], stride=stride)
        if n_t > 0:
            x = _wlt_forward(block["wlt"], _stage_tcfg(d, n_t),
                             cfg.encoder_window, x)
    x = snake(x, ep["final_snake"])
    x = causal_conv1d(x, ep["final_conv"]["w"], ep["final_conv"]["b"])
    return x


def decoder_forward(dp: Params, cfg: VocoderConfig, z: jnp.ndarray) -> jnp.ndarray:
    """latent (B, C, T) -> audio (B, 1, T*hop) (vocoder.py:605-640)."""
    x = causal_conv1d(z, dp["stem"]["w"], dp["stem"]["b"])
    for block, stride in zip(dp["blocks"], cfg.decoder_rates):
        x = snake(x, block["snake"])
        x = causal_conv_transpose1d(x, block["up"]["w"], block["up"]["b"], stride=stride)
        for dil, unit in zip((1, 3, 9), block["units"]):
            x = _residual_unit(unit, x, dil)
    x = snake(x, dp["final_snake"])
    x = causal_conv1d(x, dp["final_conv"]["w"], dp["final_conv"]["b"])
    return jnp.tanh(x)


# --- top-level codec (reference DAC, vocoder.py:824-928) -------------------


def dac_decode(
    params: Params, cfg: VocoderConfig, indices: jnp.ndarray
) -> jnp.ndarray:
    """codes (B, 1+R, N) -> audio (B, 1, N*frame_length) (vocoder.py:906-912)."""
    z = quantizer_decode(params["quantizer"], cfg, indices)
    return decoder_forward(params["decoder"], cfg, z)


def dac_encode(
    params: Params, cfg: VocoderConfig, audio: jnp.ndarray
) -> jnp.ndarray:
    """audio (B, 1, T) -> codes (B, 1+R, ceil(T/frame_length))
    (vocoder.py:885-904: right-pad to a frame multiple, encode, quantize)."""
    T = audio.shape[-1]
    fl = cfg.frame_length
    pad = (T + fl - 1) // fl * fl - T
    audio = jnp.pad(audio, ((0, 0), (0, 0), (0, pad)))
    z = encoder_forward(params["encoder"], cfg, audio)
    return quantizer_encode(params["quantizer"], cfg, z)
