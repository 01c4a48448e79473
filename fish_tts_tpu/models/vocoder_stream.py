"""Stateful streaming vocoder decode: exact chunked continuation.

The codec decode path (reference vocoder.py:800-814 quantizer decode +
605-640 decoder) is fully causal with a finite receptive field: sliding-
window attention (WLT), stride-1 causal convs, and causal transposed convs.
Round 3 streamed it by re-decoding ``context_frames`` of history per chunk
(~2.6x redundant compute and an accuracy heuristic).  This module carries
the *exact* state across chunks instead:

- stride-1 causal convs carry their last ``(k-1)*dilation`` input samples
  (the left-pad region of the next chunk) — output is bit-equal to the
  joint decode;
- causal transposed convs carry the ``k - stride`` output samples that
  spill past the chunk boundary and overlap-add them into the next chunk
  (bias applied once, to emitted samples only);
- WindowLimitedTransformers carry a per-layer rolling KV window of the last
  ``window`` positions (keys stored post-RoPE at absolute positions, so
  chunk boundaries are invisible to the attention math);
- Snake / norms / projections are pointwise and carry nothing.

``decode_chunk`` therefore produces, for any chunking of the code sequence,
the same waveform as one ``dac_decode`` over the whole sequence (to fp
tolerance) — with per-chunk compute proportional to the chunk alone.

No reference analog: the reference decodes chunks independently and clicks
at boundaries (synthesizer.py:513-527).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from fish_tts_tpu.config import VocoderConfig, VocoderTransformerConfig
from fish_tts_tpu.ops.attention import _NEG_INF
from fish_tts_tpu.ops.conv import conv1d, conv_transpose1d
from fish_tts_tpu.ops.norms import layer_norm, snake, vocoder_rms_norm
from fish_tts_tpu.ops.rope import precompute_freqs_cis
from fish_tts_tpu.models.vocoder import _vq_embed_codes, wlt_layer_body

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# Streaming op primitives
# ---------------------------------------------------------------------------


def _tail_len(w: jnp.ndarray, dilation: int = 1) -> int:
    return (w.shape[-1] - 1) * dilation


def stream_conv(tail, x, w, b=None, dilation: int = 1, groups: int = 1):
    """Stride-1 causal conv continuation.  ``tail`` holds the last
    ``(k-1)*dilation`` inputs (zeros at stream start = the left pad of
    ops.conv.causal_conv1d).  Returns (new_tail, y) with ``y`` the next
    ``T`` outputs of the joint convolution."""
    n = _tail_len(w, dilation)
    if n == 0:
        return tail, conv1d(x, w, b, dilation=dilation, groups=groups)
    xin = jnp.concatenate([tail, x.astype(tail.dtype)], axis=-1)
    y = conv1d(xin, w, b, dilation=dilation, groups=groups)
    return xin[..., -n:], y


def stream_tconv(spill, x, w, b=None, stride: int = 1):
    """Causal transposed-conv continuation.  ``spill`` holds the
    ``k - stride`` un-emitted output samples that extend past the previous
    chunk's ``T*stride`` boundary; they overlap-add into this chunk's head.
    The bias lands once, on emitted samples (spill is carried bias-free)."""
    k = w.shape[-1]
    ks = k - stride
    y = conv_transpose1d(x, w, None, stride=stride)  # ((T-1)*s + k,)
    t_out = x.shape[-1] * stride
    emit = y[..., :t_out]
    if ks > 0:
        emit = emit.at[..., :ks].add(spill)
        new_spill = y[..., t_out:]
    else:
        new_spill = spill
    if b is not None:
        emit = emit + b[None, :, None]
    return new_spill, emit


def stream_convnext(tail, x, p: Params):
    """ConvNeXt block continuation (depthwise conv carries the tail; the
    rest is pointwise — mirrors vocoder._convnext)."""
    inp = x
    dim = x.shape[1]
    tail, x = stream_conv(
        tail, x, p["dwconv"]["w"], p["dwconv"]["b"], groups=dim
    )
    x = jnp.swapaxes(x, 1, 2)
    x = layer_norm(x, p["norm_w"], p["norm_b"], eps=1e-6)
    x = x @ p["pw1"]["w"] + p["pw1"]["b"]
    x = jax.nn.gelu(x, approximate=False)
    x = x @ p["pw2"]["w"] + p["pw2"]["b"]
    x = x * p["gamma"]
    x = jnp.swapaxes(x, 1, 2)
    return tail, inp + x


def init_wlt_state(
    p: Params, tcfg: VocoderTransformerConfig, window: int, batch: int, dtype
) -> Params:
    """Rolling KV window: last ``window`` positions per layer (post-RoPE
    keys), with -1-position slots marked invalid.  ``pos``/``off`` are
    per-stream so a slot pool can hold streams at different ages
    (ServeSession's slot-aligned vocoder)."""
    L = p["layers"]["wqkv"].shape[0]
    Hkv, Dh = tcfg.n_local_heads, tcfg.head_dim
    shape = (L, batch, Hkv, window, Dh)
    return {
        "k": jnp.zeros(shape, dtype),
        "v": jnp.zeros(shape, dtype),
        "pos": jnp.full((batch, window), -1, jnp.int32),
        "off": jnp.zeros((batch,), jnp.int32),
    }


def stream_wlt(
    st: Params, p: Params, tcfg: VocoderTransformerConfig, window: int,
    x: jnp.ndarray,  # (B, C, T) channels-first
):
    """WindowLimitedTransformer continuation: identical math to
    vocoder._wlt_forward at absolute positions ``off .. off+T`` with the
    previous ``window`` positions attended from the carried KV."""
    x = jnp.swapaxes(x, 1, 2)  # (B, T, C)
    if "input_proj" in p:
        x = x @ p["input_proj"]["w"] + p["input_proj"]["b"]
    B, T, _ = x.shape
    W = st["pos"].shape[-1]
    # per-stream absolute positions: (B, T) queries over (B, W+T) keys
    qpos = st["off"][:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
    # Rotary angles: table rows for positions inside the precomputed range
    # (bit-identical to the buffered _wlt_forward path), computed on the fly
    # beyond it — a continuous serving stream (long-form chains carry ONE
    # vocoder stream across segments) outgrows block_size (4096 frames
    # ~ 190 s) and a clamped gather would silently freeze the rotation at
    # the last row, corrupting attention for the rest of the stream.  The
    # window mask only ever compares positions <=`window` apart, so fp32
    # angle rounding at large absolute positions stays negligible.
    table = precompute_freqs_cis(tcfg.block_size, tcfg.head_dim, tcfg.rope_base)
    in_range = qpos < tcfg.block_size
    freqs = table[jnp.minimum(qpos, tcfg.block_size - 1)]  # (B, T, Dh/2, 2)
    dh = tcfg.head_dim
    inv = 1.0 / (tcfg.rope_base ** (
        np.arange(0, dh, 2)[: dh // 2].astype(np.float32) / dh))
    ang = qpos.astype(jnp.float32)[..., None] * inv  # (B, T, Dh/2)
    computed = jnp.stack(
        [jnp.cos(ang), jnp.sin(ang)], axis=-1).astype(table.dtype)
    freqs = jnp.where(in_range[..., None, None], freqs, computed)
    kpos = jnp.concatenate([st["pos"], qpos], axis=1)  # (B, W + T)
    diff = qpos[:, :, None] - kpos[:, None, :]
    allowed = (diff >= 0) & (diff < window) & (kpos[:, None, :] >= 0)
    bias = jnp.where(allowed, 0.0, _NEG_INF)[:, None].astype(jnp.float32)

    def body(carry, inputs):
        lp, kc, vc = inputs  # kc/vc: (B, Hkv, W, Dh) this layer's window
        # the layer math lives in vocoder.wlt_layer_body — ONE source, so
        # streaming cannot drift from the joint forward it must bit-match
        h, (k_all, v_all) = wlt_layer_body(
            lp, carry, tcfg, freqs, bias, kv_cache=(kc, vc)
        )
        return h, (k_all[:, :, -W:], v_all[:, :, -W:])

    x, (new_k, new_v) = jax.lax.scan(body, x, (p["layers"], st["k"], st["v"]))
    x = vocoder_rms_norm(x, p["norm"], tcfg.norm_eps)
    if "output_proj" in p:
        x = x @ p["output_proj"]["w"] + p["output_proj"]["b"]
    new_st = {
        "k": new_k,
        "v": new_v,
        "pos": kpos[:, -W:],
        "off": st["off"] + T,
    }
    return new_st, jnp.swapaxes(x, 1, 2)


# ---------------------------------------------------------------------------
# Full decode-path state
# ---------------------------------------------------------------------------


def init_decode_state(
    params: Params, cfg: VocoderConfig, batch: int = 1
) -> Params:
    """Fresh streaming-decode state for ``dac`` params (decode path only:
    quantizer post/upsample + decoder)."""
    qp, dp = params["quantizer"], params["decoder"]
    dtype = dp["stem"]["w"].dtype
    qd = cfg.quantizer_input_dim

    def conv_tail(c_in, w, dilation=1):
        return jnp.zeros((batch, c_in, _tail_len(w, dilation)), dtype)

    up_states = []
    for stage, f in zip(qp["upsample"], tuple(reversed(cfg.downsample_factor))):
        up_states.append({
            "tconv": jnp.zeros(
                (batch, qd, stage["tconv"]["w"].shape[-1] - f), dtype
            ),
            "convnext": conv_tail(qd, stage["convnext"]["dwconv"]["w"]),
        })

    blocks = []
    ch = cfg.decoder_dim
    for i, (bp, stride) in enumerate(zip(dp["blocks"], cfg.decoder_rates)):
        out_dim = ch // (2 ** (i + 1))
        blocks.append({
            "up": jnp.zeros(
                (batch, out_dim, bp["up"]["w"].shape[-1] - stride), dtype
            ),
            "units": [
                {
                    "conv1": conv_tail(out_dim, up["conv1"]["w"], dil),
                    "conv2": conv_tail(out_dim, up["conv2"]["w"]),
                }
                for up, dil in zip(bp["units"], (1, 3, 9))
            ],
        })

    return {
        "post": init_wlt_state(
            qp["post"], cfg.quantizer_transformer, cfg.quantizer_window,
            batch, dtype,
        ),
        "upsample": up_states,
        "stem": conv_tail(cfg.latent_dim, dp["stem"]["w"]),
        "blocks": blocks,
        "final": conv_tail(
            cfg.decoder_dim // (2 ** len(cfg.decoder_rates)),
            dp["final_conv"]["w"],
        ),
    }


def decode_chunk(
    params: Params, cfg: VocoderConfig, state: Params,
    indices: jnp.ndarray,  # (B, 1+R, T) codes for THIS chunk only
):
    """Decode ``T`` new frames given the carried state.  Returns
    (new_state, audio (B, 1, T*frame_length)) — the exact continuation of
    the joint ``dac_decode`` waveform."""
    qp, dp = params["quantizer"], params["decoder"]

    # codes -> summed codebook latent (pointwise; vocoder.py:800-807)
    sem = jnp.clip(indices[:, 0], 0, cfg.semantic_codebook_size - 1)
    res = jnp.clip(indices[:, 1:], 0, cfg.residual_codebook_size - 1)
    z = _vq_embed_codes(qp["semantic"], sem)
    for i, vq in enumerate(qp["residual"]):
        z = z + _vq_embed_codes(vq, res[:, i])

    st_post, z = stream_wlt(
        state["post"], qp["post"], cfg.quantizer_transformer,
        cfg.quantizer_window, z,
    )
    new_up = []
    for stage, stg_st, f in zip(
        qp["upsample"], state["upsample"],
        tuple(reversed(cfg.downsample_factor)),
    ):
        sp, z = stream_tconv(
            stg_st["tconv"], z, stage["tconv"]["w"], stage["tconv"]["b"],
            stride=f,
        )
        ct, z = stream_convnext(stg_st["convnext"], z, stage["convnext"])
        new_up.append({"tconv": sp, "convnext": ct})

    stem_t, x = stream_conv(state["stem"], z, dp["stem"]["w"], dp["stem"]["b"])
    new_blocks = []
    for bp, bst, stride in zip(dp["blocks"], state["blocks"], cfg.decoder_rates):
        x = snake(x, bp["snake"])
        sp, x = stream_tconv(
            bst["up"], x, bp["up"]["w"], bp["up"]["b"], stride=stride
        )
        new_units = []
        for up, ust, dil in zip(bp["units"], bst["units"], (1, 3, 9)):
            y = snake(x, up["snake1"])
            t1, y = stream_conv(
                ust["conv1"], y, up["conv1"]["w"], up["conv1"]["b"],
                dilation=dil,
            )
            y = snake(y, up["snake2"])
            t2, y = stream_conv(ust["conv2"], y, up["conv2"]["w"], up["conv2"]["b"])
            x = x + y
            new_units.append({"conv1": t1, "conv2": t2})
        new_blocks.append({"up": sp, "units": new_units})
    x = snake(x, dp["final_snake"])
    fin_t, x = stream_conv(state["final"], x, dp["final_conv"]["w"],
                           dp["final_conv"]["b"])
    audio = jnp.tanh(x)

    new_state = {
        "post": st_post,
        "upsample": new_up,
        "stem": stem_t,
        "blocks": new_blocks,
        "final": fin_t,
    }
    return new_state, audio


# ---------------------------------------------------------------------------
# Slot-pool decode (continuous-batching serving)
# ---------------------------------------------------------------------------
#
# ServeSession keeps ONE batched stream state aligned with its LM slot pool
# and decodes every flushing slot's chunk in ONE program per scheduler round
# (B=1-per-request dispatch + fetch cost ~42 ms/chunk on the tunneled
# platform vs ~8 ms of actual compute; batched B=16 runs the same 16 chunks
# in ~135 ms total).  Slots join and leave mid-flight:
#
# - ``reset``  (B,) bool: slot restarts its stream this chunk (a freshly
#   admitted request's first flush) — state zeroed, positions restarted.
# - ``active`` (B,) bool: slot advances; inactive slots' state passes
#   through unchanged and their audio lanes are garbage to be ignored.
#
# Ragged final chunks ride the same fixed-width program: the decode path is
# causal, so a chunk zero-padded from m to T frames emits the SAME first
# m*frame_length samples as an exact-m decode — the host simply truncates,
# and the slot's (now poisoned) state is reset by the next admission.


def _where_b(mask: jnp.ndarray, a, b, bdim: int):
    """Per-slot select with the batch on axis ``bdim``."""
    shape = [1] * a.ndim
    shape[bdim] = mask.shape[0]
    return jnp.where(mask.reshape(shape), a, b)


def _pool_merge(state, other, take_other: jnp.ndarray):
    """Per-slot state select (conv tails batch axis 0, WLT k/v axis 1)."""
    post_s, post_o = state["post"], other["post"]
    post = {
        "k": _where_b(take_other, post_o["k"], post_s["k"], 1),
        "v": _where_b(take_other, post_o["v"], post_s["v"], 1),
        "pos": _where_b(take_other, post_o["pos"], post_s["pos"], 0),
        "off": jnp.where(take_other, post_o["off"], post_s["off"]),
    }
    rest_s = {k: v for k, v in state.items() if k != "post"}
    rest_o = {k: v for k, v in other.items() if k != "post"}
    rest = jax.tree.map(
        lambda s, o: _where_b(take_other, o, s, 0), rest_s, rest_o
    )
    return {"post": post, **rest}


def pool_reset(state: Params, reset: jnp.ndarray) -> Params:
    """Restart the streams of the masked slots (fresh init values)."""
    post = state["post"]
    fresh = {
        "post": {
            "k": jnp.zeros_like(post["k"]),
            "v": jnp.zeros_like(post["v"]),
            "pos": jnp.full_like(post["pos"], -1),
            "off": jnp.zeros_like(post["off"]),
        },
        **jax.tree.map(
            jnp.zeros_like,
            {k: v for k, v in state.items() if k != "post"},
        ),
    }
    return _pool_merge(state, fresh, reset)


def decode_chunk_pool(
    params: Params, cfg: VocoderConfig, state: Params,
    indices: jnp.ndarray,  # (B, 1+R, T) — garbage rows OK where ~active
    active: jnp.ndarray,   # (B,) bool: advance this slot's stream
    reset: jnp.ndarray,    # (B,) bool: restart the stream first
):
    """One slot-pool streaming decode round.  Active slots' audio is the
    exact continuation of their stream; inactive slots keep their state and
    emit garbage lanes (host ignores them)."""
    base = pool_reset(state, reset)
    new_state, audio = decode_chunk(params, cfg, base, indices)
    return _pool_merge(base, new_state, active), audio
