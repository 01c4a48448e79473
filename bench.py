#!/usr/bin/env python3
"""Benchmark: decode throughput, RTF, and time-to-first-audio on real hardware.

Prints ONE JSON line:
  {"metric": "semantic_tokens_per_sec", "value": N, "unit": "tok/s",
   "vs_baseline": N/120, ...extras}

Run on the S1-mini-shaped model (random weights — throughput is
weight-agnostic) in bf16 on whatever accelerator JAX sees.  The reference
baseline is ~120 tok/s and RTF ~0.26 on torch.compile CUDA
(/root/reference/README.md:9,71).

Usage:  python bench.py [--tiny] [--frames N] [--no-ttfa]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import numpy as np


AUDIO_TOKENS_PER_SEC = 44100 / 2048  # ≈21.53, reference vocoder.py:854,871-872


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="tiny config (CI/CPU)")
    ap.add_argument("--frames", type=int, default=200, help="frames to time")
    ap.add_argument("--no-ttfa", action="store_true", help="skip vocoder/TTFA")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--int8", action="store_true", help="weight-only int8 LM")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from fish_tts_tpu.config import S1_MINI_CONFIG, TINY_CONFIG, VocoderConfig, TINY_VOCODER_CONFIG
    from fish_tts_tpu.engine import decode as decode_mod
    from fish_tts_tpu.models import dual_ar
    from fish_tts_tpu.models.dual_ar import TokenIds
    from fish_tts_tpu.utils.compile_cache import setup_compile_cache

    setup_compile_cache()

    def force(x):
        """Synchronize by fetching to host — on the axon tunnel platform
        block_until_ready returns before execution finishes; only a real
        device->host read is a true barrier."""
        return jax.tree_util.tree_map(np.asarray, x)

    if args.tiny:
        cfg = TINY_CONFIG
        ids = TokenIds(semantic_begin=400, semantic_end=447, im_end=5)
        dtype = jnp.float32
        vcfg = TINY_VOCODER_CONFIG
    else:
        cfg = S1_MINI_CONFIG
        # Real tokenizer id layout: specials start after ~151657 ranks.
        ids = TokenIds(semantic_begin=151672, semantic_end=155767, im_end=151661)
        dtype = jnp.bfloat16
        vcfg = VocoderConfig()

    dev = jax.devices()[0]
    print(f"# device: {dev}, config: dim={cfg.dim} layers={cfg.n_layer} "
          f"fast={cfg.n_fast_layer} vocab={cfg.vocab_size}", file=sys.stderr)

    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    params = dual_ar.init_params(key, cfg, dtype=dtype)
    if args.int8:
        from fish_tts_tpu.utils.quantize import quantize_lm_params

        params = quantize_lm_params(params)
    rope = dual_ar.make_rope_tables(cfg)
    force(jax.tree_util.tree_leaves(params)[0][0, :1])
    print(f"# init: {time.perf_counter() - t0:.1f}s "
          f"({dual_ar.param_count(params)/1e6:.0f}M params)", file=sys.stderr)

    t, p, r = jnp.float32(0.7), jnp.float32(0.8), jnp.float32(1.1)
    T = 64  # prompt bucket
    prompt = np.zeros((1, 1 + cfg.num_codebooks, T), np.int32)
    prompt[0, 0] = np.random.RandomState(0).randint(0, 1000, T)
    lengths = jnp.asarray([48], jnp.int32)
    top_k = 1024 if not args.tiny else 32

    def fresh_state():
        return decode_mod.init_state(params, cfg, batch=1)

    # -- compile/warmup ----------------------------------------------------
    CHUNK = 20
    t0 = time.perf_counter()
    state = fresh_state()
    state, first = decode_mod.prefill(
        params, rope, state, jnp.asarray(prompt), lengths,
        jax.random.PRNGKey(1), t, p, r, cfg=cfg, ids=ids, top_k=top_k, approx=not args.tiny,
    )
    state, frames, _ = decode_mod.decode_chunk(
        params, rope, state, jax.random.PRNGKey(2), t, p, r,
        cfg=cfg, ids=ids, num_frames=CHUNK, top_k=top_k, approx=not args.tiny,
    )
    force(frames)
    compile_s = time.perf_counter() - t0
    print(f"# prefill+chunk compile+run: {compile_s:.1f}s", file=sys.stderr)

    # -- throughput --------------------------------------------------------
    n_chunks = max(1, args.frames // CHUNK)
    # steady-state: time chunks only (prompt already prefilled)
    t0 = time.perf_counter()
    for i in range(n_chunks):
        state, frames, _ = decode_mod.decode_chunk(
            params, rope, state, jax.random.PRNGKey(3 + i), t, p, r,
            cfg=cfg, ids=ids, num_frames=CHUNK, top_k=top_k, approx=not args.tiny,
        )
    force(frames)
    dt = time.perf_counter() - t0
    n_frames = n_chunks * CHUNK
    tok_per_sec = n_frames / dt
    rtf = (dt / n_frames) * AUDIO_TOKENS_PER_SEC
    print(f"# decode: {tok_per_sec:.1f} tok/s, RTF={rtf:.4f}", file=sys.stderr)

    # -- prefill latency ---------------------------------------------------
    t0 = time.perf_counter()
    state2 = fresh_state()
    state2, _ = decode_mod.prefill(
        params, rope, state2, jnp.asarray(prompt), lengths,
        jax.random.PRNGKey(9), t, p, r, cfg=cfg, ids=ids, top_k=top_k, approx=not args.tiny,
    )
    force(state2["frame"])
    prefill_ms = (time.perf_counter() - t0) * 1e3

    extras = {
        "rtf": round(rtf, 4),
        "prefill_ms": round(prefill_ms, 1),
        "frames_timed": n_frames,
        "compile_s": round(compile_s, 1),
        "device": str(dev),
    }

    # -- TTFA (prefill + 10 frames + vocoder decode of 10 frames) ----------
    try:
        ttfa_extras = _measure_ttfa(args, cfg, vcfg, ids, params, rope, prompt,
                                    lengths, t, p, r, top_k, fresh_state, dtype)
        extras.update(ttfa_extras)
    except Exception as e:  # noqa: BLE001 — TTFA is best-effort extra info
        print(f"# ttfa failed: {e}", file=sys.stderr)

    result = {
        "metric": "semantic_tokens_per_sec",
        "value": round(tok_per_sec, 1),
        "unit": "tok/s",
        "vs_baseline": round(tok_per_sec / 120.0, 2),
        **extras,
    }
    print(json.dumps(result))


def _measure_ttfa(args, cfg, vcfg, ids, params, rope, prompt, lengths,
                  t, p, r, top_k, fresh_state, dtype):
    import jax
    import jax.numpy as jnp

    from fish_tts_tpu.engine import decode as decode_mod

    if args.no_ttfa:
        return {}
    from fish_tts_tpu.models import vocoder as voc

    vparams = voc.init_vocoder_params(jax.random.PRNGKey(7), vcfg, dtype=dtype)
    # params as explicit arg (closures embed them as HLO constants)
    dec_jit = jax.jit(lambda p, c: voc.dac_decode(p, vcfg, c))
    dec10 = lambda c: dec_jit(vparams, c)
    codes10 = jnp.asarray(
        np.random.RandomState(1).randint(0, 24, (1, vcfg.num_codebooks, 10)), jnp.int32
    )
    t0 = time.perf_counter()
    np.asarray(dec10(codes10))  # compile (asarray = true barrier)
    print(f"# vocoder compile+run: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    # 9-frame first decode chunk variant (compile)
    state3 = fresh_state()
    state3, _ = decode_mod.prefill(
        params, rope, state3, jnp.asarray(prompt), lengths,
        jax.random.PRNGKey(11), t, p, r, cfg=cfg, ids=ids, top_k=top_k, approx=not args.tiny,
    )
    state3, fr9, _ = decode_mod.decode_chunk(
        params, rope, state3, jax.random.PRNGKey(12), t, p, r,
        cfg=cfg, ids=ids, num_frames=9, top_k=top_k, approx=not args.tiny,
    )
    np.asarray(fr9)

    t0 = time.perf_counter()
    state4 = fresh_state()
    state4, first = decode_mod.prefill(
        params, rope, state4, jnp.asarray(prompt), lengths,
        jax.random.PRNGKey(13), t, p, r, cfg=cfg, ids=ids, top_k=top_k, approx=not args.tiny,
    )
    state4, fr9, _ = decode_mod.decode_chunk(
        params, rope, state4, jax.random.PRNGKey(14), t, p, r,
        cfg=cfg, ids=ids, num_frames=9, top_k=top_k, approx=not args.tiny,
    )
    audio = dec10(codes10)
    np.asarray(audio)
    ttfa_ms = (time.perf_counter() - t0) * 1e3
    return {"ttfa_ms": round(ttfa_ms, 1)}


if __name__ == "__main__":
    main()
