#!/usr/bin/env python3
"""A/B the fused fast-decoder kernel's dequant modes on the current device.

Round-4 post-mortem (PERFORMANCE.md): the scratch-staging accounting pushed
S1-mini over the supports() gate and the kernel silently fell back to the
XLA fast loop — 532 -> 339 tok/s.  This script times fast_decode_frame
DIRECTLY (bypassing the gate) for each dequant mode at the given batch
sizes, so compile failures and per-mode latency are both visible.

All timings run FRAMES frames inside a jitted scan whose body slices the
kernel outputs (breaking the kCustom call+stacking fusion hazard noted in
ops/fast_decoder.py) and synchronize with a host fetch.

Usage: python scripts/ab_fast_decoder.py [-b 1 8 16] [-n N] [--modes ...]
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

try:
    import fish_tts_tpu  # noqa: F401
except ModuleNotFoundError:
    _sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import time
import traceback

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-b", type=int, nargs="+", default=[1, 8, 16])
    ap.add_argument("-n", type=int, default=10, help="timing repetitions")
    ap.add_argument("--modes", nargs="+", default=None)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fish_tts_tpu.config import S1_MINI_CONFIG, TINY_CONFIG
    from fish_tts_tpu.models import dual_ar
    from fish_tts_tpu.ops import fast_decoder, slow_stack
    from fish_tts_tpu.utils.compile_cache import setup_compile_cache
    from fish_tts_tpu.utils.quantize import quantize_lm_params

    setup_compile_cache()
    cfg = TINY_CONFIG if args.tiny else S1_MINI_CONFIG
    modes = args.modes or list(fast_decoder.DEQUANT_MODES)
    FRAMES = 20
    W = 16
    K, Vr = cfg.num_codebooks, cfg.residual_codebook_size

    def build(key):
        p = dual_ar.init_params(
            key, cfg, dtype=jnp.float32 if args.tiny else jnp.bfloat16)
        return slow_stack.prepare_head(quantize_lm_params(p), cfg)

    params = jax.jit(build)(jax.random.PRNGKey(0))
    rope = dual_ar.make_rope_tables(cfg)
    np.asarray(params["fast_norm"][:1])
    print(f"# device={jax.devices()[0]} cfg={'tiny' if args.tiny else 's1'}")
    interpret = jax.default_backend() != "tpu"

    t_, p_, r_ = jnp.float32(0.7), jnp.float32(0.8), jnp.float32(1.1)

    for B in args.b:
        est = fast_decoder._vmem_estimate(cfg, params, B)
        print(f"# B={B} vmem est (default mode) = {est/2**20:.1f} MB, "
              f"supports={fast_decoder.supports(cfg, params, B)}")
        for mode in modes:

            def make_scan(mode=mode, B=B):
                @jax.jit
                def scan_fn(params, key):
                    def body(carry, k):
                        a0 = carry
                        h = jnp.zeros((B, cfg.fast_dim), jnp.float32)
                        prev = jnp.zeros((B, K - 1, W), jnp.int32)
                        gumbel = jax.random.gumbel(
                            k, (B, K - 1, Vr), jnp.float32)
                        codes, _ = fast_decoder.fast_decode_frame(
                            params, cfg, rope["fast"], h, a0, prev, gumbel,
                            t_, p_, r_, window=W,
                            interpret=interpret, dequant=mode)
                        # feed sampled codes forward (real dependency chain)
                        # and slice (breaks the kCustom stacking fusion)
                        return codes[:, 0], codes[:, :8]
                    a0 = jnp.zeros((B,), jnp.int32)
                    return jax.lax.scan(
                        body, a0, jax.random.split(key, FRAMES))[1]
                return scan_fn

            fn = make_scan()
            label = f"B={B} dequant={mode}"
            try:
                t0 = time.perf_counter()
                np.asarray(fn(params, jax.random.PRNGKey(0)))
                compile_s = time.perf_counter() - t0
                t0 = time.perf_counter()
                for i in range(1, args.n + 1):
                    out = fn(params, jax.random.PRNGKey(i))
                np.asarray(out)
                dt = (time.perf_counter() - t0) / (args.n * FRAMES)
                print(f"{label:24s}: {dt*1e3:7.3f} ms/frame -> "
                      f"{B/dt:8.1f} tok/s agg  (compile {compile_s:.1f}s)")
            except Exception as e:  # noqa: BLE001 — report and continue
                msg = str(e).split("\n")[0][:160]
                print(f"{label:24s}: FAILED {type(e).__name__}: {msg}")
                if "--trace" in _sys.argv:
                    traceback.print_exc()


if __name__ == "__main__":
    main()
