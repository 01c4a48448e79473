#!/usr/bin/env python3
"""A/B each Pallas kernel's in-chunk contribution at a given batch size.

The isolation harness (scripts/profile_batch.py) times each kernel in its
own scan, where per-step effects (dependency-forcing hacks, fetch sync)
inflate the numbers — at B=16 it reads the fused sampler at 2.3 ms/frame
vs 1.6 for the XLA sampler, which would be a 14% chunk win if true
IN CONTEXT.  This script measures the real thing: the production
``decode_chunk`` with one kernel gate monkeypatched off at a time.

Usage: python scripts/ab_kernel_gates.py [-b 16] [--kv 256] [--pos 130]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-b", type=int, default=16)
    ap.add_argument("--kv", type=int, default=256)
    ap.add_argument("--pos", type=int, default=130)
    ap.add_argument("--chunks", type=int, default=5)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from fish_tts_tpu.config import S1_MINI_CONFIG
    from fish_tts_tpu.engine import decode as decode_mod
    from fish_tts_tpu.models import dual_ar
    from fish_tts_tpu.models.dual_ar import TokenIds
    from fish_tts_tpu.ops import fast_decoder, sampler_kernel, slow_stack
    from fish_tts_tpu.utils.quantize import quantize_lm_params

    cfg = S1_MINI_CONFIG
    B = args.b
    CHUNK = 20
    ids = TokenIds(cfg.vocab_size - 1 - cfg.codebook_size,
                   cfg.vocab_size - 1, 5)
    params = jax.jit(
        lambda k: dual_ar.init_params(k, cfg, dtype=jnp.bfloat16)
    )(jax.random.PRNGKey(0))
    params = quantize_lm_params(params)
    params = slow_stack.prepare_head(params, cfg)
    rope = dual_ar.make_rope_tables(cfg)
    t, p, r = jnp.float32(0.7), jnp.float32(0.8), jnp.float32(1.2)
    print(f"# device={jax.devices()[0].device_kind} B={B} kv={args.kv} "
          f"pos={args.pos}")
    assert args.pos + args.chunks * CHUNK <= args.kv, "decode contract"

    def fresh():
        st = decode_mod.init_state(params, cfg, batch=B)
        st["pos"] = jnp.full((B,), args.pos, jnp.int32)
        st["step"] = jnp.full((B,), args.pos - 10, jnp.int32)
        return st

    gates = {
        "all kernels (production)": {},
        "sampler kernel OFF": {sampler_kernel: False},
        "fast-decoder kernel OFF": {fast_decoder: False},
        "slow-stack kernel OFF": {slow_stack: False},
    }
    originals = {
        sampler_kernel: sampler_kernel.supports,
        fast_decoder: fast_decoder.supports,
        slow_stack: slow_stack.supports,
    }
    for label, off in gates.items():
        for mod, orig in originals.items():
            if mod in off:
                mod.supports = (lambda *a, **k: False)
            else:
                mod.supports = orig
        decode_mod.decode_chunk._clear_cache()
        st, fr, _ = decode_mod.decode_chunk(
            params, rope, fresh(), jax.random.PRNGKey(1), t, p, r,
            cfg=cfg, ids=ids, num_frames=CHUNK, top_k=-1,
            kv_bucket=args.kv, fast_kernel=True)
        np.asarray(fr[:, -1])  # compile + sync
        times = []
        for rep in range(3):
            st = fresh()
            t0 = time.perf_counter()
            for i in range(args.chunks):
                st, fr, _ = decode_mod.decode_chunk(
                    params, rope, st, jax.random.PRNGKey(2 + i), t, p, r,
                    cfg=cfg, ids=ids, num_frames=CHUNK, top_k=-1,
                    kv_bucket=args.kv, fast_kernel=True)
            np.asarray(fr[:, -1])
            times.append(time.perf_counter() - t0)
        ms = min(times) / (args.chunks * CHUNK) * 1e3
        print(f"{label:28s}: {ms:.3f} ms/frame -> {B / ms * 1e3:.0f} "
              f"aggregate tok/s  (times {[round(x, 3) for x in times]})")
    for mod, orig in originals.items():
        mod.supports = orig


if __name__ == "__main__":
    main()
