#!/usr/bin/env python3
"""A/B the kv-bucket size on the batched decode chunk (serving shape).

Serving-shaped requests (short prompt + ~200 generated tokens) live at
~250 context rows; with ``kv_bucket_step=512`` every decode round streamed
512 cache rows per layer per stream.  This script times ``decode_chunk``
at B=16, pos~210 (mid-serving) for several static kv buckets.

Measured (v5e-1, S1-mini shapes, int8 + kernels, pos=130 so both buckets
satisfy the decode contract ``max(pos) + frames <= kv_bucket``; the
script refuses out-of-contract configs — a truncated read window is
faster AND wrong):

    kv_bucket=512:  6.558 ms/frame -> 2440 aggregate tok/s
    kv_bucket=256:  5.604 ms/frame -> 2855 aggregate tok/s  (+14.6%)

(A non-multiple of the kernel cache block, e.g. 320, correctly falls off
the kernel path to XLA: measured 23.2 ms/frame.)  This is why
``EngineConfig.kv_bucket_step`` defaults to 256 (a multiple of the
kernel's cache-block size at every supported batch).

Usage: python scripts/ab_kvbucket.py [-b 16] [--buckets 512 256]
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
    ap.add_argument("-b", type=int, default=16, help="batch size")
    ap.add_argument("--buckets", type=int, nargs="+", default=[512, 256])
    ap.add_argument("--pos", type=int, default=210,
                    help="per-stream live context rows at the timed chunks")
    ap.add_argument("--chunks", type=int, default=5)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from fish_tts_tpu.config import S1_MINI_CONFIG
    from fish_tts_tpu.engine import decode as decode_mod
    from fish_tts_tpu.models import dual_ar
    from fish_tts_tpu.models.dual_ar import TokenIds
    from fish_tts_tpu.ops import slow_stack
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
    print(f"# device={jax.devices()[0].device_kind} B={B} pos={args.pos}")

    def fresh():
        st = decode_mod.init_state(params, cfg, batch=B)
        st["pos"] = jnp.full((B,), args.pos, jnp.int32)
        st["step"] = jnp.full((B,), args.pos - 10, jnp.int32)
        return st

    for kv_b in args.buckets:
        if args.pos + args.chunks * CHUNK > kv_b:
            print(f"kv_bucket={kv_b}: skipped (pos+frames exceeds bucket)")
            continue
        st, fr, _ = decode_mod.decode_chunk(
            params, rope, fresh(), jax.random.PRNGKey(1), t, p, r,
            cfg=cfg, ids=ids, num_frames=CHUNK, top_k=-1,
            kv_bucket=kv_b, fast_kernel=True)
        np.asarray(fr[:, -1])  # compile + sync
        times = []
        for rep in range(3):
            st = fresh()
            t0 = time.perf_counter()
            for i in range(args.chunks):
                st, fr, _ = decode_mod.decode_chunk(
                    params, rope, st, jax.random.PRNGKey(2 + i), t, p, r,
                    cfg=cfg, ids=ids, num_frames=CHUNK, top_k=-1,
                    kv_bucket=kv_b, fast_kernel=True)
            np.asarray(fr[:, -1])
            times.append(time.perf_counter() - t0)
        ms = min(times) / (args.chunks * CHUNK) * 1e3
        print(f"kv_bucket={kv_b}: {ms:.3f} ms/frame -> {B / ms * 1e3:.0f} "
              f"aggregate tok/s  (times {[round(x, 3) for x in times]})")


if __name__ == "__main__":
    main()
