#!/usr/bin/env python3
"""Component-level decode profiling on the current device.

Times the pieces of the per-frame budget separately — the full decode chunk
with the Pallas kernels vs the XLA paths, plus slow-token sampling — so
regressions can be attributed.  All timings run N frames inside jitted
scans (per-call dispatch would otherwise dominate) and synchronize with a
host fetch (on the tunneled TPU platform block_until_ready alone is not a
barrier).

Usage:  python scripts/profile_decode.py [--tiny] [--cpu] [--bf16] [-n N]
"""

from __future__ import annotations

# Allow running straight from a source checkout without installation.
import sys as _sys
from pathlib import Path as _Path

try:
    import fish_tts_tpu  # noqa: F401
except ModuleNotFoundError:
    _sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import time
from functools import partial

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--bf16", action="store_true", help="skip int8 + kernels")
    ap.add_argument("-n", type=int, default=5, help="timing repetitions")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from fish_tts_tpu.config import S1_MINI_CONFIG, TINY_CONFIG
    from fish_tts_tpu.engine import decode as decode_mod
    from fish_tts_tpu.models import dual_ar
    from fish_tts_tpu.models.dual_ar import TokenIds
    from fish_tts_tpu.utils.compile_cache import setup_compile_cache
    from fish_tts_tpu.utils.quantize import quantize_lm_params

    setup_compile_cache()
    tiny = args.tiny or args.cpu
    cfg = TINY_CONFIG if tiny else S1_MINI_CONFIG
    ids = TokenIds(400, 447, 5) if tiny else TokenIds(151672, 155767, 151661)
    dtype = jnp.float32 if tiny else jnp.bfloat16
    int8 = not args.bf16 and not tiny
    top_k = 32 if tiny else 512
    kv_b = min(cfg.max_seq_len, 512)
    FRAMES = 20
    on_tpu = jax.default_backend() == "tpu"

    def build(key):
        p = dual_ar.init_params(key, cfg, dtype=dtype)
        if int8:
            from fish_tts_tpu.ops import slow_stack

            p = slow_stack.prepare_head(quantize_lm_params(p), cfg)
        return p

    params = jax.jit(build)(jax.random.PRNGKey(0))
    rope = dual_ar.make_rope_tables(cfg)
    np.asarray(params["norm"][:1])
    print(f"# device={jax.devices()[0]} int8={int8} kernels={int8 and on_tpu}")

    t_, p_, r_ = jnp.float32(0.7), jnp.float32(0.8), jnp.float32(1.1)

    def fresh():
        st = decode_mod.init_state(params, cfg, batch=1)
        st["pos"] = jnp.asarray([64 if not tiny else 16], jnp.int32)
        return st

    def time_chunk(label, **kw):
        fn = partial(
            decode_mod.decode_chunk, cfg=cfg, ids=ids, num_frames=FRAMES,
            top_k=top_k, kv_bucket=kv_b, **kw,
        )
        st = fresh()
        st, fr, _ = fn(params, rope, st, jax.random.PRNGKey(0), t_, p_, r_)
        np.asarray(fr)  # compile + warm
        t0 = time.perf_counter()
        for i in range(args.n):
            st, fr, _ = fn(params, rope, st, jax.random.PRNGKey(i), t_, p_, r_)
        np.asarray(fr)
        dt = (time.perf_counter() - t0) / (args.n * FRAMES)
        print(f"{label:34s}: {dt*1e3:6.2f} ms/frame -> {1/dt:6.1f} tok/s")
        return dt

    full_xla = time_chunk("decode chunk (XLA paths)", fast_kernel=False)
    if int8 and on_tpu:
        full_k = time_chunk("decode chunk (Pallas kernels)", fast_kernel=True)
        print(f"{'kernel speedup':34s}: {full_xla / full_k:6.2f}x")

    # sampling alone (slow-token top-p over the full vocab)
    from fish_tts_tpu.engine.sampling import sample

    def sample_scan(logits, key):
        def body(c, k):
            tok = sample(k, c, t_, p_, r_, prev_idx=None, top_k=top_k)
            return c + (tok[0] * 0).astype(c.dtype), tok
        return jax.lax.scan(body, logits, jax.random.split(key, FRAMES))

    logits = jax.random.normal(
        jax.random.PRNGKey(2), (1, cfg.vocab_size), jnp.float32
    ) * 4.0
    jfn = jax.jit(sample_scan)
    np.asarray(jfn(logits, jax.random.PRNGKey(0))[1])
    t0 = time.perf_counter()
    for i in range(args.n):
        _, toks = jfn(logits, jax.random.PRNGKey(i))
    np.asarray(toks)
    dt = (time.perf_counter() - t0) / (args.n * FRAMES)
    print(f"{'slow sampling (top_k=%d)' % top_k:34s}: {dt*1e3:6.2f} ms/frame")


if __name__ == "__main__":
    main()
