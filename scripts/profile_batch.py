#!/usr/bin/env python3
"""Component-level profiling of the BATCHED (B>1) decode step.

Round-3 finding: aggregate throughput at B=8 is flat vs single-stream
(543 vs 532 tok/s) — the batched XLA path is latency-chain-bound, not
bandwidth-bound.  This script attributes the per-frame budget at a given
batch size: full chunk, slow stack alone, LM head alone, fast codebook
loop alone, slow-token sampling alone.  All timings run FRAMES steps
inside jitted scans and synchronize with a host fetch.

Usage:  python scripts/profile_batch.py [-b 8] [-n N] [--tiny] [--cpu]
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
from functools import partial

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-b", type=int, default=8, help="batch size")
    ap.add_argument("-n", type=int, default=5, help="timing repetitions")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--kernels", action="store_true",
                    help="also time the Pallas-kernel batched path")
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
    int8 = not tiny
    B = args.b
    kv_b = min(cfg.max_seq_len, 512)
    FRAMES = 20

    def build(key):
        p = dual_ar.init_params(key, cfg, dtype=dtype)
        if int8:
            from fish_tts_tpu.ops import slow_stack

            p = slow_stack.prepare_head(quantize_lm_params(p), cfg)
        return p

    params = jax.jit(build)(jax.random.PRNGKey(0))
    rope = dual_ar.make_rope_tables(cfg)
    np.asarray(params["norm"][:1])
    print(f"# device={jax.devices()[0]} B={B} int8={int8}")

    t_, p_, r_ = jnp.float32(0.7), jnp.float32(0.8), jnp.float32(1.1)

    def timeit(label, warm_and_run, frames=FRAMES):
        warm_and_run(0)  # compile + warm
        t0 = time.perf_counter()
        for i in range(1, args.n + 1):
            out = warm_and_run(i)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / (args.n * frames)
        print(f"{label:36s}: {dt*1e3:7.3f} ms/frame -> "
              f"{B/dt:7.1f} tok/s aggregate")
        return dt

    # ---- full decode chunk (the production batched path) -----------------
    def run_chunk(fast_kernel):
        st = decode_mod.init_state(params, cfg, batch=B)
        st["pos"] = jnp.full((B,), 64, jnp.int32)
        fn = partial(
            decode_mod.decode_chunk, cfg=cfg, ids=ids, num_frames=FRAMES,
            top_k=-1, kv_bucket=kv_b, fast_kernel=fast_kernel,
        )

        def go(i):
            nonlocal st
            st, fr, _ = fn(params, rope, st, jax.random.PRNGKey(i),
                           t_, p_, r_)
            return np.asarray(fr)
        return go

    timeit("decode chunk (XLA)", run_chunk(False))
    if args.kernels:
        timeit("decode chunk (kernels)", run_chunk(True))

    # ---- slow stack alone (no head, no sampling, no fast loop) -----------
    @partial(jax.jit, donate_argnums=(1,))
    def slow_only(params, kv, frames_in, pos0):
        NEG = float(np.finfo(np.float32).min)

        def body(carry, frame):
            kv, pos = carry
            inp = frame[:, :, None]
            k_pos = jnp.arange(kv_b, dtype=jnp.int32)
            cache_bias = jnp.where(
                k_pos[None, None, None, :] < pos[:, None, None, None],
                0.0, NEG).astype(jnp.float32)
            block_bias = jnp.zeros((1, 1, 1, 1), jnp.float32)
            hidden, kv = dual_ar.slow_forward(
                params, cfg, ids, rope, inp, pos[:, None], kv,
                cache_bias, block_bias, read_len=kv_b)
            return (kv, pos + 1), hidden[:, 0, :8]

        (_, _), hs = jax.lax.scan(body, (kv, pos0), frames_in)
        return hs

    frames_in = jnp.zeros((FRAMES, B, 1 + cfg.num_codebooks), jnp.int32)
    pos0 = jnp.full((B,), 64, jnp.int32)

    def run_slow(i):
        kv = dual_ar.init_kv_cache(cfg, B, cfg.max_seq_len,
                                   params["norm"].dtype)
        return np.asarray(slow_only(params, kv, frames_in, pos0))

    timeit("slow stack alone (XLA)", run_slow)

    # ---- LM head alone ---------------------------------------------------
    @jax.jit
    def head_only(params, hs):
        def body(c, h):
            lg = dual_ar.lm_logits(params, cfg, h[:, None])[:, -1]
            return c, lg[:, :8]
        return jax.lax.scan(body, 0, hs)[1]

    hs = jnp.zeros((FRAMES, B, cfg.dim), dtype)
    timeit("LM head alone (XLA)", lambda i: np.asarray(head_only(params, hs)))

    # ---- fast codebook loop alone ----------------------------------------
    @jax.jit
    def fast_only(params, h_fast_seq, key):
        def outer(carry, h_fast):
            dt = params["norm"].dtype
            cache = dual_ar.new_fast_cache(params, cfg, B)
            _, cache = dual_ar.fast_step(
                params, cfg, rope, h_fast, jnp.int32(0), cache)
            emb = jnp.zeros((B, 1, cfg.fast_dim), dt)

            def inner(c, cb):
                emb, cache = c
                logits, cache = dual_ar.fast_step(
                    params, cfg, rope, emb, cb, cache)
                code = jnp.argmax(
                    logits[:, -1, :cfg.residual_codebook_size], axis=-1)
                from fish_tts_tpu.utils.quantize import qgather
                emb = qgather(params["fast_embeddings"], code, dt)[:, None]
                return (emb, cache), code

            cbs = jnp.arange(1, cfg.num_codebooks, dtype=jnp.int32)
            (_, _), codes = jax.lax.scan(inner, (emb, cache), cbs)
            return carry, codes

        return jax.lax.scan(outer, 0, h_fast_seq)[1]

    h_fast_seq = jnp.zeros((FRAMES, B, 1, cfg.fast_dim), dtype)
    timeit("fast codebook loop alone (XLA)",
           lambda i: np.asarray(fast_only(params, h_fast_seq,
                                          jax.random.PRNGKey(i))))

    # ---- slow-token sampling alone ---------------------------------------
    from fish_tts_tpu.engine.sampling import sample

    @jax.jit
    def sample_scan(logits, key):
        def body(c, k):
            tok = sample(k, c, t_, p_, r_, prev_idx=None, top_k=-1)
            return c + (tok[:, None] * 0).astype(c.dtype), tok
        return jax.lax.scan(body, logits, jax.random.split(key, FRAMES))

    logits = jax.random.normal(
        jax.random.PRNGKey(2), (B, cfg.vocab_size), jnp.float32) * 4.0
    timeit("slow sampling alone (top_p thresh)",
           lambda i: np.asarray(sample_scan(logits, jax.random.PRNGKey(i))[1]))

    # ---- kernel-path components -------------------------------------------
    # Pallas outputs are post-processed INSIDE each scan body (slice /
    # scatter) to break the kCustom call+stacking fusion (see the hazard
    # note at ops/fast_decoder.py).
    if not args.kernels:
        return

    from fish_tts_tpu.ops import fast_decoder, sampler_kernel, slow_stack

    if slow_stack.supports(cfg, params, B) and slow_stack.fits(cfg, B, kv_b):
        @jax.jit
        def slow_kernel_scan(params, kv, pos0):
            def body(carry, _):
                kv, pos = carry
                x = jnp.zeros((B, cfg.dim), jnp.float32)
                hidden, new_k, new_v, klogits = slow_stack.slow_stack_step(
                    params, cfg, rope["slow"], x, kv, pos, read_len=kv_b)
                cdt = kv["k"].dtype
                kc, vc = kv["k"], kv["v"]
                nk, nv = new_k.astype(cdt), new_v.astype(cdt)
                for b in range(B):
                    start = (0, b, 0, pos[b], 0)
                    kc = jax.lax.dynamic_update_slice(kc, nk[:, b:b+1], start)
                    vc = jax.lax.dynamic_update_slice(vc, nv[:, b:b+1], start)
                out = (hidden[:, 0, :8], klogits[:, :8])
                return ({"k": kc, "v": vc}, pos + 1), out
            (_, _), outs = jax.lax.scan(body, (kv, pos0), None, length=FRAMES)
            return outs

        def run_slow_kernel(i):
            kv = dual_ar.init_kv_cache(cfg, B, cfg.max_seq_len,
                                       params["norm"].dtype)
            return np.asarray(slow_kernel_scan(params, kv, pos0)[0])

        timeit("slow kernel + head + scatter", run_slow_kernel)

    if fast_decoder.supports(cfg, params, B):
        W = 16

        @jax.jit
        def fast_kernel_scan(params, key):
            def body(c, k):
                h = jnp.zeros((B, cfg.fast_dim), jnp.float32)
                a0 = jnp.zeros((B,), jnp.int32)
                prev_rows = jnp.zeros((B, cfg.num_codebooks - 1, W),
                                      jnp.int32)
                gumbel = jax.random.gumbel(
                    k, (B, cfg.num_codebooks - 1,
                        cfg.residual_codebook_size), jnp.float32)
                codes, _ = fast_decoder.fast_decode_frame(
                    params, cfg, rope["fast"], h, a0, prev_rows, gumbel,
                    t_, p_, r_, window=W)
                return c, codes[:, :8]
            return jax.lax.scan(body, 0,
                                jax.random.split(key, FRAMES))[1]

        timeit("fast kernel (codebook loop)",
               lambda i: np.asarray(fast_kernel_scan(
                   params, jax.random.PRNGKey(i))))

    if sampler_kernel.supports(B, -1):
        @jax.jit
        def sampler_kernel_scan(logits, key):
            pc = jnp.zeros((B, 1 + cfg.num_codebooks), jnp.int32)
            def body(c, k):
                tok = sampler_kernel.sample_slow(
                    jax.random.split(k, B), c, pc, t_, p_, r_,
                    vocab=cfg.vocab_size)
                return c + (tok[:, None] * 0).astype(c.dtype), tok
            return jax.lax.scan(body, logits,
                                jax.random.split(key, FRAMES))[1]

        timeit("sampler kernel (fused top-p)",
               lambda i: np.asarray(sampler_kernel_scan(
                   logits, jax.random.PRNGKey(i))))


if __name__ == "__main__":
    main()
