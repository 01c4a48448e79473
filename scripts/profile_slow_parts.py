#!/usr/bin/env python3
"""Attribute the batched slow-stack step cost: full vs no-scatter vs
no-attention vs matmuls-only, at a given batch size.

Usage: python scripts/profile_slow_parts.py [-b 8] [-n 5]
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
    ap.add_argument("-b", type=int, default=8)
    ap.add_argument("-n", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from fish_tts_tpu.config import S1_MINI_CONFIG, TINY_CONFIG
    from fish_tts_tpu.models import dual_ar
    from fish_tts_tpu.ops.attention import gqa_attention_two_part
    from fish_tts_tpu.utils.compile_cache import setup_compile_cache
    from fish_tts_tpu.utils.quantize import qmm, quantize_lm_params

    setup_compile_cache()
    tiny = args.cpu
    cfg = TINY_CONFIG if tiny else S1_MINI_CONFIG
    dtype = jnp.float32 if tiny else jnp.bfloat16
    B = args.b
    R = min(cfg.max_seq_len, 512)
    FRAMES = 20
    NEG = float(np.finfo(np.float32).min)

    def build(key):
        p = dual_ar.init_params(key, cfg, dtype=dtype)
        return p if tiny else quantize_lm_params(p)

    params = jax.jit(build)(jax.random.PRNGKey(0))
    rope = dual_ar.make_rope_tables(cfg)
    np.asarray(params["norm"][:1])
    print(f"# device={jax.devices()[0]} B={B} R={R}")

    def timeit(label, fn, *xs):
        out = fn(*xs)
        np.asarray(jax.tree_util.tree_leaves(out)[0])  # compile+warm
        t0 = time.perf_counter()
        for _ in range(args.n):
            out = fn(*xs)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        dt = (time.perf_counter() - t0) / (args.n * FRAMES)
        print(f"{label:40s}: {dt*1e3:7.3f} ms/frame")
        return dt

    lw = params["layers"]
    x0 = jnp.zeros((B, cfg.dim), dtype)
    kv = dual_ar.init_kv_cache(cfg, B, cfg.max_seq_len, dtype)
    pos0 = jnp.full((B,), 64, jnp.int32)

    # 1. matmuls only: per-layer qkv/o/ffn chain, no attention, no cache
    @jax.jit
    def matmuls_only(params, x):
        def frame(x, _):
            def body(h, lp):
                q = qmm(h[:, None], lp["wqkv"])[:, 0]
                h = h + qmm(q[:, : cfg.dim][:, None], lp["wo"])[:, 0]
                f = qmm(h[:, None], lp["w1"])[:, 0]
                g = qmm(h[:, None], lp["w3"])[:, 0]
                h = h + qmm((f * g)[:, None], lp["w2"])[:, 0]
                return h, None
            x, _ = jax.lax.scan(body, x, params["layers"])
            return x, x[:, :8]
        _, hs = jax.lax.scan(frame, x, None, length=FRAMES)
        return hs

    timeit("matmul chain only (scan over layers)", matmuls_only, params, x0)

    # 2. attention only: per-layer two-part attention against the R-slice,
    #    no matmuls, no scatter
    @jax.jit
    def attention_only(params, kv, pos):
        k_read = kv["k"][:, :, :, :R]
        v_read = kv["v"][:, :, :, :R]
        q0 = jnp.zeros((B, cfg.n_head, 1, cfg.head_dim), dtype)
        k0 = jnp.zeros((B, cfg.n_local_heads, 1, cfg.head_dim), dtype)
        cache_bias = jnp.where(
            jnp.arange(R)[None, None, None, :] < pos[:, None, None, None],
            0.0, NEG).astype(jnp.float32)
        block_bias = jnp.zeros((1, 1, 1, 1), jnp.float32)

        def frame(c, _):
            def body(h, inputs):
                kc, vc = inputs
                o = gqa_attention_two_part(
                    q0 + h[:, None, None, :cfg.head_dim], kc, vc,
                    cache_bias, k0, k0, block_bias)
                return h + o[:, 0, 0], None
            h, _ = jax.lax.scan(body, c, (k_read, v_read))
            return h, h[:, :8]
        _, hs = jax.lax.scan(frame, jnp.zeros((B, cfg.dim), dtype), None,
                             length=FRAMES)
        return hs

    timeit("attention only (R-slice, no scatter)", attention_only, params, kv, pos0)

    # 3. scatter only: the per-frame KV cache row write
    @partial(jax.jit, donate_argnums=(0,))
    def scatter_only(kv, pos):
        rows = jnp.zeros(
            (cfg.n_layer, B, cfg.n_local_heads, 1, cfg.head_dim), dtype)

        def frame(carry, _):
            kv, pos = carry
            b_idx = jnp.arange(B)[:, None]
            rk = jnp.transpose(rows, (1, 3, 0, 2, 4))
            k = kv["k"].at[:, b_idx, :, pos[:, None]].set(rk)
            v = kv["v"].at[:, b_idx, :, pos[:, None]].set(rk)
            return ({"k": k, "v": v}, pos + 1), pos[:1]
        (kv, _), out = jax.lax.scan(frame, (kv, pos), None, length=FRAMES)
        return kv, out

    kv2 = dual_ar.init_kv_cache(cfg, B, cfg.max_seq_len, dtype)
    timeit("cache scatter only (advanced idx)", scatter_only, kv2, pos0)

    # 4. scatter via per-stream dynamic_update_slice
    @partial(jax.jit, donate_argnums=(0,))
    def scatter_dus(kv, pos):
        rows = jnp.zeros(
            (cfg.n_layer, B, cfg.n_local_heads, 1, cfg.head_dim), dtype)

        def frame(carry, _):
            kv, pos = carry
            k, v = kv["k"], kv["v"]
            for b in range(B):
                start = (0, b, 0, pos[b], 0)
                k = jax.lax.dynamic_update_slice(k, rows[:, b:b+1], start)
                v = jax.lax.dynamic_update_slice(v, rows[:, b:b+1], start)
            return ({"k": k, "v": v}, pos + 1), pos[:1]
        (kv, _), out = jax.lax.scan(frame, (kv, pos), None, length=FRAMES)
        return kv, out

    kv3 = dual_ar.init_kv_cache(cfg, B, cfg.max_seq_len, dtype)
    timeit("cache scatter only (B x dyn_upd_slice)", scatter_dus, kv3, pos0)

    # 5. full slow_forward chain for reference
    from fish_tts_tpu.models.dual_ar import TokenIds
    ids = TokenIds(400, 447, 5) if tiny else TokenIds(151672, 155767, 151661)

    @partial(jax.jit, donate_argnums=(1,))
    def full(params, kv, pos):
        def frame(carry, _):
            kv, pos = carry
            inp = jnp.zeros((B, 1 + cfg.num_codebooks, 1), jnp.int32)
            cache_bias = jnp.where(
                jnp.arange(R)[None, None, None, :] < pos[:, None, None, None],
                0.0, NEG).astype(jnp.float32)
            block_bias = jnp.zeros((1, 1, 1, 1), jnp.float32)
            h, kv = dual_ar.slow_forward(
                params, cfg, ids, rope, inp, pos[:, None], kv,
                cache_bias, block_bias, read_len=R)
            return (kv, pos + 1), h[:, 0, :8]
        (_, _), hs = jax.lax.scan(frame, (kv, pos), None, length=FRAMES)
        return hs

    kv4 = dual_ar.init_kv_cache(cfg, B, cfg.max_seq_len, dtype)
    timeit("full slow_forward (XLA)", full, params, kv4, pos0)


if __name__ == "__main__":
    main()
