#!/usr/bin/env python3
"""Component-level decode profiling: time slow forward, fast loop, and
sampling separately to find the per-frame budget.

The working equivalent of the reference's (stale) scripts/profile_detailed.py.
All timings use host fetches as barriers (axon block_until_ready is a no-op).
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
import sys
import time
from functools import partial

import numpy as np


def bench_fn(fn, args, n=20, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("-n", type=int, default=20)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from fish_tts_tpu.config import S1_MINI_CONFIG, TINY_CONFIG
    from fish_tts_tpu.engine import decode as decode_mod
    from fish_tts_tpu.engine.sampling import sample
    from fish_tts_tpu.models import dual_ar
    from fish_tts_tpu.models.dual_ar import TokenIds
    from fish_tts_tpu.utils.compile_cache import setup_compile_cache

    setup_compile_cache()
    cfg = TINY_CONFIG if args.tiny else S1_MINI_CONFIG
    ids = (
        TokenIds(400, 447, 5)
        if args.tiny
        else TokenIds(151672, 155767, 151661)
    )
    dtype = jnp.float32 if args.tiny else jnp.bfloat16
    n = args.n

    params = dual_ar.init_params(jax.random.PRNGKey(0), cfg, dtype=dtype)
    rope = dual_ar.make_rope_tables(cfg)
    state = decode_mod.init_state(params, cfg, batch=1)
    state["pos"] = jnp.asarray([48], jnp.int32)
    S = cfg.max_seq_len
    NEG = float(np.finfo(np.float32).min)

    # --- 1. slow forward (1 token) + lm head ------------------------------
    @jax.jit
    def slow_step(params, rope, kv, frame, pos):
        inp = frame[:, :, None]
        positions = pos[:, None]
        k_pos = jnp.arange(S, dtype=jnp.int32)
        cache_bias = jnp.where(
            k_pos[None, None, None, :] < pos[:, None, None, None], 0.0, NEG
        ).astype(jnp.float32)
        block_bias = jnp.zeros((1, 1, 1, 1), jnp.float32)
        hidden, kv = dual_ar.slow_forward(
            params, cfg, ids, rope, inp, positions, kv, cache_bias, block_bias
        )
        logits = dual_ar.lm_logits(params, cfg, hidden)[:, -1]
        return hidden, logits, kv

    frame = jnp.zeros((1, 1 + cfg.num_codebooks), jnp.int32)
    pos = jnp.asarray([48], jnp.int32)
    dt = bench_fn(slow_step, (params, rope, state["kv"], frame, pos), n)
    print(f"slow_forward+head : {dt*1e3:8.2f} ms")
    hidden, logits, _ = slow_step(params, rope, state["kv"], frame, pos)

    # --- 2. lm head alone -------------------------------------------------
    @jax.jit
    def head_only(params, hidden):
        return dual_ar.lm_logits(params, cfg, hidden)[:, -1]

    dt = bench_fn(head_only, (params, hidden), n)
    print(f"lm head (tied)    : {dt*1e3:8.2f} ms   (vocab {cfg.vocab_size})")

    # --- 3. sampling: top_k path over full vocab --------------------------
    @partial(jax.jit, static_argnames=("top_k",))
    def sample_only(logits, key, top_k):
        return sample(
            key, logits, jnp.float32(0.7), jnp.float32(0.8), jnp.float32(1.1),
            prev_idx=jnp.zeros((1, 16), jnp.int32), top_k=top_k,
        )

    for tk in (1024, 64, 0):
        dt = bench_fn(sample_only, (logits, jax.random.PRNGKey(0)), n=n) if False else \
             bench_fn(lambda l, k: sample_only(l, k, tk), (logits, jax.random.PRNGKey(0)), n)
        label = f"top_k={tk}" if tk else "full sort"
        print(f"sample slow ({label:9s}): {dt*1e3:6.2f} ms")

    # --- 4. fast loop (10 sequential steps) -------------------------------
    @jax.jit
    def fast_loop(params, rope, hidden):
        h_fast = dual_ar.project_fast_in(params, hidden).astype(dtype)
        cache = dual_ar.new_fast_cache(params, cfg, 1)
        _, cache = dual_ar.fast_step(params, cfg, rope, h_fast, jnp.int32(0), cache)
        emb = params["fast_embeddings"][jnp.zeros((1,), jnp.int32)][:, None]

        def body(carry, cb):
            emb, cache = carry
            lg, cache = dual_ar.fast_step(params, cfg, rope, emb, cb, cache)
            code = jnp.argmax(lg[:, -1, : cfg.residual_codebook_size], axis=-1)
            emb = params["fast_embeddings"][code][:, None]
            return (emb, cache), code

        (_, _), codes = jax.lax.scan(
            body, (emb, cache), jnp.arange(1, cfg.num_codebooks, dtype=jnp.int32)
        )
        return codes

    dt = bench_fn(fast_loop, (params, rope, hidden), n)
    print(f"fast loop (argmax): {dt*1e3:8.2f} ms   ({cfg.num_codebooks} steps, "
          f"{cfg.n_fast_layer} layers)")

    # --- 5. full decode chunk per-frame -----------------------------------
    t_, p_, r_ = jnp.float32(0.7), jnp.float32(0.8), jnp.float32(1.1)
    st = decode_mod.init_state(params, cfg, batch=1)
    st["pos"] = jnp.asarray([48], jnp.int32)
    CH = 20

    def chunk20(st, key):
        return decode_mod.decode_chunk(
            params, rope, st, key, t_, p_, r_,
            cfg=cfg, ids=ids, num_frames=CH, top_k=1024,
        )

    st, fr, _ = chunk20(st, jax.random.PRNGKey(0))  # compile
    np.asarray(fr)
    t0 = time.perf_counter()
    for i in range(5):
        st, fr, _ = chunk20(st, jax.random.PRNGKey(i))
    np.asarray(fr)
    per_frame = (time.perf_counter() - t0) / (5 * CH)
    print(f"full decode frame : {per_frame*1e3:8.2f} ms   -> "
          f"{1/per_frame:.1f} tok/s")


if __name__ == "__main__":
    main()
