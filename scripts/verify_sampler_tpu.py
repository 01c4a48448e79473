#!/usr/bin/env python3
"""TPU bit-exactness check: sampler kernel vs XLA threshold sampler at the
real S1-mini vocab width (155767 — not lane-aligned; Mosaic pads to 155776
internally and must not let padding lanes win the argmax).

Prints a per-(B, seed, params) OK/MISMATCH line and a total; exit code is
nonzero on any mismatch.  Meant for the real TPU (the interpret-mode
equivalence lives in tests/test_sampler_kernel.py); runs on any backend.

Usage:  python scripts/verify_sampler_tpu.py
"""

# Allow running straight from a source checkout without installation.
import sys as _sys
from pathlib import Path as _Path

try:
    import fish_tts_tpu  # noqa: F401
except ModuleNotFoundError:
    _sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from fish_tts_tpu.config import S1_MINI_CONFIG as cfg
from fish_tts_tpu.engine import sampling
from fish_tts_tpu.ops import sampler_kernel as sk
from fish_tts_tpu.utils.compile_cache import setup_compile_cache


def main() -> int:
    setup_compile_cache()
    V = cfg.vocab_size
    print("vocab:", V, "backend:", jax.default_backend(), flush=True)

    mismatch = 0
    for B in (1, 8, 16):
        for seed in range(3):
            rng = jax.random.PRNGKey(seed)
            logits = jax.random.normal(rng, (B, V), jnp.float32) * 4.0
            prev = jax.random.randint(
                jax.random.PRNGKey(seed + 50), (B, 11), 0, V
            )
            keys = jax.vmap(
                lambda i: jax.random.fold_in(jax.random.PRNGKey(7), i)
            )(jnp.arange(B) + seed * 100)
            for t, p, r in ((0.7, 0.8, 1.1), (0.9, 1.0, 1.0)):
                got = np.asarray(sk.sample_slow(
                    keys, logits, prev, jnp.float32(t), jnp.float32(p),
                    jnp.float32(r), vocab=V,
                ))
                want = np.asarray(sampling.sample(
                    keys, logits, jnp.float32(t), jnp.float32(p),
                    jnp.float32(r), prev_idx=prev, top_k=-1,
                ))
                bad = (got != want).sum()
                mismatch += int(bad)
                print(f"B={B} seed={seed} t={t} p={p}: "
                      f"{'OK' if bad == 0 else f'{bad} MISMATCH'}",
                      flush=True)
    print("total mismatches:", mismatch, flush=True)
    return 1 if mismatch else 0


if __name__ == "__main__":
    raise SystemExit(main())
