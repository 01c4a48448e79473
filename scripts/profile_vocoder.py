#!/usr/bin/env python3
"""Component attribution for the pool-vocoder chunk (the full-audio serving
bottleneck once LM decode is kernel-fast).

Times, each inside a jitted scan (dispatch-free), at the serving shape
(B slots x F frames):

- the whole ``dac_decode`` chunk,
- ``decoder_forward`` alone (conv stack incl. upsamples),
- per-stage: every snake, conv, transposed conv at its exact hot shape,

so "conv compute near ceiling" vs "VPU snake/elementwise" is measured, not
guessed (PERFORMANCE.md round-4 parked a fused conv+snake kernel on a ~49
of ~59 ms estimate for the conv stack).

Usage: python scripts/profile_vocoder.py [-b 16] [-f 20] [-n 5] [--tiny]
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
    ap.add_argument("-b", type=int, default=16)
    ap.add_argument("-f", type=int, default=20, help="frames per chunk")
    ap.add_argument("-n", type=int, default=5)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fish_tts_tpu.config import TINY_VOCODER_CONFIG, VocoderConfig
    from fish_tts_tpu.models import vocoder as voc
    from fish_tts_tpu.ops.conv import causal_conv1d, causal_conv_transpose1d
    from fish_tts_tpu.ops.norms import snake
    from fish_tts_tpu.utils.compile_cache import setup_compile_cache

    setup_compile_cache()
    cfg = TINY_VOCODER_CONFIG if args.tiny else VocoderConfig()
    dtype = jnp.float32 if args.tiny else jnp.bfloat16
    B, F = args.b, args.f

    params = jax.jit(
        lambda k: voc.init_vocoder_params(k, cfg, dtype=dtype)
    )(jax.random.PRNGKey(0))
    np.asarray(jax.tree_util.tree_leaves(params)[0]).ravel()[:1]
    print(f"# device={jax.devices()[0]} B={B} F={F} dtype={dtype.__name__}")

    REPS = 8

    @partial(jax.jit, static_argnums=(0,))
    def _scan(fn, p, *xs):
        # params ride as a traced argument — closing over them would embed
        # the weights as constants in the serialized HLO and blow the
        # remote compile service's request-size limit (HTTP 413)
        def body(c, _):
            out = fn(p, *xs)
            # fold a scalar of the output back into the carry so the
            # loop body cannot be hoisted/elided
            s = jnp.sum(out[..., :1].astype(jnp.float32))
            return c + s * 0, ()
        return jax.lax.scan(body, jnp.float32(0), None, length=REPS)[0]

    def timeit(label, fn, p, *xs):
        """Time fn(p, *xs) inside a scan of REPS iterations (one dispatch)."""
        np.asarray(_scan(fn, p, *xs))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(args.n):
            out = _scan(fn, p, *xs)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / (args.n * REPS)
        print(f"{label:44s}: {dt*1e3:8.3f} ms", flush=True)
        return dt

    # whole chunk through the codec
    codes = jnp.asarray(
        np.random.RandomState(0).randint(
            0, cfg.residual_codebook_size, (B, cfg.num_codebooks, F)
        )
    )
    total = timeit(
        "dac_decode (full pool chunk)",
        lambda p, c: voc.dac_decode(p, cfg, c), params, codes)

    z = voc.quantizer_decode(params["quantizer"], cfg, codes)
    timeit("decoder_forward (conv stack)",
           lambda p, zz: voc.decoder_forward(p, cfg, zz),
           params["decoder"], z)

    # per-stage attribution at exact shapes
    dp = params["decoder"]
    x = causal_conv1d(z, dp["stem"]["w"], dp["stem"]["b"])
    snake_t = conv_t = up_t = 0.0
    for bi, (block, stride) in enumerate(zip(dp["blocks"], cfg.decoder_rates)):
        c_in, t_in = x.shape[1], x.shape[2]
        snake_t += timeit(
            f"  block{bi} snake ({c_in}x{t_in})",
            lambda p, xx: snake(xx, p["snake"]), block, x)
        up_t += timeit(
            f"  block{bi} up-conv_t (s={stride})",
            lambda p, xx, s=stride: causal_conv_transpose1d(
                xx, p["up"]["w"], p["up"]["b"], stride=s), block, x)
        x = causal_conv_transpose1d(
            x, block["up"]["w"], block["up"]["b"], stride=stride)
        for dil, unit in zip((1, 3, 9), block["units"]):
            c_u, t_u = x.shape[1], x.shape[2]
            snake_t += 2 * timeit(
                f"  block{bi} unit snake ({c_u}x{t_u})",
                lambda p, xx: snake(xx, p["snake1"]), unit, x)
            conv_t += timeit(
                f"  block{bi} unit conv7 d={dil} ({c_u}x{t_u})",
                lambda p, xx, d=dil: causal_conv1d(
                    xx, p["conv1"]["w"], p["conv1"]["b"], dilation=d),
                unit, x)
            conv_t += timeit(
                f"  block{bi} unit conv1 ({c_u}x{t_u})",
                lambda p, xx: causal_conv1d(
                    xx, p["conv2"]["w"], p["conv2"]["b"]), unit, x)
            x = voc._residual_unit(unit, x, dil)
    c_f, t_f = x.shape[1], x.shape[2]
    snake_t += timeit(
        f"  final snake ({c_f}x{t_f})",
        lambda p, xx: snake(xx, p["final_snake"]), dp, x)
    conv_t += timeit(
        f"  final conv ({c_f}x{t_f})",
        lambda p, xx: causal_conv1d(
            xx, p["final_conv"]["w"], p["final_conv"]["b"]), dp, x)

    print(f"# totals: snake {snake_t*1e3:.2f} ms, unit/final convs "
          f"{conv_t*1e3:.2f} ms, up-convs {up_t*1e3:.2f} ms, "
          f"whole chunk {total*1e3:.2f} ms")


if __name__ == "__main__":
    main()
