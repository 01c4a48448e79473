#!/usr/bin/env python3
"""Per-phase wall-time attribution of the audio-serving round.

Audio serving (ServeSession: LM continuous batching + pool vocoder, PCM
out) runs at ~1.56k tok/s while LM-only serving runs ~2.54k (BENCH r5) —
the vocoder leg adds ~40% wall per round even though the pool vocoder
chunk is only ~8 ms of device compute (scripts/profile_vocoder.py).  This
script runs the exact _measure_audio_serving workload with the round's
phases timed from the driver thread:

- lm_step        ContinuousBatcher.step (decode dispatch + PREV chunk fetch)
- voc_dispatch   pool vocoder program dispatch (asarray H2D + call)
- audio_fetch    np.asarray of the PREV round's audio (device->host PCM)
- pcm_convert    float->int16 bytes on host
- host_other     everything else in ServeSession.step

so "tunnel round trips" vs "device compute" vs "host python" is measured,
not guessed.

Usage: python scripts/profile_serving.py [--slots 16] [--budget 200]
       [--requests 32] [--tiny]
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
from collections import defaultdict


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=16)
    ap.add_argument("--budget", type=int, default=200,
                    help="max_new_tokens per request")
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fish_tts_tpu.config import (
        S1_MINI_CONFIG,
        TINY_CONFIG,
        TINY_VOCODER_CONFIG,
        VocoderConfig,
    )
    from fish_tts_tpu.models import dual_ar
    from fish_tts_tpu.models import vocoder as voc
    from fish_tts_tpu.models.tokenizer import (
        FishTokenizer,
        tiny_special_tokens,
        write_tiny_vocab,
    )
    from fish_tts_tpu.synthesizer import FishTTS
    from fish_tts_tpu.utils.compile_cache import setup_compile_cache

    setup_compile_cache()
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        cfg, vcfg, dtype = TINY_CONFIG, TINY_VOCODER_CONFIG, jnp.float32
    else:
        cfg, vcfg, dtype = S1_MINI_CONFIG, VocoderConfig(), jnp.bfloat16

    d = _Path(tempfile.mkdtemp(prefix="fish_tts_profserve_"))
    write_tiny_vocab(d / "tokenizer.tiktoken")
    tokenizer = FishTokenizer(
        d / "tokenizer.tiktoken", tiny_special_tokens(cfg.codebook_size)
    )

    t0 = time.perf_counter()

    def build(key):
        p = dual_ar.init_params(key, cfg, dtype=dtype)
        if not args.tiny:
            from fish_tts_tpu.utils.quantize import quantize_lm_params

            p = quantize_lm_params(p)
        return p

    params = jax.jit(build)(jax.random.PRNGKey(0))
    vparams = jax.jit(
        lambda k: voc.init_vocoder_params(k, vcfg, dtype=dtype)
    )(jax.random.PRNGKey(7))
    np.asarray(jax.tree_util.tree_leaves(vparams)[0]).ravel()[:1]
    print(f"# init {time.perf_counter() - t0:.1f}s  device={jax.devices()[0]}",
          flush=True)

    # params are already quantized in build(); "bf16" here only sets the
    # activation dtype (the quantization-aware cast skips q/s leaves)
    tts = FishTTS(
        precision="fp32" if args.tiny else "bf16",
        warmup=False,
        _testing_bundle=(cfg, params, tokenizer, vcfg, vparams),
    )
    sess = tts.serve(slots=args.slots)

    # ---- instrument the round phases --------------------------------------
    phases: dict[str, float] = defaultdict(float)
    counts: dict[str, int] = defaultdict(int)

    def wrap(obj, name, label):
        fn = getattr(obj, name)

        def timed(*a, **kw):
            t = time.perf_counter()
            out = fn(*a, **kw)
            phases[label] += time.perf_counter() - t
            counts[label] += 1
            return out

        setattr(obj, name, timed)

    wrap(sess, "_emit", "audio_fetch+convert")
    wrap(sess._srv, "step", "lm_step")
    dec = sess._decode

    def timed_decode(*a, **kw):
        t = time.perf_counter()
        out = dec(*a, **kw)
        phases["voc_dispatch"] += time.perf_counter() - t
        counts["voc_dispatch"] += 1
        return out

    sess._decode = timed_decode

    # inside lm_step, split dispatch vs fetch: wrap decode_chunk at the
    # module level (dispatch) — the remainder of lm_step is the prev fetch
    # + scheduling
    from fish_tts_tpu.engine import decode as decode_mod

    dc = decode_mod.decode_chunk

    def timed_dc(*a, **kw):
        t = time.perf_counter()
        out = dc(*a, **kw)
        phases["lm_dispatch"] += time.perf_counter() - t
        counts["lm_dispatch"] += 1
        return out

    decode_mod.decode_chunk = timed_dc

    import fish_tts_tpu.engine.serve as serve_mod

    # _process fetches frames/emitted with np.asarray — count those too
    proc = serve_mod.ContinuousBatcher._process

    def timed_proc(self, *a, **kw):
        t = time.perf_counter()
        out = proc(self, *a, **kw)
        phases["lm_frames_fetch+route"] += time.perf_counter() - t
        counts["lm_frames_fetch+route"] += 1
        return out

    serve_mod.ContinuousBatcher._process = timed_proc

    # ---- warmup (compiles) -------------------------------------------------
    t0 = time.perf_counter()
    for _ in range(2):
        sess.submit("warm up the pool", max_new_tokens=24)
    for _ in sess.run():
        pass
    print(f"# warmup {time.perf_counter() - t0:.1f}s", flush=True)
    phases.clear()
    counts.clear()

    # ---- measured workload (same as bench _measure_audio_serving) ---------
    n_req, budget = args.requests, args.budget
    t0 = time.perf_counter()
    pending = n_req
    frames = 0
    pcm_bytes = 0
    rounds = 0
    for _ in range(args.slots):
        sess.submit("a serving benchmark request", max_new_tokens=budget)
        pending -= 1
    while sess.busy or pending:
        t_r = time.perf_counter()
        evs = sess.step()
        rounds += 1
        phases["TOTAL step"] += time.perf_counter() - t_r
        for ev in evs:
            pcm_bytes += len(ev.pcm)
            if ev.done:
                frames += ev.frames_total
                if pending:
                    sess.submit("a serving benchmark request",
                                max_new_tokens=budget)
                    pending -= 1
    wall = time.perf_counter() - t0
    agg = frames / wall
    print(f"\n# {agg:.0f} tok/s aggregate, {rounds} rounds, "
          f"{wall / rounds * 1e3:.1f} ms/round, "
          f"{pcm_bytes / 2 / tts.sample_rate / wall:.1f}x realtime")
    tot = phases.pop("TOTAL step", wall)
    lm = phases.pop("lm_step", 0.0)
    lm_disp = phases.pop("lm_dispatch", 0.0)
    lm_fetch = phases.pop("lm_frames_fetch+route", 0.0)

    def row(k, v):
        print(f"  {k:28s} {v:8.2f} s  ({v / rounds * 1e3:7.2f} ms/round, "
              f"{100 * v / tot:5.1f}% of step; n={counts.get(k, 0)})")

    row("lm_step (total)", lm)
    row("  lm_dispatch", lm_disp)
    row("  lm_frames_fetch+route", lm_fetch)
    print(f"  {'  lm sched remainder':28s} {lm - lm_disp - lm_fetch:8.2f} s")
    top = lm
    for k, v in sorted(phases.items(), key=lambda kv: -kv[1]):
        row(k, v)
        top += v
    print(f"  {'host_other (rest of step)':28s} {tot - top:8.2f} s  "
          f"(TOTAL step {tot:.2f} s)")


if __name__ == "__main__":
    main()
