#!/usr/bin/env python3
"""Benchmark: decode throughput, RTF, and time-to-first-audio on real hardware.

Prints ONE JSON line:
  {"metric": "semantic_tokens_per_sec", "value": N, "unit": "tok/s",
   "vs_baseline": N/120, ...extras}

Runs the S1-mini-shaped model (random weights — throughput is weight-agnostic)
in the production serving config — weight-only int8 with the fused Pallas
decode kernels — on whatever accelerator JAX sees (--bf16 to opt out).
The reference baseline is ~120 tok/s and RTF ~0.26 on torch.compile CUDA
(/root/reference/README.md:9,71).

TTFA is measured through the real user path: a FishTTS instance (S1-mini
LM + full-size vocoder, synthetic tokenizer) driving ``synthesize_stream``,
reporting the p50 wall time from call to first PCM bytes on the host.

Usage:  python bench.py [--tiny] [--frames N] [--no-ttfa] [--bf16] [--approx]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

AUDIO_TOKENS_PER_SEC = 44100 / 2048  # ≈21.53, reference vocoder.py:854,871-872


def _last_tpu_bench() -> dict | None:
    """Newest recorded accelerator bench (BENCH_r*.json in the repo root),
    condensed.  Used only on CPU device-fallback so the JSON line still
    points at real TPU numbers when the tunneled chip is down at bench time
    (it has been unreachable for multi-hour stretches — PERFORMANCE.md)."""
    import pathlib
    import re

    best = None
    for f in pathlib.Path(__file__).parent.glob("BENCH_r*.json"):
        m = re.match(r"BENCH_r(\d+)\.json", f.name)
        if not m:
            continue
        try:
            parsed = json.loads(f.read_text()).get("parsed") or {}
        except Exception:
            continue
        if "tpu" not in str(parsed.get("device", "")).lower():
            continue
        if best is None or int(m.group(1)) > best[0]:
            best = (int(m.group(1)), f.name, parsed)
    if best is None:
        return None
    keep = ("metric", "value", "unit", "rtf", "rtf_e2e", "ttfa_ms",
            "aggregate_tok_per_sec_b8", "device", "precision")
    out = {k: best[2][k] for k in keep if k in best[2]}
    out["source"] = best[1]
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="tiny config (CI/CPU)")
    ap.add_argument("--frames", type=int, default=200, help="frames to time")
    ap.add_argument("--no-ttfa", action="store_true", help="skip vocoder/TTFA")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 weights (default is weight-only int8 + fused "
                         "Pallas decode kernels, the production serving config)")
    ap.add_argument("--approx", action="store_true",
                    help="approximate top-k candidate search (opt-in)")
    ap.add_argument("--topk", type=int, default=None,
                    help="top-k truncation for the slow-token sampler")
    ap.add_argument("--batch", type=int, default=1,
                    help="decode N concurrent streams (XLA path; aggregate tok/s)")
    ap.add_argument("--aggregate-batch", type=int, default=8,
                    help="also measure aggregate throughput at this batch "
                         "size (0 to skip; only when --batch is 1)")
    ap.add_argument("--model-dir", default=None,
                    help="real checkpoint dir: throughput AND fidelity are "
                         "measured on real weights (audio RMS lands in the "
                         "JSON); default is random weights (throughput only)")
    ap.add_argument("--budget", type=float,
                    default=float(__import__("os").environ.get(
                        "FISH_TTS_BENCH_BUDGET", 1800.0)),
                    help="wall-clock seconds after which optional stages "
                         "(aggregate batch, TTFA/e2e) are skipped so the "
                         "JSON line always lands; full runs take ~6-8 min "
                         "with a warm compile cache")
    args = ap.parse_args()
    # int8 + fused kernels is the serving configuration and the bench default;
    # --bf16 opts out (tiny/CPU runs are fp32 and never use int8)
    args.int8 = not args.bf16 and not args.tiny and not args.cpu
    t_start = time.perf_counter()

    def over_budget(stage: str) -> bool:
        el = time.perf_counter() - t_start
        if el > args.budget:
            print(f"# skipping {stage}: {el:.0f}s elapsed > --budget "
                  f"{args.budget:.0f}s (platform compile/init was slow; "
                  "rerun with a warm cache for the full line)",
                  file=sys.stderr)
            return True
        return False

    device_fallback = False
    if __import__("os").environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        args.cpu = True
        args.int8 = False
    if not args.cpu:
        # The tunneled TPU backend can be DOWN for hours at a stretch; a bare
        # jax.devices() then hangs ~20 min before raising, and the bench would
        # produce no JSON line at all.  Probe backend init in a bounded
        # subprocess first and fall back to CPU (flagged) if it is unreachable.
        import os
        import subprocess

        probe_timeout = max(60.0, min(args.budget * 0.5, 420.0))
        try:
            probe = subprocess.run(
                [sys.executable, "-c",
                 "import jax; d = jax.devices(); "
                 "print(d[0].platform, flush=True)"],
                capture_output=True, text=True, timeout=probe_timeout,
                env={k: v for k, v in os.environ.items()
                     if k != "JAX_PLATFORMS"},
            )
            ok = probe.returncode == 0 and "cpu" not in probe.stdout.lower()
        except subprocess.TimeoutExpired:
            ok = False
        if not ok:
            print("# accelerator backend unavailable (probe failed within "
                  f"{probe_timeout:.0f}s) -- falling back to CPU; numbers "
                  "below are NOT TPU numbers", file=sys.stderr)
            device_fallback = True
            args.cpu = True
            args.int8 = False
            # keep the CPU run bounded: fewer timed frames, skip the
            # aggregate-batch and TTFA stages (meaningless off-accelerator)
            args.frames = min(args.frames, 16)
            args.aggregate_batch = 0
            args.no_ttfa = True

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from fish_tts_tpu.config import (
        S1_MINI_CONFIG,
        TINY_CONFIG,
        TINY_VOCODER_CONFIG,
        VocoderConfig,
    )
    from fish_tts_tpu.engine import decode as decode_mod
    from fish_tts_tpu.models import dual_ar
    from fish_tts_tpu.models.dual_ar import TokenIds
    from fish_tts_tpu.utils.compile_cache import setup_compile_cache

    setup_compile_cache()

    def force(x):
        """Synchronize by fetching to host — on the axon tunnel platform
        block_until_ready returns before execution finishes; only a real
        device->host read is a true barrier."""
        return jax.tree_util.tree_map(np.asarray, x)

    def free(*pytrees):
        """Explicitly delete device buffers.  Round 4 lost both serving
        benches to RESOURCE_EXHAUSTED because every earlier stage's decode
        state (B=1, 8 AND 16 KV caches: ~0.25/2/4 GB each) stayed alive
        while the 16-slot serving pool allocated — freeing is load-bearing,
        not hygiene."""
        for tree in pytrees:
            for leaf in jax.tree_util.tree_leaves(tree):
                if isinstance(leaf, jax.Array):
                    try:
                        leaf.delete()
                    except Exception:  # noqa: BLE001 — already donated/dead
                        pass

    if args.tiny:
        cfg = TINY_CONFIG
        ids = TokenIds(semantic_begin=400, semantic_end=447, im_end=5)
        dtype = jnp.float32
        vcfg = TINY_VOCODER_CONFIG
    else:
        cfg = S1_MINI_CONFIG
        # Real tokenizer id layout: specials start after ~151657 ranks.
        ids = TokenIds(semantic_begin=151672, semantic_end=155767, im_end=151661)
        dtype = jnp.bfloat16
        vcfg = VocoderConfig()

    dev = jax.devices()[0]
    print(f"# device: {dev}, config: dim={cfg.dim} layers={cfg.n_layer} "
          f"fast={cfg.n_fast_layer} vocab={cfg.vocab_size} "
          f"precision={'int8' if args.int8 else str(dtype.__name__)}",
          file=sys.stderr)

    # The FIRST program execution of a session pays a platform-side cost
    # that dwarfs everything (same-session probe: 339.1 s then 0.1 s for
    # the identical compiled init program — r4's "304.6 s materialize"
    # mystery).  Pay it here on a trivial op so every timed stage below
    # measures OUR programs, and report it separately.
    t0 = time.perf_counter()
    force(jnp.zeros((8,), jnp.float32) + 1.0)
    first_op_s = time.perf_counter() - t0
    print(f"# platform first-op: {first_op_s:.1f}s", file=sys.stderr)

    # -- init: one jitted program (eager per-op dispatch pays a compile per
    # shape on this platform; a single jit is one compile, and a cached one
    # on warm starts) --------------------------------------------------------
    t0 = time.perf_counter()

    def build_params(key):
        p = dual_ar.init_params(key, cfg, dtype=dtype)
        if args.int8:
            from fish_tts_tpu.utils.quantize import quantize_lm_params

            p = quantize_lm_params(p)
        return p

    # compile (the remote compile service's latency swings 8s-280s between
    # sessions — see PERFORMANCE.md) is timed separately from execution so a
    # code regression in param materialization is distinguishable from
    # platform compile weather.
    real_tts = None
    if args.model_dir:
        # Real weights: the full FishTTS load path (convert/load + cast +
        # quantize) IS the init being measured; its engine params feed the
        # raw-throughput sections below, so speed and fidelity come from the
        # same arrays.
        from fish_tts_tpu.synthesizer import FishTTS

        init_compile_s = 0.0
        init_build_s = init_head_s = None
        real_tts = FishTTS(
            model_dir=args.model_dir,
            precision="int8" if args.int8 else "bf16",
            warmup=False,
        )
        cfg = real_tts._cfg
        tk = real_tts._tokenizer
        ids = TokenIds(semantic_begin=tk.semantic_begin_id,
                       semantic_end=tk.semantic_end_id, im_end=tk.im_end_id)
        params = real_tts._engine.params
        force(jax.tree_util.tree_leaves(params)[0][:1])
        init_materialize_s = time.perf_counter() - t0
    else:
        key0 = jax.random.PRNGKey(0)
        build_c = jax.jit(build_params).lower(key0).compile()
        head_c = None
        if args.int8 and jax.default_backend() == "tpu":
            from fish_tts_tpu.ops import slow_stack

            proto = jax.eval_shape(build_params, key0)
            head_c = (
                jax.jit(lambda p: slow_stack.prepare_head(p, cfg))
                .lower(proto).compile()
            )
        init_compile_s = time.perf_counter() - t0
        # sub-stage attribution (round 4 saw an unexplained 304.6 s
        # materialize; r2 measured 4.2 s for the same jitted build): force
        # each stage so param init, head prep, and the device->host fetch
        # are separately visible in stderr.
        t0 = time.perf_counter()
        params = build_c(key0)
        params_leaf = jax.tree_util.tree_leaves(params)[0]
        force(params_leaf[:1])
        init_build_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        if head_c is not None:
            params = head_c(params)
            force(jax.tree_util.tree_leaves(params)[0][:1])
        init_head_s = time.perf_counter() - t0
        init_materialize_s = init_build_s + init_head_s
        print(f"# init materialize: build {init_build_s:.1f}s + "
              f"head prep {init_head_s:.1f}s", file=sys.stderr)
    rope = dual_ar.make_rope_tables(cfg)
    init_s = init_compile_s + init_materialize_s
    # count model weights only: prepared-kernel layouts ("_slow_head", a
    # padded duplicate of the tied embedding) would overstate by ~30%
    n_params = dual_ar.param_count(
        {k: v for k, v in params.items() if not k.startswith("_")}
    )
    print(f"# init: {init_s:.1f}s = compile {init_compile_s:.1f}s + "
          f"materialize {init_materialize_s:.1f}s ({n_params/1e6:.0f}M params)",
          file=sys.stderr)

    t, p, r = jnp.float32(0.7), jnp.float32(0.8), jnp.float32(1.1)
    T = 64  # prompt bucket
    B0 = max(1, args.batch)
    prompt = np.zeros((B0, 1 + cfg.num_codebooks, T), np.int32)
    prompt[:, 0] = np.random.RandomState(0).randint(0, 1000, (B0, T))
    lengths = jnp.asarray([48] * B0, jnp.int32)
    # -1 = sort-free exact full-vocab top-p (the engine default)
    top_k = args.topk if args.topk is not None else (-1 if not args.tiny else 32)
    if args.approx and top_k <= 0:
        top_k = 1024  # approx only applies to a truncated candidate search

    B = max(1, args.batch)

    # Cache allocation mirrors the engine: generate_long/serving allocate
    # the _cache_bucket of the request extent, not cfg.max_seq_len (decode
    # cost is ~linear in the ALLOCATED length — decode.resize_cache).  This
    # workload: 48-token prompt + args.frames decode + dispatch overshoot.
    from fish_tts_tpu.engine.generate import _cache_bucket

    state_alloc = _cache_bucket(48 + args.frames + 2 * 100, cfg.max_seq_len)

    def fresh_state():
        return decode_mod.init_state(
            params, cfg, batch=B, max_seq_len=state_alloc
        )

    # -- compile/warmup ----------------------------------------------------
    CHUNK = 20
    t0 = time.perf_counter()
    state = fresh_state()
    kv_b = min(cfg.max_seq_len, 256)  # EngineConfig.kv_bucket_step default
    # fused Pallas kernels: gated on the *actual* backend, not the CLI flags —
    # off-TPU they would run in interpret mode, orders of magnitude slower,
    # and the numbers would be meaningless.  Both kernels handle B <= 8
    # (group-folded batched attention; weight streaming amortizes across
    # streams inside the kernel).
    fast_k = args.int8 and jax.default_backend() == "tpu"
    if args.int8 and not fast_k:
        print("# WARNING: int8 requested off-TPU; Pallas kernels disabled "
              "(XLA fallback path timed instead)", file=sys.stderr)
    state, first = decode_mod.prefill(
        params, rope, state, jnp.asarray(prompt), lengths,
        jax.random.PRNGKey(1), t, p, r, cfg=cfg, ids=ids, top_k=top_k,
        approx=args.approx, kv_bucket=0,
    )
    kernel_fallback = False
    try:
        state, frames, _ = decode_mod.decode_chunk(
            params, rope, state, jax.random.PRNGKey(2), t, p, r,
            cfg=cfg, ids=ids, num_frames=CHUNK, top_k=top_k,
            approx=args.approx, kv_bucket=kv_b, fast_kernel=fast_k,
        )
        force(frames)
    except Exception as e:  # noqa: BLE001 — never lose the JSON line to a
        # kernel lowering failure; fall back to the XLA decode path so the
        # bench still reports (flagged via kernel_fallback)
        if not fast_k:
            raise
        print(f"# WARNING: Pallas kernel path failed "
              f"({type(e).__name__}: {str(e)[:200]}); XLA fallback timed",
              file=sys.stderr)
        fast_k = False
        kernel_fallback = True
        # rebuild from scratch: decode_chunk DONATES `state`, so a RUNTIME
        # (post-donation) kernel failure leaves deleted buffers — reusing
        # them would crash this very fallback
        state = fresh_state()
        state, first = decode_mod.prefill(
            params, rope, state, jnp.asarray(prompt), lengths,
            jax.random.PRNGKey(1), t, p, r, cfg=cfg, ids=ids, top_k=top_k,
            approx=args.approx, kv_bucket=0,
        )
        state, frames, _ = decode_mod.decode_chunk(
            params, rope, state, jax.random.PRNGKey(2), t, p, r,
            cfg=cfg, ids=ids, num_frames=CHUNK, top_k=top_k,
            approx=args.approx, kv_bucket=kv_b, fast_kernel=False,
        )
        force(frames)
    compile_s = time.perf_counter() - t0
    print(f"# prefill+chunk compile+run: {compile_s:.1f}s", file=sys.stderr)

    # -- throughput --------------------------------------------------------
    n_chunks = max(1, args.frames // CHUNK)
    # steady-state: time chunks only (prompt already prefilled); the kv
    # bucket grows with the live prefix exactly as the engine grows it
    # (decode_chunk requires max(pos)+num_frames <= kv_bucket).  Two timed
    # passes, best taken: the tunneled platform has occasional multi-ms
    # dispatch hiccups that are queue noise, not decode speed.
    step = 256  # EngineConfig.kv_bucket_step default
    pass_times = []
    for rep in range(2):
        t0 = time.perf_counter()
        for i in range(n_chunks):
            need = 48 + CHUNK * (i + 2)
            kv_i = min(cfg.max_seq_len, -(-need // step) * step)
            state, frames, _ = decode_mod.decode_chunk(
                params, rope, state, jax.random.PRNGKey(3 + i), t, p, r,
                cfg=cfg, ids=ids, num_frames=CHUNK, top_k=top_k,
                approx=args.approx,
                kv_bucket=max(kv_b, kv_i), fast_kernel=fast_k,
            )
        force(frames)
        pass_times.append(time.perf_counter() - t0)
        if rep == 0:
            # restart positions so pass 2 matches pass 1, and FORCE the
            # re-prefill so its execution cannot leak into pass 2's timing
            state = fresh_state()
            state, first2 = decode_mod.prefill(
                params, rope, state, jnp.asarray(prompt), lengths,
                jax.random.PRNGKey(1), t, p, r, cfg=cfg, ids=ids, top_k=top_k,
                approx=args.approx, kv_bucket=0,
            )
            force(first2)
    dt = min(pass_times)
    n_frames = n_chunks * CHUNK
    tok_per_sec = n_frames * B / dt  # aggregate across concurrent streams
    rtf = (dt / n_frames) * AUDIO_TOKENS_PER_SEC
    print(f"# decode: {tok_per_sec:.1f} tok/s, RTF={rtf:.4f} "
          f"(passes: {[round(n_frames * B / x, 1) for x in pass_times]})",
          file=sys.stderr)

    # -- prefill latency ---------------------------------------------------
    t0 = time.perf_counter()
    state2 = fresh_state()
    state2, _ = decode_mod.prefill(
        params, rope, state2, jnp.asarray(prompt), lengths,
        jax.random.PRNGKey(9), t, p, r, cfg=cfg, ids=ids, top_k=top_k,
        approx=args.approx, kv_bucket=0,
    )
    force(state2["frame"])
    prefill_ms = (time.perf_counter() - t0) * 1e3

    extras = {
        "rtf": round(rtf, 4),
        "batch": B,
        "prefill_ms": round(prefill_ms, 1),
        "frames_timed": n_frames,
        "compile_s": round(compile_s, 1),
        "init_s": round(init_s, 1),
        "init_compile_s": round(init_compile_s, 1),
        "init_materialize_s": round(init_materialize_s, 1),
        "platform_first_op_s": round(first_op_s, 1),
        **({"init_build_s": round(init_build_s, 1),
            "init_head_s": round(init_head_s, 1)}
           if init_build_s is not None else {}),
        "precision": "int8" if args.int8 else ("fp32" if args.tiny else "bf16"),
        "device": str(dev),
    }
    if kernel_fallback:
        extras["kernel_fallback"] = True
    if device_fallback:
        # accelerator backend was down at bench time; these are CPU numbers.
        # Embed the newest recorded TPU result so the fallback line still
        # carries the last-known-good accelerator numbers for comparison.
        extras["device_fallback"] = True
        last = _last_tpu_bench()
        if last:
            extras["last_tpu_bench"] = last

    try:
        stats = dev.memory_stats()
        if stats and "bytes_in_use" in stats:
            extras["hbm_gb"] = round(stats["bytes_in_use"] / 2**30, 2)
    except Exception:
        pass

    # -- batched-serving aggregate throughput --------------------------------
    if (B == 1 and args.aggregate_batch > 1 and not args.tiny
            and not over_budget("aggregate batch")):
        batches = {args.aggregate_batch, 16} if args.aggregate_batch == 8 \
            else {args.aggregate_batch}
        for Ba in sorted(batches):
            prompt_a = np.zeros((Ba, 1 + cfg.num_codebooks, T), np.int32)
            prompt_a[:, 0] = np.random.RandomState(1).randint(0, 1000, (Ba, T))
            # same allocation the serving pool would hold for this extent
            # (pos reaches 48 + 4 chunks; the pool buckets the live need)
            state_a = decode_mod.init_state(
                params, cfg, batch=Ba,
                max_seq_len=_cache_bucket(48 + CHUNK * 5, cfg.max_seq_len),
            )
            state_a, _ = decode_mod.prefill(
                params, rope, state_a, jnp.asarray(prompt_a),
                jnp.asarray([48] * Ba, jnp.int32),
                jax.random.PRNGKey(11), t, p, r, cfg=cfg, ids=ids,
                top_k=top_k, approx=args.approx, kv_bucket=0,
            )
            # warm (compile) then time; the Pallas kernels run batched
            # (B <= 16), amortizing one weight stream across all streams
            state_a, fr, _ = decode_mod.decode_chunk(
                params, rope, state_a, jax.random.PRNGKey(12), t, p, r,
                cfg=cfg, ids=ids, num_frames=CHUNK, top_k=top_k,
                approx=args.approx, kv_bucket=kv_b, fast_kernel=fast_k,
            )
            force(fr)
            reps_a = 3
            t0 = time.perf_counter()
            for i in range(reps_a):
                state_a, fr, _ = decode_mod.decode_chunk(
                    params, rope, state_a, jax.random.PRNGKey(13 + i),
                    t, p, r,
                    cfg=cfg, ids=ids, num_frames=CHUNK, top_k=top_k,
                    approx=args.approx, kv_bucket=kv_b, fast_kernel=fast_k,
                )
            force(fr)
            agg = CHUNK * reps_a * Ba / (time.perf_counter() - t0)
            extras[f"aggregate_tok_per_sec_b{Ba}"] = round(agg, 1)
            print(f"# batched serving: {agg:.0f} tok/s aggregate at B={Ba}",
                  file=sys.stderr)
            free(state_a, fr)  # B=8/16 KV caches: ~2/4 GB each

    # -- TTFA + end-to-end RTF through the public path ----------------------
    if not args.no_ttfa and not over_budget("TTFA/e2e user path"):
        # the raw-throughput states are dead weight from here on; the
        # user path (engine prefix + serving pool + vocoder) needs the HBM
        free(state, state2, frames, first)
        try:
            extras.update(
                _measure_user_path(args, cfg, vcfg, params, dtype, real_tts)
            )
        except Exception as e:  # noqa: BLE001 — user-path extras are best-effort
            print(f"# user-path bench failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            extras["user_path_failed"] = f"{type(e).__name__}: {e}"[:160]

    result = {
        "metric": "semantic_tokens_per_sec",
        "value": round(tok_per_sec, 1),
        "unit": "tok/s",
        "vs_baseline": round(tok_per_sec / 120.0, 2),
        **extras,
    }
    print(json.dumps(result))

    # epilogue: flag published claims that this run can no longer back up
    # (round 4 shipped a README advertising 530 tok/s over a 339 capture)
    if not device_fallback and not args.tiny:
        try:
            import pathlib

            sys.path.insert(0, str(pathlib.Path(__file__).parent / "scripts"))
            from check_claims import check as _check_claims

            claims_p = pathlib.Path(__file__).parent / "CLAIMS.json"
            if claims_p.exists():
                for d in _check_claims(
                        json.loads(claims_p.read_text()), result, 0.15):
                    print(f"# CLAIMS DRIFT: {d}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — epilogue must never kill the line
            print(f"# claims check failed: {e}", file=sys.stderr)


def _measure_user_path(args, cfg, vcfg, params, dtype, real_tts=None):
    """User-path numbers through the public ``FishTTS`` API:

    - ``ttfa_ms``: p50 time from ``synthesize_stream(text)`` to the first PCM
      bytes on the host — the number the <300 ms target is defined on;
    - ``rtf_e2e``: wall time of a full ``synthesize()`` call divided by the
      seconds of audio it produced (text -> tokens -> prefill -> decode ->
      vocoder -> WAV) — the apples-to-apples comparison against the
      reference's published RTF 0.26 (/root/reference/README.md:9), which is
      end-to-end; the top-level ``rtf`` key is LM decode only;
    - ``vocoder_frames_per_sec``: codec decode throughput on its own.

    The LM params are the benchmarked ones; with ``--model-dir`` the whole
    stack (tokenizer, vocoder, weights) is real and the e2e audio's RMS is
    reported as a fidelity signal; otherwise the vocoder is full-size with
    random weights and the tokenizer synthetic but id-layout-compatible, so
    the timed path is exactly the user path either way.
    """
    import tempfile
    from pathlib import Path

    import jax
    import jax.numpy as jnp

    from fish_tts_tpu.models import vocoder as voc
    from fish_tts_tpu.models.tokenizer import (
        FishTokenizer,
        tiny_special_tokens,
        write_tiny_vocab,
    )
    from fish_tts_tpu.synthesizer import FishTTS

    if real_tts is not None:
        tts = real_tts
        # code geometry must come from the loaded checkpoint's codec, not
        # the CLI-default VocoderConfig (wrong residual count would index
        # out of range or benchmark the wrong shape)
        vcfg = real_tts._vocoder_cfg
    else:
        d = Path(tempfile.mkdtemp(prefix="fish_tts_bench_"))
        write_tiny_vocab(d / "tokenizer.tiktoken")
        tokenizer = FishTokenizer(
            d / "tokenizer.tiktoken", tiny_special_tokens(cfg.codebook_size)
        )

        t0 = time.perf_counter()
        vparams = jax.jit(
            lambda k: voc.init_vocoder_params(k, vcfg, dtype=dtype)
        )(jax.random.PRNGKey(7))
        np.asarray(jax.tree_util.tree_leaves(vparams)[0]).ravel()[:1]
        print(f"# vocoder init: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)

        tts = FishTTS(
            precision="fp32" if args.tiny else "bf16",
            warmup=False,
            _testing_bundle=(cfg, params, tokenizer, vcfg, vparams),
        )

    text = "Benchmark time to first audio."

    def first_chunk_latency() -> float:
        t0 = time.perf_counter()
        stream = tts.synthesize_stream(text, max_tokens=16)
        chunk = next(iter(stream))
        dt = time.perf_counter() - t0
        stream.close()
        assert len(chunk) > 0
        return dt

    warm = first_chunk_latency()  # compile pass
    print(f"# ttfa compile+run: {warm:.1f}s", file=sys.stderr)
    lat = sorted(first_chunk_latency() for _ in range(5))
    p50 = lat[len(lat) // 2]
    out = {"ttfa_ms": round(p50 * 1e3, 1), "ttfa_max_ms": round(lat[-1] * 1e3, 1)}

    # -- vocoder throughput (codec decode alone) ----------------------------
    frames = 320 if not args.tiny else 20
    codes = np.random.RandomState(0).randint(
        0, vcfg.residual_codebook_size, (vcfg.num_codebooks, frames)
    ).astype(np.int64)
    tts._decode_codes(codes)  # compile
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        tts._decode_codes(codes)
    voc_fps = frames * reps / (time.perf_counter() - t0)
    out["vocoder_frames_per_sec"] = round(voc_fps, 1)
    print(f"# vocoder: {voc_fps:.0f} frames/s "
          f"(RTF {AUDIO_TOKENS_PER_SEC / voc_fps:.4f})", file=sys.stderr)

    # -- end-to-end RTF: full synthesize() wall time / audio seconds --------
    if args.tiny:
        n_tok, text = 16, "Hello."  # byte-level tiny tokenizer, 128-token ctx
    else:
        n_tok = 200
        text = "An end to end benchmark sentence for real time factor measurement."
    tts.synthesize(text, max_tokens=n_tok)  # compile pass
    rtfs = []
    for _ in range(3):  # median of 3: tunnel dispatch noise swings ~10%
        t0 = time.perf_counter()
        wav = tts.synthesize(text, max_tokens=n_tok)
        wall = time.perf_counter() - t0
        audio_sec = (len(wav) - 44) / 2 / tts.sample_rate  # 16-bit mono WAV
        rtfs.append(wall / audio_sec)
    rtfs.sort()
    out["rtf_e2e"] = round(rtfs[1], 4)
    print(f"# e2e: {audio_sec:.2f}s audio, RTF p50 {rtfs[1]:.4f} "
          f"(runs {[round(r, 4) for r in rtfs]})", file=sys.stderr)

    # -- continuous batching through the slot scheduler ---------------------
    # failures land as machine-visible serve_failed/serve_audio_failed JSON
    # fields (round 4 lost both benches to RESOURCE_EXHAUSTED with only a
    # stderr line to show for it)
    try:
        out.update(_measure_serving(tts, tiny=args.tiny))
    except Exception as e:  # noqa: BLE001 — serving extras are best-effort
        print(f"# serve bench failed: {type(e).__name__}: {e}",
              file=sys.stderr)
        out["serve_failed"] = f"{type(e).__name__}: {e}"[:160]
    try:
        out.update(_measure_audio_serving(tts, tiny=args.tiny))
    except Exception as e:  # noqa: BLE001 — serving extras are best-effort
        print(f"# audio serve bench failed: {type(e).__name__}: {e}",
              file=sys.stderr)
        out["serve_audio_failed"] = f"{type(e).__name__}: {e}"[:160]
    if real_tts is not None:
        # fidelity signal on real weights: non-silent, finite audio
        pcm = np.frombuffer(wav[44:], dtype=np.int16).astype(np.float32)
        pcm /= 32767.0
        rms = float(np.sqrt(np.mean(pcm**2))) if pcm.size else 0.0
        out["audio_rms"] = round(rms, 4)
        out["audio_finite"] = bool(np.isfinite(pcm).all())
        print(f"# fidelity: rms={rms:.4f} finite={out['audio_finite']}",
              file=sys.stderr)
    return out


def _measure_serving(tts, tiny: bool) -> dict:
    """Continuous-batching throughput: staggered requests through the
    ``ContinuousBatcher`` slot pool (LM decode only; frames emitted per
    wall-clock second across all requests)."""
    from fish_tts_tpu.engine.serve import ContinuousBatcher

    # 16 slots: B=16 decode clears ~2.4k raw tok/s vs ~2.2k at B=8, and the
    # group-admission program amortizes a whole wave into one dispatch —
    # measured 1.87k tok/s at 16 slots vs 1.57k at 8 on this workload
    # (each stream still decodes ~7x realtime)
    slots = 4 if tiny else 16
    n_req = 2 * slots
    # ~9 s utterances: long enough that per-wave admission and final-chunk
    # overshoot amortize the way real serving traffic does
    budget = 16 if tiny else 200
    srv = ContinuousBatcher(tts._engine, slots=slots)
    # warmup pass: compile admission + pool-decode shapes
    srv.submit("warm up the pool", max_new_tokens=4)
    srv.submit("warm two", max_new_tokens=4)
    for _ in srv.run():
        pass

    def _pass() -> tuple[float, list[float]]:
        t0 = time.perf_counter()
        pending = n_req
        frames = 0
        # TTFA under load: probe requests submitted while every slot is busy
        # — the <300 ms target is otherwise only ever measured on an idle
        # chip.  t_submit is stamped per probe; the latency is to its FIRST
        # codes event.
        probe_at = {n_req // 2, n_req // 2 - 1, n_req // 2 + 1}
        probe_submit: dict[int, float] = {}
        probe_first: list[float] = []
        for _ in range(slots):  # first wave
            srv.submit("a serving benchmark request", max_new_tokens=budget)
            pending -= 1
        while srv.busy or pending:
            for ev in srv.step():
                if ev.request_id in probe_submit and ev.codes.shape[1] > 0:
                    probe_first.append(
                        time.perf_counter() - probe_submit.pop(ev.request_id))
                frames += ev.codes.shape[1]
                if ev.done and pending:  # staggered: refill as slots free
                    rid = srv.submit("a serving benchmark request",
                                     max_new_tokens=budget)
                    if pending in probe_at:
                        probe_submit[rid] = time.perf_counter()
                    pending -= 1
        return frames / (time.perf_counter() - t0), probe_first

    # two timed passes, best taken — same policy (and same reason) as the
    # decode stage: the tunneled platform has multi-ms dispatch hiccups and
    # occasional multi-second stalls that are queue noise, not serving speed
    results = [_pass() for _ in range(2)]
    agg, probe_first = max(results, key=lambda x: x[0])
    out = {"serve_tok_per_sec": round(agg, 1), "serve_slots": slots,
           "serve_passes": [round(a, 1) for a, _ in results]}
    if probe_first:
        probe_first.sort()
        out["ttfa_busy_ms"] = round(
            probe_first[len(probe_first) // 2] * 1e3, 1)
        out["ttfa_busy_max_ms"] = round(probe_first[-1] * 1e3, 1)
    print(f"# continuous batching: {agg:.0f} tok/s aggregate "
          f"({n_req} staggered requests x {budget} tok over {slots} slots), "
          f"busy-TTFA p50 {out.get('ttfa_busy_ms', 'n/a')} ms "
          f"(passes: {out['serve_passes']})",
          file=sys.stderr)
    return out


def _measure_audio_serving(tts, tiny: bool) -> dict:
    """FULL audio serving: the same staggered workload as
    ``_measure_serving`` but through ``FishTTS.serve`` — LM continuous
    batching plus the slot-pool batched stateful vocoder, PCM out.  The
    honest end-to-end serving number (codes AND audio on one chip)."""
    slots = 4 if tiny else 16
    n_req = 2 * slots
    budget = 16 if tiny else 200
    sess = tts.serve(slots=slots)
    for _ in range(2):  # compile admission/pool-decode/pool-vocoder shapes
        sess.submit("warm up the pool", max_new_tokens=4 if tiny else 24)
    for _ in sess.run():
        pass

    def _pass() -> tuple[float, float, list[float]]:
        t0 = time.perf_counter()
        pending = n_req
        frames = 0
        pcm_bytes = 0
        # audio TTFA under load: submit-to-first-PCM for probes admitted
        # while the pool is saturated (the user-facing busy-latency number)
        probe_at = {n_req // 2, n_req // 2 - 1, n_req // 2 + 1}
        probe_submit: dict[int, float] = {}
        probe_first: list[float] = []
        for _ in range(slots):
            sess.submit("a serving benchmark request", max_new_tokens=budget)
            pending -= 1
        while sess.busy or pending:
            for ev in sess.step():
                if ev.request_id in probe_submit and len(ev.pcm) > 0:
                    probe_first.append(
                        time.perf_counter() - probe_submit.pop(ev.request_id))
                pcm_bytes += len(ev.pcm)
                if ev.done:
                    frames += ev.frames_total
                    if pending:
                        rid = sess.submit("a serving benchmark request",
                                          max_new_tokens=budget)
                        if pending in probe_at:
                            probe_submit[rid] = time.perf_counter()
                        pending -= 1
        wall = time.perf_counter() - t0
        return frames / wall, pcm_bytes / 2 / tts.sample_rate / wall, \
            probe_first

    # two timed passes, best taken (same policy/reason as the decode and
    # LM-serving stages: tunnel queue noise, not serving speed)
    results = [_pass() for _ in range(2)]
    agg, x_rt, probe_first = max(results, key=lambda x: x[0])
    out = {"serve_audio_tok_per_sec": round(agg, 1),
           "serve_audio_x_realtime": round(x_rt, 1),
           "serve_audio_passes": [round(a, 1) for a, _, _ in results]}
    if probe_first:
        probe_first.sort()
        out["ttfa_audio_busy_ms"] = round(
            probe_first[len(probe_first) // 2] * 1e3, 1)
    print(f"# audio serving: {agg:.0f} tok/s aggregate, x{x_rt:.1f} realtime "
          f"({n_req} staggered requests x {budget} tok over {slots} slots, "
          f"PCM out), busy-TTFA p50 {out.get('ttfa_audio_busy_ms', 'n/a')} ms "
          f"(passes: {out['serve_audio_passes']})",
          file=sys.stderr)
    return out


if __name__ == "__main__":
    main()
