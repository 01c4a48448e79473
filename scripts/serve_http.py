"""Streaming TTS HTTP server over the continuous-batching engine.

    python scripts/serve_http.py --model-dir /path/to/openaudio-s1-mini \
        --slots 16 --port 8080

    curl -N -X POST localhost:8080/synthesize \
        -d '{"text": "hello world", "max_new_tokens": 400}' \
        -o out.pcm          # raw s16le mono; sample rate in X-Sample-Rate
    curl localhost:8080/stats
    curl -X DELETE localhost:8080/requests/3

Requests join the running decode pool mid-flight (one batched LM program +
one pool vocoder program per round, engine/serve.py); PCM streams as it is
decoded.  The reference has no serving surface at all — its public API stops
at the Python singleton (reference fish_tts/__init__.py:34-37).
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

try:
    import fish_tts_tpu  # noqa: F401
except ModuleNotFoundError:
    _sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import logging


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--slots", type=int, default=16)
    ap.add_argument("--max-queue", type=int, default=64)
    ap.add_argument("--precision", default="int8",
                    choices=("int8", "bf16", "fp32"))
    ap.add_argument("--platform", default=None,
                    help="force a JAX platform (e.g. 'cpu'); needed because "
                         "JAX_PLATFORMS alone is not honored once a TPU "
                         "plugin is installed")
    ap.add_argument("--no-warmup", action="store_true",
                    help="skip bucket-precompile warmup (first requests "
                         "compile instead)")
    ap.add_argument("--drain-timeout", type=float, default=30.0,
                    help="seconds to finish in-flight requests on shutdown")
    ap.add_argument("--vocoder-device-index", type=int, default=None,
                    help="second chip for the disaggregated pool vocoder")
    ap.add_argument("--voices", default=None,
                    help="directory of <name>.npy voice profiles (optional "
                         "<name>.txt transcripts) served as per-request "
                         "voices via the JSON 'voice' field")
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from fish_tts_tpu import VoiceProfile, get_instance
    from fish_tts_tpu.serving.http import make_server

    # fail fast on a bad device index — BEFORE the (minutes-long) model
    # load/warmup would otherwise run just to die on jax.devices()[i]
    if args.vocoder_device_index is not None:
        n_dev = len(jax.devices())
        if not 0 <= args.vocoder_device_index < n_dev:
            ap.error(
                f"--vocoder-device-index {args.vocoder_device_index} out of "
                f"range: this host has {n_dev} device(s)"
            )

    voices = {}
    if args.voices:
        from pathlib import Path

        for npy in sorted(Path(args.voices).glob("*.npy")):
            txt = npy.with_suffix(".txt")
            text = txt.read_text().strip() if txt.exists() else ""
            voices[npy.stem] = VoiceProfile.load(npy, text=text)
        logging.info("loaded %d voices: %s", len(voices), sorted(voices))

    tts = get_instance(model_dir=args.model_dir, precision=args.precision,
                       device=args.platform or "tpu",
                       warmup=not args.no_warmup)
    vdev = (jax.devices()[args.vocoder_device_index]
            if args.vocoder_device_index is not None else None)
    srv, driver = make_server(
        tts, host=args.host, port=args.port, slots=args.slots,
        max_queue=args.max_queue, vocoder_device=vdev, voices=voices,
    )
    logging.info("serving on http://%s:%d (slots=%d, max_queue=%d)",
                 args.host, args.port, args.slots, args.max_queue)

    # SIGTERM (the orchestrator's stop signal) drains gracefully: stop
    # accepting, finish in-flight requests (bounded), then exit.  Without
    # this a TERM kills the process mid-stream with no cleanup at all.
    import signal
    import threading

    def _term(_sig, _frm):
        logging.info("SIGTERM: draining and shutting down")
        threading.Thread(target=srv.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _term)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        clean = driver.close(drain=True, timeout=args.drain_timeout)
        if clean:
            logging.info("drained cleanly")
        else:
            logging.warning("exited with truncated in-flight streams "
                            "(drain exceeded --drain-timeout %.0fs)",
                            args.drain_timeout)
        srv.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
