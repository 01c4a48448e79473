#!/usr/bin/env python3
"""End-to-end benchmark for fish-tts-tpu.

Covers the same measurement surface as the reference benchmark script
(RTF across utterance lengths, streaming first-chunk latency, component
breakdown — /root/reference/scripts/benchmark.py), re-expressed around the
engine's built-in metrics registry: the component profile comes from
``FishTTS.get_metrics()`` (prefill/decode/vocoder spans) rather than ad-hoc
stopwatches, and results can be emitted as JSON for dashboards.

Usage:
    python scripts/benchmark.py --tiny            # hermetic CPU run
    python scripts/benchmark.py --model-dir DIR   # real checkpoint
    python scripts/benchmark.py --tiny --json
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
import json
import time
from dataclasses import dataclass, field

SAMPLE_RATE = 44100
WAV_HEADER_BYTES = 44

# Same utterance set as the reference benchmark so RTF numbers stay
# comparable across implementations.
WORKLOADS = (
    ("short", "Hello world!"),
    ("medium", "The quick brown fox jumps over the lazy dog."),
    ("long",
     "In a world where technology advances rapidly, artificial intelligence "
     "has emerged as a transformative force reshaping how we live and work."),
)


@dataclass
class Report:
    """Accumulates benchmark rows; renders a table or JSON."""

    init_s: float = 0.0
    rows: list[dict] = field(default_factory=list)
    streaming: dict = field(default_factory=dict)
    batch: dict = field(default_factory=dict)
    components: dict = field(default_factory=dict)

    def add_row(self, **kw) -> None:
        self.rows.append(kw)

    @property
    def mean_rtf(self) -> float:
        audio = sum(r["audio_s"] for r in self.rows)
        wall = sum(r["wall_s"] for r in self.rows)
        return wall / audio if audio else 0.0

    def render(self) -> str:
        lines = [
            f"init: {self.init_s:.1f}s",
            "",
            f"{'workload':<10}{'chars':>6}{'audio_s':>9}{'wall_s':>8}{'rtf':>7}",
        ]
        for r in self.rows:
            lines.append(
                f"{r['name']:<10}{r['chars']:>6}{r['audio_s']:>9.2f}"
                f"{r['wall_s']:>8.2f}{r['rtf']:>7.3f}"
            )
        lines.append(f"{'mean':<10}{'':>6}{'':>9}{'':>8}{self.mean_rtf:>7.3f}")
        if self.streaming:
            s = self.streaming
            lines += [
                "",
                f"streaming: first chunk {s['ttfa_s']:.3f}s, "
                f"{s['audio_s']:.2f}s audio in {s['wall_s']:.2f}s "
                f"(rtf {s['rtf']:.3f}, {s['chunks']} chunks)",
            ]
        if self.batch:
            b = self.batch
            lines += [
                "",
                f"batched serving: {b['streams']} streams, "
                f"{b['audio_s']:.2f}s total audio in {b['wall_s']:.2f}s "
                f"(aggregate rtf {b['rtf']:.3f}, "
                f"{b['audio_per_wall']:.1f}x realtime aggregate)",
            ]
        if self.components:
            lines.append("")
            lines.append("engine spans (from FishTTS.get_metrics()):")
            for name, ph in self.components.get("phases", {}).items():
                lines.append(
                    f"  {name:<9} {ph['count']:>4}x  mean {ph['mean_ms']:>8.2f} ms"
                    f"  total {ph['total_s']:>7.2f} s"
                )
            lines.append(
                f"  engine throughput: "
                f"{self.components.get('tokens_per_sec', 0):.1f} tok/s"
            )
        return "\n".join(lines)

    def as_json(self) -> str:
        return json.dumps(
            {
                "init_s": round(self.init_s, 2),
                "mean_rtf": round(self.mean_rtf, 4),
                "rows": self.rows,
                "streaming": self.streaming,
                "batch": self.batch,
                "components": self.components,
            }
        )


def wav_seconds(wav: bytes) -> float:
    return (len(wav) - WAV_HEADER_BYTES) / (SAMPLE_RATE * 2)


def build_synth(args):
    if args.tiny:
        from fish_tts_tpu.testing import make_tiny_tts

        return make_tiny_tts(warmup=True)
    from fish_tts_tpu import FishTTS

    return FishTTS(model_dir=args.model_dir, precision=args.precision)


def run(args) -> Report:
    rep = Report()
    t0 = time.perf_counter()
    synth = build_synth(args)
    rep.init_s = time.perf_counter() - t0

    synth.synthesize("Test", max_tokens=32)  # make sure compiles are warm
    synth.metrics.reset()

    max_tokens = 64 if args.tiny else 2048
    for name, text in WORKLOADS:
        if args.tiny:
            # the tiny config's context (128) can't fit the long utterances
            text = text[:40]
        t0 = time.perf_counter()
        wav = synth.synthesize(text, max_tokens=max_tokens)
        wall = time.perf_counter() - t0
        audio = wav_seconds(wav)
        rep.add_row(
            name=name, chars=len(text), audio_s=round(audio, 3),
            wall_s=round(wall, 3),
            rtf=round(wall / audio, 4) if audio else 0.0,
        )

    # component breakdown accumulated by the engine across the runs above
    rep.components = synth.get_metrics()

    # streaming: time-to-first-chunk + sustained RTF on the long utterance
    text = WORKLOADS[-1][1][:40] if args.tiny else WORKLOADS[-1][1]
    ttfa = None
    n_bytes = 0
    n_chunks = 0
    t0 = time.perf_counter()
    for chunk in synth.synthesize_stream(text, max_tokens=max_tokens):
        if ttfa is None:
            ttfa = time.perf_counter() - t0
        n_bytes += len(chunk)
        n_chunks += 1
    wall = time.perf_counter() - t0
    audio = n_bytes / (SAMPLE_RATE * 2)
    rep.streaming = {
        "ttfa_s": round(ttfa or 0.0, 4),
        "audio_s": round(audio, 3),
        "wall_s": round(wall, 3),
        "rtf": round(wall / audio, 4) if audio else 0.0,
        "chunks": n_chunks,
    }

    # batched serving: all workloads decode concurrently in one device
    # program (green-field vs the reference, which is single-stream only)
    texts = [t[:40] if args.tiny else t for _, t in WORKLOADS]
    synth.synthesize_batch(texts, max_tokens=8)  # warm the batched variants
    t0 = time.perf_counter()
    wavs = synth.synthesize_batch(texts, max_tokens=max_tokens)
    wall = time.perf_counter() - t0
    audio = sum(wav_seconds(w) for w in wavs)
    rep.batch = {
        "streams": len(texts),
        "audio_s": round(audio, 3),
        "wall_s": round(wall, 3),
        "rtf": round(wall / audio, 4) if audio else 0.0,
        "audio_per_wall": round(audio / wall, 2) if wall else 0.0,
    }
    return rep


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--model-dir", default=None, help="checkpoint directory")
    ap.add_argument("--precision", default="bf16",
                    choices=["bf16", "fp16", "fp32", "int8"])
    ap.add_argument("--tiny", action="store_true",
                    help="hermetic tiny random-weight model")
    ap.add_argument("--json", action="store_true", help="machine-readable output")
    args = ap.parse_args()

    rep = run(args)
    print(rep.as_json() if args.json else rep.render())


if __name__ == "__main__":
    main()
