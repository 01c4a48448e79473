"""Profiling and metrics: per-phase timers, throughput/RTF/TTFA counters.

Replaces the reference's manual ``time.perf_counter`` +
``torch.cuda.synchronize`` spans (scripts/benchmark.py:114-171) with a small
timer registry plus optional ``jax.profiler`` traces.  Wired into the engine:
``GenerationEngine.metrics`` records prefill/decode spans and token counts on
every generate call, ``FishTTS`` adds vocoder spans and exposes
``get_metrics()`` (with HBM usage — the analog of the reference's VRAM
logging, synthesizer.py:184-186).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from dataclasses import dataclass, field

# default S1-mini codec rate (reference vocoder.py:854,871-872); a loaded
# vocoder config overrides per-instance via Metrics.audio_tokens_per_sec
AUDIO_TOKENS_PER_SEC = 44100 / 2048


@dataclass
class PhaseStats:
    total_s: float = 0.0
    count: int = 0

    @property
    def mean_s(self) -> float:
        return self.total_s / self.count if self.count else 0.0


@dataclass
class Metrics:
    """Per-process metrics registry.

    Interpretation under pipelined dispatch: the engine dispatches chunk
    k+1 to the device BEFORE forcing chunk k's outputs, so the
    "prefill"/"decode" spans time the *host-visible fetch wait* for that
    phase's outputs — wall-clock the caller actually spent — not isolated
    device compute (each span absorbs whatever overlapped device work was
    still in flight).  That is the right numerator for throughput/RTF;
    for per-component device timings use ``scripts/profile_decode.py`` /
    ``profile_batch.py`` or a ``device_trace``.
    """

    phases: dict[str, PhaseStats] = field(
        default_factory=lambda: defaultdict(PhaseStats)
    )
    tokens_generated: int = 0
    audio_seconds: float = 0.0
    # frames/s of the codec in use: set from the loaded VocoderConfig
    # (sample_rate / frame_length) so RTF/audio_s stay correct for
    # non-default codec wirings; defaults to the S1-mini rate
    audio_tokens_per_sec: float = AUDIO_TOKENS_PER_SEC

    @contextlib.contextmanager
    def span(self, name: str):
        """Time a phase (host wall clock).  Device completion is the
        caller's job: fetch the results inside the block (on this platform
        only a device->host read is a true barrier — PERFORMANCE.md), which
        every engine span already does."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            st = self.phases[name]
            st.total_s += time.perf_counter() - t0
            st.count += 1

    def record_tokens(self, n: int) -> None:
        self.tokens_generated += n
        self.audio_seconds += n / self.audio_tokens_per_sec

    @property
    def tokens_per_sec(self) -> float:
        """Engine throughput: generated tokens over the LM time that produced
        them (prefill — which also emits the first chunk — plus decode)."""
        lm_s = sum(
            self.phases[n].total_s for n in ("prefill", "decode")
            if n in self.phases
        )
        return self.tokens_generated / lm_s if lm_s else 0.0

    @property
    def rtf(self) -> float:
        """Real-time factor over all timed phases (lower is better)."""
        total = sum(p.total_s for p in self.phases.values())
        return total / self.audio_seconds if self.audio_seconds else 0.0

    def summary(self) -> dict:
        return {
            "tokens": self.tokens_generated,
            "audio_s": round(self.audio_seconds, 2),
            "tokens_per_sec": round(self.tokens_per_sec, 1),
            "rtf": round(self.rtf, 4),
            "phases": {
                k: {"total_s": round(v.total_s, 3), "count": v.count,
                    "mean_ms": round(v.mean_s * 1e3, 2)}
                for k, v in self.phases.items()
            },
        }

    def reset(self) -> None:
        self.phases.clear()
        self.tokens_generated = 0
        self.audio_seconds = 0.0


def hbm_bytes_in_use() -> int:
    """Bytes allocated on the default device (0 when the backend does not
    report memory stats).  TPU analog of ``torch.cuda.memory_allocated``
    (reference synthesizer.py:184-186)."""
    try:
        import jax

        stats = jax.devices()[0].memory_stats()
        return int(stats.get("bytes_in_use", 0)) if stats else 0
    except Exception:  # pragma: no cover - backend-dependent
        return 0


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
