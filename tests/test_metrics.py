"""Metrics wiring: prefill/decode/vocoder spans recorded on every call."""

import numpy as np

from fish_tts_tpu.testing import make_tiny_tts
from fish_tts_tpu.utils.profiling import Metrics, hbm_bytes_in_use


def test_metrics_record_spans_and_tokens():
    tts = make_tiny_tts()
    tts.metrics.reset()
    wav = tts.synthesize("measure me", max_tokens=24)
    assert wav[:4] == b"RIFF"
    s = tts.get_metrics()
    assert s["tokens"] > 0
    assert s["audio_s"] > 0
    assert "prefill" in s["phases"] and s["phases"]["prefill"]["count"] == 1
    assert "decode" in s["phases"] and s["phases"]["decode"]["count"] >= 1
    assert "vocoder" in s["phases"] and s["phases"]["vocoder"]["count"] >= 1
    assert s["tokens_per_sec"] > 0
    assert s["rtf"] > 0


def test_metrics_reset_and_streaming_spans():
    tts = make_tiny_tts()
    tts.metrics.reset()
    chunks = list(tts.synthesize_stream("stream", max_tokens=24))
    assert chunks
    s = tts.get_metrics()
    assert s["phases"]["vocoder"]["count"] >= 1
    tts.metrics.reset()
    assert tts.get_metrics()["tokens"] == 0


def test_span_accumulates():
    m = Metrics()
    with m.span("x"):
        pass
    with m.span("x"):
        pass
    assert m.phases["x"].count == 2
    assert hbm_bytes_in_use() >= 0
