"""Real-checkpoint readiness: conversion + fidelity gate.

These tests only run when a real openaudio-s1-mini checkpoint directory is
available (env ``FISH_TTS_MODEL_DIR`` or the default HF cache path the
synthesizer uses).  No checkpoint ships in CI, so the suite normally skips —
but the FIRST machine with real weights gets an automatic validation that:

1. ``model.pth``/``codec.pth`` convert with full key coverage
   (``CoverageReport.ok`` — reference key transforms at llama.py:477-498,
   synthesizer.py:272-284);
2. the public path synthesizes one utterance of real, non-silent audio at a
   sane RMS (not NaN, not clipped flatline).

Run with:  FISH_TTS_MODEL_DIR=/path/to/openaudio-s1-mini pytest
tests/test_real_checkpoint.py -v
"""

import os
from pathlib import Path

import numpy as np
import pytest


def _model_dir() -> Path | None:
    env = os.environ.get("FISH_TTS_MODEL_DIR")
    if env and Path(env).is_dir():
        return Path(env)
    default = (
        Path.home() / ".cache" / "fish-tts-tpu" / "models"
        / "fishaudio--openaudio-s1-mini"
    )
    if default.is_dir():
        return default
    return None


MODEL_DIR = _model_dir()

pytestmark = pytest.mark.skipif(
    MODEL_DIR is None
    or not (
        (MODEL_DIR / "model.pth").exists()
        or (MODEL_DIR / "lm.safetensors").exists()
    ),
    reason="no real checkpoint (set FISH_TTS_MODEL_DIR)",
)


def test_conversion_coverage(tmp_path):
    """Every checkpoint key is consumed or expected-dropped."""
    from fish_tts_tpu.utils.checkpoint import convert_checkpoint_dir

    if not (MODEL_DIR / "model.pth").exists():
        pytest.skip("checkpoint already in native format")
    reports = convert_checkpoint_dir(MODEL_DIR, tmp_path / "native")
    for name, rep in reports.items():
        assert rep.ok, f"[{name}] {rep.summary()}"


@pytest.fixture(scope="module")
def real_tts():
    from fish_tts_tpu.synthesizer import FishTTS

    return FishTTS(model_dir=MODEL_DIR, precision="int8", warmup=False)


def test_real_config_shapes(real_tts):
    """config.json matches the S1-mini shape contract the kernels assume."""
    cfg = real_tts._cfg
    assert cfg.dim == 1024 and cfg.n_layer == 28
    assert cfg.num_codebooks == 10 and cfg.codebook_size == 4096
    assert real_tts._tokenizer.semantic_begin_id > 0


def test_real_synthesis_nonsilent(real_tts):
    """One second of synthesized audio is real sound: finite, non-silent,
    not a flatline, sane RMS for speech (loose bounds — the gate is
    'fundamentally broken vs plausibly working', not audio quality)."""
    wav = real_tts.synthesize("Hello, this is a test.", max_tokens=120)
    assert wav[:4] == b"RIFF"
    pcm = np.frombuffer(wav[44:], dtype=np.int16).astype(np.float32) / 32767.0
    assert pcm.size >= real_tts._vocoder_cfg.frame_length * 5
    assert np.isfinite(pcm).all()
    rms = float(np.sqrt(np.mean(pcm**2)))
    assert 1e-3 < rms < 0.9, f"implausible RMS {rms}"
    # more than one distinct sample value per 100 (a stuck vocoder emits
    # near-constant output)
    assert np.unique(np.round(pcm, 3)).size > pcm.size / 100


def test_real_voice_profile_roundtrip(real_tts):
    """The shipped gura profile conditions generation without error."""
    from fish_tts_tpu.synthesizer import VoiceProfile

    prof = VoiceProfile.load("/root/reference/gura_voice.npy", text="reference")
    real_tts.set_references([prof])
    try:
        wav = real_tts.synthesize("Cloned voice check.", max_tokens=80)
        assert len(wav) > 44
    finally:
        real_tts.clear_references()
