"""Audio utility tests: the numpy FFT-resample fallback must be
bit-equivalent to scipy.signal.resample (reference _read_wav resamples with
scipy, synthesizer.py:613-631) — otherwise reference codes would depend on
which host encoded them."""

import io
import wave

import numpy as np
import pytest

from fish_tts_tpu.utils.audio import _fft_resample, read_wav, resample, to_wav_bytes

scipy_signal = pytest.importorskip("scipy.signal")


@pytest.mark.parametrize("n", [1000, 1001, 2047, 48000])
@pytest.mark.parametrize("num", [441, 999, 1000, 1600, 2048, 44100])
def test_fft_resample_matches_scipy(n, num):
    """Even/odd lengths in every up/down combination, including the
    Nyquist-bin split (upsampling from even n) and fold (downsampling to
    even num) that a naive truncate-or-pad implementation gets wrong."""
    x = np.random.RandomState(n + num).standard_normal(n)
    ref = scipy_signal.resample(x, num).astype(np.float32)
    got = _fft_resample(x.astype(np.float64), num)
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5)


def test_resample_same_rate_is_identity():
    x = np.random.RandomState(0).standard_normal(256).astype(np.float32)
    np.testing.assert_array_equal(resample(x, 44100, 44100), x)


def test_read_wav_resamples_to_target():
    sr_in, secs = 22050, 0.25
    t = np.arange(int(sr_in * secs)) / sr_in
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr_in)
        wf.writeframes((x * 32767).astype(np.int16).tobytes())
    y = read_wav(buf.getvalue(), target_sr=44100)
    assert y.dtype == np.float32
    assert abs(len(y) - int(len(x) * 2)) <= 1
    # energy preserved through the resample (same dominant tone)
    assert 0.3 < np.sqrt((y ** 2).mean()) / np.sqrt((x ** 2).mean()) < 1.3


def test_wav_bytes_roundtrip():
    x = np.clip(np.random.RandomState(1).standard_normal(1024) * 0.1, -1, 1)
    wav = to_wav_bytes(x.astype(np.float32), 44100)
    y = read_wav(wav, target_sr=44100)
    np.testing.assert_allclose(y, x.astype(np.float32), atol=1.5 / 32768)
