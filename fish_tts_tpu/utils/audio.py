"""Audio I/O: WAV read/write, resampling, PCM conversion.

Behavior-compatible with the reference's stdlib-wave helpers
(/root/reference/fish_tts/synthesizer.py:613-648): 16-bit mono WAV, float32
in [-1, 1], resample to 44.1 kHz on read.  Resampling uses scipy when
available and falls back to numpy FFT resampling (same algorithm as
``scipy.signal.resample``) so the library has no hard scipy dependency.
"""

from __future__ import annotations

import io
import wave

import numpy as np

DEFAULT_SAMPLE_RATE = 44100


def _fft_resample(x: np.ndarray, num: int) -> np.ndarray:
    """Fourier-method resampling equivalent to ``scipy.signal.resample``,
    including its Nyquist-bin split/fold for even lengths — the fallback must
    produce the same audio as the scipy path, or reference codes would depend
    on which host encoded them."""
    n = len(x)
    X = np.fft.rfft(x)
    Y = np.zeros(num // 2 + 1, dtype=X.dtype)
    m = min(num, n)
    nyq = m // 2 + 1
    Y[:nyq] = X[:nyq]
    if m % 2 == 0:  # the shorter spectrum ends in a real Nyquist bin
        if num < n:  # downsampling: fold the discarded conjugate half in
            Y[m // 2] *= 2.0
        elif num > n:  # upsampling: split the Nyquist bin across +/- freqs
            Y[m // 2] *= 0.5
    y = np.fft.irfft(Y, num)
    return (y * (num / n)).astype(np.float32)


def resample(audio: np.ndarray, sr_in: int, sr_out: int = DEFAULT_SAMPLE_RATE) -> np.ndarray:
    if sr_in == sr_out:
        return audio.astype(np.float32)
    num = int(len(audio) * sr_out / sr_in)
    # both paths run in float64 so hosts with and without scipy round the
    # float32 output identically (the module invariant: reference codes must
    # not depend on which host encoded them)
    x64 = audio.astype(np.float64)
    try:
        from scipy import signal

        return signal.resample(x64, num).astype(np.float32)
    except ImportError:
        return _fft_resample(x64, num)


def read_wav(audio_bytes: bytes, target_sr: int = DEFAULT_SAMPLE_RATE) -> np.ndarray:
    """WAV bytes -> float32 mono array at ``target_sr``
    (reference _read_wav, synthesizer.py:613-631)."""
    with wave.open(io.BytesIO(audio_bytes), "rb") as wf:
        sample_rate = wf.getframerate()
        n_channels = wf.getnchannels()
        sampwidth = wf.getsampwidth()
        data = wf.readframes(wf.getnframes())

    if sampwidth == 2:
        audio = np.frombuffer(data, dtype=np.int16).astype(np.float32) / 32768.0
    elif sampwidth == 4:
        audio = np.frombuffer(data, dtype=np.int32).astype(np.float32) / 2147483648.0
    elif sampwidth == 1:
        audio = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"Unsupported sample width: {sampwidth}")

    if n_channels > 1:
        audio = audio.reshape(-1, n_channels).mean(axis=1)

    return resample(audio, sample_rate, target_sr)


def to_wav_bytes(audio: np.ndarray, sample_rate: int = DEFAULT_SAMPLE_RATE) -> bytes:
    """float audio -> 16-bit mono WAV bytes (reference _to_wav_bytes,
    synthesizer.py:633-648)."""
    audio = np.clip(np.asarray(audio, dtype=np.float32), -1.0, 1.0)
    audio_int16 = (audio * 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(audio_int16.tobytes())
    return buf.getvalue()


def wav_header(sample_rate: int = DEFAULT_SAMPLE_RATE,
               data_size: int | None = None) -> bytes:
    """44-byte 16-bit mono WAV header.  ``data_size=None`` writes the
    0xFFFFFFFF live-stream sentinel sizes (players read to EOF) — prepend
    to raw int16 PCM chunks for a progressively-playable stream; a concrete
    ``data_size`` writes real RIFF sizes for a finished file."""
    import struct

    riff = 0xFFFFFFFF if data_size is None else 36 + data_size
    data = 0xFFFFFFFF if data_size is None else data_size
    return (
        b"RIFF" + struct.pack("<I", riff) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                      sample_rate * 2, 2, 16)
        + b"data" + struct.pack("<I", data)
    )


def streaming_wav_header(sample_rate: int = DEFAULT_SAMPLE_RATE) -> bytes:
    """Unknown-length (live-stream) WAV header; see :func:`wav_header`."""
    return wav_header(sample_rate, None)


def to_pcm_bytes(audio: np.ndarray) -> bytes:
    """float audio -> raw int16 PCM bytes (reference _decode_to_pcm,
    synthesizer.py:591-595 — note: no clipping there; we replicate)."""
    audio_int16 = (np.asarray(audio, dtype=np.float32) * 32767).astype(np.int16)
    return audio_int16.tobytes()


def transcode_to_wav(path, sample_rate: int = DEFAULT_SAMPLE_RATE) -> bytes:
    """Decode an arbitrary audio file to mono 16-bit WAV bytes via ffmpeg.

    Used by the CLI scripts for non-WAV reference audio (the reference CLIs
    shell out to ffmpeg the same way).  Raises RuntimeError with the decoder
    output when ffmpeg is missing or fails.
    """
    import shutil
    import subprocess

    if shutil.which("ffmpeg") is None:
        raise RuntimeError(
            "ffmpeg is required to read non-WAV audio; install it or "
            "provide a .wav file"
        )
    cmd = [
        "ffmpeg", "-v", "error", "-i", str(path),
        "-ac", "1", "-ar", str(sample_rate), "-sample_fmt", "s16",
        "-f", "wav", "pipe:1",
    ]
    proc = subprocess.run(cmd, capture_output=True)
    if proc.returncode != 0:
        detail = proc.stderr.decode(errors="replace").strip()
        raise RuntimeError(f"ffmpeg could not decode {path}: {detail}")
    return proc.stdout


def load_audio_bytes(path, sample_rate: int = DEFAULT_SAMPLE_RATE) -> bytes:
    """Read WAV files directly; transcode everything else through ffmpeg."""
    from pathlib import Path as _Path

    p = _Path(path)
    if p.suffix.lower() == ".wav":
        return p.read_bytes()
    return transcode_to_wav(p, sample_rate)
