"""Native checkpoint-directory round-trip and the serve_http.py script.

The tiny native model dir (fish_tts_tpu.testing.write_tiny_model_dir) uses
the SAME on-disk contract as a converted real checkpoint — config.json,
tokenizer.tiktoken, special_tokens.json, lm.safetensors,
vocoder.safetensors, vocoder_config.json — so these tests exercise the real
disk-load path end to end, including from a subprocess.
"""

import http.client
import json
import os
import signal
import socket
import subprocess
import sys
import time
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def test_vocoder_config_json_roundtrip(tmp_path):
    from fish_tts_tpu.config import TINY_VOCODER_CONFIG, VocoderConfig

    p = tmp_path / "vocoder_config.json"
    TINY_VOCODER_CONFIG.to_json(p)
    got = VocoderConfig.from_json(p)
    assert got == TINY_VOCODER_CONFIG
    # directory form + unknown-field tolerance (forward compat)
    data = json.loads(p.read_text())
    data["some_future_field"] = 1
    p.write_text(json.dumps(data))
    assert VocoderConfig.from_json(tmp_path) == TINY_VOCODER_CONFIG


def test_fishtts_loads_native_tiny_dir(tmp_path):
    """FishTTS(model_dir=...) on a native-format dir: the persisted vocoder
    wiring is honored (not the hard-coded full-size default) and the full
    public path synthesizes."""
    from fish_tts_tpu.config import TINY_VOCODER_CONFIG
    from fish_tts_tpu.synthesizer import FishTTS
    from fish_tts_tpu.testing import write_tiny_model_dir

    d = write_tiny_model_dir(tmp_path / "model")
    tts = FishTTS(model_dir=d, device="cpu", precision="fp32", warmup=False)
    assert tts._vocoder_cfg == TINY_VOCODER_CONFIG
    wav = tts.synthesize("hello from disk", max_tokens=8)
    assert wav[:4] == b"RIFF" and len(wav) > 44


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_serve_http_script_sigterm_drains(tmp_path):
    """scripts/serve_http.py end to end in a subprocess: serves a request
    from a native tiny model dir, then SIGTERM finishes the in-flight
    stream (graceful drain) and exits 0."""
    from fish_tts_tpu.testing import write_tiny_model_dir

    d = write_tiny_model_dir(tmp_path / "model")
    port = _free_port()
    env = dict(os.environ)
    env.setdefault("FISH_TTS_TPU_CACHE_DIR", "/tmp/fish-tts-tpu-test-xla-cache")
    proc = subprocess.Popen(
        [sys.executable, str(REPO / "scripts" / "serve_http.py"),
         "--model-dir", str(d), "--port", str(port), "--slots", "2",
         "--platform", "cpu", "--no-warmup", "--precision", "fp32"],
        cwd=str(REPO), env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    try:
        deadline = time.time() + 180
        while True:
            try:
                c = http.client.HTTPConnection("127.0.0.1", port, timeout=5)
                c.request("GET", "/healthz")
                if c.getresponse().status == 200:
                    c.close()
                    break
            except OSError:
                pass
            assert proc.poll() is None, "server process died during startup"
            assert time.time() < deadline, "server did not come up"
            time.sleep(1.0)

        # one complete request through the script (compiles on first use)
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        c.request("POST", "/synthesize",
                  json.dumps({"text": "short", "max_new_tokens": 6}),
                  {"Content-Type": "application/json"})
        r = c.getresponse()
        assert r.status == 200
        pcm = r.read()
        assert len(pcm) > 0
        c.close()

        # in-flight request, then SIGTERM: the stream must still terminate
        # (drain) and the process must exit cleanly
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        c.request("POST", "/synthesize",
                  json.dumps({"text": "longer request", "max_new_tokens": 40}),
                  {"Content-Type": "application/json"})
        r = c.getresponse()
        assert r.status == 200
        first = r.read(2)  # ensure the stream is live before the TERM
        assert len(first) == 2
        proc.send_signal(signal.SIGTERM)
        rest = r.read()  # must terminate, not hang
        assert isinstance(rest, bytes)
        c.close()
        assert proc.wait(timeout=120) == 0
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)
