"""L5 script-layer smoke tests (SURVEY §1 L5 / §2 Scripts row).

The reference ships four CLI scripts whose equivalents live in scripts/;
serve_http.py already has a subprocess test (test_model_dir.py).  These
drive the remaining CLIs IN-PROCESS against the tiny native model dir —
argparse surface through main(argv) where supported — so the script layer
is covered hermetically without paying a fresh JAX init per script.

All example_synthesis/encode_reference tests share ONE ``get_instance``
singleton (same model dir), mirroring how the reference's scripts lean on
the process singleton (reference synthesizer.py:661-710).
"""

import importlib.util
import json
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _load_script(name: str):
    spec = importlib.util.spec_from_file_location(
        name, REPO / "scripts" / f"{name}.py"
    )
    mod = importlib.util.module_from_spec(spec)
    # dataclass field resolution looks the module up by name (PEP 563
    # annotations) — register it like a normal import would
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    from fish_tts_tpu.testing import write_tiny_model_dir

    return write_tiny_model_dir(tmp_path_factory.mktemp("m") / "model")


@pytest.fixture(scope="module", autouse=True)
def _fresh_singleton():
    """The scripts go through get_instance; isolate the singleton from (and
    for) the rest of the suite."""
    import fish_tts_tpu

    fish_tts_tpu.reset_instance()
    yield
    fish_tts_tpu.reset_instance()


def _common(tiny_model_dir):
    return ["--model-dir", str(tiny_model_dir),
            "--device", "cpu", "--precision", "fp32"]


def test_example_synthesis_batch_cli(tiny_model_dir, tmp_path):
    """Batch mode: one in-process CLI call writes one WAV per text.

    (Runs first so the singleton is created here; the later tests reuse
    it, like repeated script invocations reuse a warm process.)"""
    mod = _load_script("example_synthesis")
    out = tmp_path / "b.wav"
    rc = mod.main(_common(tiny_model_dir) + [
        "--batch", "first tiny text", "second one", "-o", str(out),
    ])
    assert rc == 0
    for i in range(2):
        w = (tmp_path / f"b-{i}.wav").read_bytes()
        assert w[:4] == b"RIFF" and len(w) > 44


def test_example_synthesis_basic_cli(tiny_model_dir, tmp_path):
    mod = _load_script("example_synthesis")
    out = tmp_path / "out.wav"
    rc = mod.main(_common(tiny_model_dir) + [
        "--text", "hello script", "-o", str(out),
    ])
    assert rc == 0
    wav = out.read_bytes()
    assert wav[:4] == b"RIFF" and len(wav) > 44


def test_example_synthesis_long_cli(tiny_model_dir, tmp_path):
    mod = _load_script("example_synthesis")
    out = tmp_path / "l.wav"
    rc = mod.main(_common(tiny_model_dir) + [
        "--long", "--max-chars", "12", "--carry-frames", "4",
        "--text", "One two. Three four! Five six.", "-o", str(out),
    ])
    assert rc == 0
    assert out.read_bytes()[:4] == b"RIFF"


def test_example_synthesis_stream_cli(tiny_model_dir, tmp_path, capsys):
    mod = _load_script("example_synthesis")
    out = tmp_path / "s.wav"
    rc = mod.main(_common(tiny_model_dir) + [
        "--stream", "--text", "hello stream", "-o", str(out),
    ])
    assert rc == 0
    assert out.read_bytes()[:4] == b"RIFF"
    assert "first audio after" in capsys.readouterr().out


def test_example_synthesis_serve_cli(tiny_model_dir, tmp_path):
    mod = _load_script("example_synthesis")
    out = tmp_path / "sv.wav"
    rc = mod.main(_common(tiny_model_dir) + [
        "--serve", "request one", "request two", "--slots", "2",
        "-o", str(out),
    ])
    assert rc == 0
    for i in range(2):
        assert (tmp_path / f"sv-{i}.wav").read_bytes()[:4] == b"RIFF"


def test_encode_reference_cli_roundtrip(tiny_model_dir, tmp_path):
    """WAV in -> .npy profile out, loadable and usable for cloning."""
    from fish_tts_tpu import VoiceProfile
    from fish_tts_tpu.utils.audio import to_wav_bytes

    # ~0.1 s of audio (~3 frames): the tiny config's 128-token context must
    # fit transcript + VQ rows + target text (byte-level tiny vocab)
    rng = np.random.RandomState(0)
    wav_path = tmp_path / "ref.wav"
    wav_path.write_bytes(
        to_wav_bytes(rng.uniform(-0.3, 0.3, 4410).astype(np.float32))
    )
    out = tmp_path / "ref_profile.npy"
    mod = _load_script("encode_reference")
    rc = mod.main([str(wav_path), "ref", "-o", str(out), "--name", "probe"]
                  + _common(tiny_model_dir))
    assert rc == 0
    profile = VoiceProfile.load(out, text="ref")
    assert profile.codes.ndim == 2 and profile.codes.shape[1] >= 1
    # profile drives the synthesis path (voice cloning wiring intact)
    import fish_tts_tpu

    tts = fish_tts_tpu.get_instance(model_dir=str(tiny_model_dir),
                                    device="cpu", precision="fp32")
    wav = tts.synthesize("hi", references=[profile], max_tokens=8)
    assert wav[:4] == b"RIFF"


def test_benchmark_tiny_json(monkeypatch, capsys):
    """benchmark.py --tiny --json: the report renders and parses."""
    mod = _load_script("benchmark")
    monkeypatch.setattr(sys, "argv", ["benchmark.py", "--tiny", "--json"])
    mod.main()
    rep = json.loads(capsys.readouterr().out)
    assert rep and isinstance(rep, dict)


def test_convert_checkpoint_help(monkeypatch):
    """The converter CLI parses (conversion itself is covered by
    tests/test_checkpoint.py against in-memory torch state dicts)."""
    mod = _load_script("convert_checkpoint")
    monkeypatch.setattr(sys, "argv", ["convert_checkpoint.py", "--help"])
    with pytest.raises(SystemExit) as e:
        mod.main()
    assert e.value.code == 0


def test_example_synthesis_long_stream_cli(tiny_model_dir, tmp_path, capsys):
    """--long --stream streams continuously across text chunks (previously
    --stream was silently ignored when --long was given)."""
    mod = _load_script("example_synthesis")
    out = tmp_path / "ls.wav"
    rc = mod.main(_common(tiny_model_dir) + [
        "--long", "--stream", "--max-chars", "12", "--carry-frames", "4",
        "--text", "One two. Three four! Five six.", "-o", str(out),
    ])
    assert rc == 0
    assert out.read_bytes()[:4] == b"RIFF"
    assert "first audio after" in capsys.readouterr().out


def test_example_synthesis_mode_conflicts_error(tmp_path):
    """Conflicting mode flags raise an argparse error instead of silently
    overriding each other (no model load needed: validation is pre-load)."""
    mod = _load_script("example_synthesis")
    for argv in (
        ["--batch", "a", "--serve", "b"],
        ["--stream", "--batch", "a"],
        ["--long", "--serve", "a"],
        ["--carry-frames", "4", "--text", "x"],  # --long-only knob
    ):
        with pytest.raises(SystemExit) as e:
            mod.parse_args(argv + ["--text", "x"] if "--text" not in argv
                           else argv)
        assert e.value.code == 2
