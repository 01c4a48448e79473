"""Hermetic test fixtures: a fully functional tiny FishTTS with random
weights and a byte-level tokenizer — no checkpoints, no network, CPU-sized.

Used by tests/ and by bench.py's --tiny mode.  The tiny config keeps every
architectural feature of the real model (DualAR fast loop, GRVQ vocoder,
window-limited transformers) at 1/1000 the size.
"""

from __future__ import annotations

import tempfile
from pathlib import Path

import jax
import jax.numpy as jnp


def make_tiny_bundle(seed: int = 0, dtype=jnp.float32):
    """(cfg, params, tokenizer, vocoder_cfg, vocoder_params) for FishTTS."""
    from fish_tts_tpu.config import TINY_CONFIG, TINY_VOCODER_CONFIG
    from fish_tts_tpu.models import dual_ar, vocoder
    from fish_tts_tpu.models.tokenizer import (
        FishTokenizer,
        tiny_special_tokens,
        write_tiny_vocab,
    )

    d = Path(tempfile.mkdtemp(prefix="fish_tts_tiny_"))
    write_tiny_vocab(d / "tokenizer.tiktoken")
    cfg = TINY_CONFIG
    tokenizer = FishTokenizer(
        d / "tokenizer.tiktoken", tiny_special_tokens(cfg.codebook_size)
    )
    params = dual_ar.init_params(jax.random.PRNGKey(seed), cfg, dtype=dtype)
    vcfg = TINY_VOCODER_CONFIG
    vparams = vocoder.init_vocoder_params(jax.random.PRNGKey(seed + 1), vcfg, dtype=dtype)
    return cfg, params, tokenizer, vcfg, vparams


def write_tiny_model_dir(out_dir: str | Path, seed: int = 0) -> Path:
    """Write a complete tiny NATIVE-format checkpoint directory: the same
    on-disk contract ``FishTTS(model_dir=...)`` loads for real models
    (config.json + tokenizer.tiktoken + special_tokens.json +
    lm.safetensors + vocoder.safetensors + vocoder_config.json), at test
    size.  Exercises the full disk-load path hermetically — including in a
    subprocess (e.g. driving ``scripts/serve_http.py``)."""
    import dataclasses
    import json

    from fish_tts_tpu.models.tokenizer import (
        tiny_special_tokens,
        write_tiny_vocab,
    )
    from fish_tts_tpu.utils import checkpoint as ckpt

    # persist make_tiny_bundle's outputs so the on-disk fixture can never
    # diverge from the in-memory one
    cfg, params, _tokenizer, vcfg, vparams = make_tiny_bundle(seed)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    with open(out / "config.json", "w", encoding="utf-8") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2)
    write_tiny_vocab(out / "tokenizer.tiktoken")
    with open(out / "special_tokens.json", "w", encoding="utf-8") as f:
        json.dump(tiny_special_tokens(cfg.codebook_size), f)
    ckpt.save_params(out / "lm.safetensors", params, dtype="fp32")
    ckpt.save_params(out / "vocoder.safetensors", vparams, dtype="fp32")
    vcfg.to_json(out / "vocoder_config.json")
    return out


def make_tiny_tts(seed: int = 0, warmup: bool = False):
    """A ready FishTTS running the tiny config on the current platform."""
    from fish_tts_tpu.synthesizer import FishTTS

    return FishTTS(
        device="cpu" if jax.default_backend() == "cpu" else "tpu",
        precision="fp32",
        warmup=warmup,
        _testing_bundle=make_tiny_bundle(seed),
    )
