"""Test harness: force CPU JAX with an 8-device virtual mesh.

Must set env vars before jax is imported anywhere; pytest imports conftest
first, so this is the one reliable place.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Disable the persistent XLA cache for tests: CPU executables are
# host-specific AOT artifacts (cross-machine entries risk SIGILL) and
# concurrent pytest runs have segfaulted racing cache writes.
os.environ["FISH_TTS_TPU_CACHE_DIR"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The env var alone is not honored when a TPU plugin (axon) is present —
# force the platform through the config API before any computation runs.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from pathlib import Path  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_vocab_path(tmp_path_factory) -> Path:
    from fish_tts_tpu.models.tokenizer import write_tiny_vocab

    path = tmp_path_factory.mktemp("vocab") / "tokenizer.tiktoken"
    write_tiny_vocab(path)
    return path


@pytest.fixture(scope="session")
def tiny_tokenizer(tiny_vocab_path):
    """FishTokenizer with 256 byte tokens + specials with 48 semantic tokens,
    matching TINY_CONFIG (codebook_size=48)."""
    from fish_tts_tpu.models.tokenizer import FishTokenizer, tiny_special_tokens

    return FishTokenizer(tiny_vocab_path, tiny_special_tokens(num_semantic=48))
