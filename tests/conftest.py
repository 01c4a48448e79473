"""Test harness: force CPU JAX with an 8-device virtual mesh.

Must set env vars before jax is imported anywhere; pytest imports conftest
first, so this is the one reliable place.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Point the persistent XLA cache at a MACHINE-LOCAL dir for tests: the
# shared ~/.cache dir accumulates CPU AOT artifacts compiled on other
# machines (loading them warns about SIGILL risk) and has segfaulted under
# concurrent writers.  /tmp is per-machine and per-boot, so entries are
# always host-compatible; repeat suite runs on one machine stay fast.
os.environ.setdefault(
    "FISH_TTS_TPU_CACHE_DIR", "/tmp/fish-tts-tpu-test-xla-cache"
)
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


# XLA:CPU segfaults nondeterministically in backend_compile_and_load once a
# single process has accumulated a few hundred compiled executables (seen at
# different tests on different runs; stack always bottoms out in the CPU
# client's compile path).  Dropping the in-memory executable caches every
# ~40 tests keeps the per-process executable count bounded; the /tmp
# persistent cache below makes the re-traces cheap.
_CLEAR_EVERY = 40
_done = {"n": 0}


@pytest.fixture(autouse=True)
def _periodic_clear_caches():
    yield
    _done["n"] += 1
    if _done["n"] % _CLEAR_EVERY == 0:
        jax.clear_caches()


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
