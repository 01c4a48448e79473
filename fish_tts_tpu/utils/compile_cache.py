"""Persistent XLA compilation cache.

TPU analog of the reference's Inductor disk-cache bootstrap
(/root/reference/fish_tts/synthesizer.py:24-38): compiled XLA executables are
cached on disk so warm starts skip compilation entirely (the reference's warm
init is ~54s vs ~248s cold; with the XLA cache warm starts replay compiled
programs in seconds).
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

logger = logging.getLogger(__name__)

_DEFAULT_CACHE_DIR = Path.home() / ".cache" / "fish-tts-tpu" / "xla_cache"
_initialized = False


def setup_compile_cache(cache_dir: str | Path | None = None) -> None:
    """Enable the JAX persistent compilation cache (idempotent).

    ``FISH_TTS_TPU_CACHE_DIR=""`` (empty) disables it entirely — used by the
    test suite: CPU-test executables are host-machine-specific AOT artifacts
    (loading entries compiled on a different machine warns about SIGILL
    risk), and concurrent pytest workers racing cache *writes* have
    segfaulted inside zstd compression.  The cache's value is TPU warm
    starts; hermetic CPU tests lose nothing by skipping it.
    """
    global _initialized
    if _initialized:
        return
    env = os.environ.get("FISH_TTS_TPU_CACHE_DIR")
    if env == "":
        _initialized = True
        logger.info("XLA compilation cache disabled via FISH_TTS_TPU_CACHE_DIR")
        return
    cache_dir = Path(cache_dir or env or _DEFAULT_CACHE_DIR)
    cache_dir.mkdir(parents=True, exist_ok=True)
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _initialized = True
        logger.info("XLA compilation cache at %s", cache_dir)
    except Exception as e:  # pragma: no cover
        logger.warning("Could not enable XLA compile cache: %s", e)
