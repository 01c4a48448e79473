"""ctypes binding for the native BPE encoder (``bpe.cc``).

Build model: the shared library is compiled on demand with ``g++`` into
``$FISH_TTS_TPU_CACHE_DIR/native/`` (default ``~/.cache/fish-tts-tpu/native/``
— the repo's one cache root) keyed by a hash of the C++ sources, so a source
edit triggers a rebuild and concurrent processes race benignly (atomic
rename).  No pybind11 in this image — plain C ABI + ctypes.

``load_native_bpe()`` returns ``None`` whenever anything is missing (no
toolchain, build failure, big-endian host) and the tokenizer falls back to
tiktoken, so the native path is always optional.  Parity vs tiktoken is
enforced token-for-token by tests/test_native_bpe.py.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import struct
import subprocess
import sys
import tempfile
from pathlib import Path

logger = logging.getLogger(__name__)

_SRC_DIR = Path(__file__).parent
_SOURCES = ("bpe.cc", "unicode_tables.h")
_ABI_VERSION = 1


def _cache_dir() -> Path:
    # Same relocation knob as the XLA compile cache (utils/compile_cache.py);
    # "" there means "disable the XLA cache", for builds it just means default.
    root = os.environ.get("FISH_TTS_TPU_CACHE_DIR") or ""
    base = Path(root) if root else Path.home() / ".cache" / "fish-tts-tpu"
    return base / "native"


def _source_hash() -> str:
    h = hashlib.sha256()
    for name in _SOURCES:
        h.update((_SRC_DIR / name).read_bytes())
    return h.hexdigest()[:16]


def build_library(verbose: bool = False) -> Path | None:
    """Compile bpe.cc into the cache dir (idempotent); returns the .so path."""
    try:
        so_path = _cache_dir() / f"libfishbpe-{_source_hash()}.so"
        if so_path.exists():
            return so_path
        so_path.parent.mkdir(parents=True, exist_ok=True)
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=so_path.parent)
        os.close(fd)
    except OSError as e:
        # read-only HOME / unwritable cache dir: the native path is
        # strictly optional — fall back to tiktoken instead of raising
        logger.warning("native BPE build cache unavailable: %s", e)
        return None
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
        str(_SRC_DIR / "bpe.cc"), "-o", tmp,
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if proc.returncode != 0:
            if verbose:
                print(proc.stderr, file=sys.stderr)
            logger.warning("native BPE build failed: %s", proc.stderr[-500:])
            os.unlink(tmp)
            return None
        os.replace(tmp, so_path)  # atomic: concurrent builders converge
        return so_path
    except (OSError, subprocess.TimeoutExpired) as e:
        logger.warning("native BPE build unavailable: %s", e)
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


class NativeBPE:
    """Encode ordinary text (no special tokens) with the native library."""

    def __init__(self, lib: ctypes.CDLL, ranks: dict[bytes, int]):
        self._lib = lib
        blob = bytearray()
        for tok, rank in ranks.items():
            blob += struct.pack("<I", len(tok)) + tok + struct.pack("<I", rank)
        blob = bytes(blob)
        self._handle = lib.ft_bpe_new(blob, len(blob))
        if not self._handle:
            raise RuntimeError("ft_bpe_new rejected the vocab blob")

    def encode_ordinary(self, text: str) -> list[int]:
        data = text.encode("utf-8")
        out = ctypes.POINTER(ctypes.c_uint32)()
        n = self._lib.ft_bpe_encode(self._handle, data, len(data),
                                    ctypes.byref(out))
        if n < 0:
            raise ValueError("native BPE encode failed")
        try:
            return out[:n]
        finally:
            self._lib.ft_ids_free(out)

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle:
            self._lib.ft_bpe_free(handle)
            self._handle = None


def _load_lib() -> ctypes.CDLL | None:
    if sys.byteorder != "little":
        return None
    so_path = build_library()
    if so_path is None:
        return None
    try:
        lib = ctypes.CDLL(str(so_path))
    except OSError as e:
        logger.warning("native BPE load failed: %s", e)
        return None
    lib.ft_abi_version.restype = ctypes.c_int
    if lib.ft_abi_version() != _ABI_VERSION:
        logger.warning("native BPE ABI mismatch; falling back to tiktoken")
        return None
    lib.ft_bpe_new.restype = ctypes.c_void_p
    lib.ft_bpe_new.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
    lib.ft_bpe_free.argtypes = [ctypes.c_void_p]
    lib.ft_bpe_encode.restype = ctypes.c_int64
    lib.ft_bpe_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint32)),
    ]
    lib.ft_ids_free.argtypes = [ctypes.POINTER(ctypes.c_uint32)]
    return lib


_LIB: ctypes.CDLL | None = None
_LIB_TRIED = False


def load_native_bpe(ranks: dict[bytes, int]) -> NativeBPE | None:
    """Build/load the library and wrap ``ranks``; None if unavailable."""
    global _LIB, _LIB_TRIED
    if not _LIB_TRIED:
        _LIB_TRIED = True
        _LIB = _load_lib()
    if _LIB is None:
        return None
    try:
        return NativeBPE(_LIB, ranks)
    except (RuntimeError, MemoryError) as e:
        logger.warning("native BPE init failed: %s", e)
        return None
