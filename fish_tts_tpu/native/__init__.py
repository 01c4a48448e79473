"""Native (C++) host-path components, bound via ctypes.

Currently: the BPE text encoder (``bpe.cc``) replacing the reference's
dependency on tiktoken's Rust core for the per-request tokenize step.
Everything device-side is JAX/XLA/Pallas; this package is host-only.
"""

from fish_tts_tpu.native.bpe import NativeBPE, build_library, load_native_bpe  # noqa: F401
