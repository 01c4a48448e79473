"""fish-tts-tpu: TPU-native Fish-Speech / OpenAudio-S1-mini TTS inference.

A ground-up JAX/XLA/Pallas re-design of smolGura/fish-tts with the same
public API (reference fish_tts/__init__.py:34-37):

Features:
- Singleton pattern: model loaded once per process
- jitted prefill + fully on-device chunked decode (lax.scan, no per-token
  host sync) with persistent XLA compile cache
- Prefilled references as reusable device KV prefixes: set voice profiles
  once, every synthesize call starts from the cached prefix
- Pipeline streaming: LM decode and vocoder decode overlapped via async
  dispatch
- Dynamic references: add/remove voice profiles at runtime
- Multi-chip serving: EngineConfig(tp_size, dp_size) shards the LM
  (Megatron-style TP, int8-aware) and generate_batch streams (dp) over a
  jax.sharding mesh

Usage:
    from fish_tts_tpu import get_instance, VoiceProfile

    synth = get_instance(model_dir="/path/to/openaudio-s1-mini")
    audio = synth.synthesize("Hello world")

    profile = VoiceProfile.load("voice.npy", text="reference transcript")
    synth.set_references([profile])
    audio = synth.synthesize("Text to speak")

    for chunk in synth.synthesize_stream("Long text..."):
        play_audio(chunk)
"""

from fish_tts_tpu.synthesizer import (  # noqa: F401
    FishTTS,
    VoiceProfile,
    get_instance,
    reset_instance,
)

__version__ = "0.1.0"
__all__ = ["FishTTS", "VoiceProfile", "get_instance", "reset_instance"]
