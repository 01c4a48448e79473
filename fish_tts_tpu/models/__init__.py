"""Model layer: DualAR LM, DAC vocoder, tokenizer, prompt assembly."""

from fish_tts_tpu.models.tokenizer import FishTokenizer  # noqa: F401
