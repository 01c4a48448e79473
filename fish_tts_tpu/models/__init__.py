"""Model layer: DualAR LM, DAC vocoder, tokenizer, prompt assembly.

Re-export surface mirrors the reference's ``fish_tts.models``
(/root/reference/fish_tts/models/__init__.py:19-34) so code importing from
the models subpackage ports directly.  ``BaseModelArgs``/``DualARModelArgs``
both map to our unified :class:`~fish_tts_tpu.config.DualARConfig` (the
reference splits base vs dual-AR fields across two dataclasses;
checkpoint ``config.json`` files load identically through either name).
"""

from fish_tts_tpu.config import DualARConfig as BaseModelArgs  # noqa: F401
from fish_tts_tpu.config import DualARConfig as DualARModelArgs  # noqa: F401
from fish_tts_tpu.config import VocoderConfig as VocoderModelArgs  # noqa: F401
from fish_tts_tpu.models.api import (  # noqa: F401
    DAC,
    DownsampleResidualVectorQuantize,
    DualARTransformer,
    WindowLimitedTransformer,
    generate_long,
    init_model,
)
from fish_tts_tpu.models.prompt import (  # noqa: F401
    ContentSequence,
    TextPart,
    VQPart,
)
from fish_tts_tpu.models.tokenizer import FishTokenizer  # noqa: F401


def __getattr__(name):
    # GenerateResponse lives in the engine layer, which itself imports the
    # models subpackage — resolve lazily to keep the import graph acyclic
    # whichever side is imported first.
    if name == "GenerateResponse":
        from fish_tts_tpu.engine.generate import GenerateResponse

        return GenerateResponse
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

__all__ = [
    "BaseModelArgs",
    "DualARModelArgs",
    "DualARTransformer",
    "FishTokenizer",
    "DAC",
    "DownsampleResidualVectorQuantize",
    "VocoderModelArgs",
    "WindowLimitedTransformer",
    "init_model",
    "generate_long",
    "GenerateResponse",
    "ContentSequence",
    "TextPart",
    "VQPart",
]
