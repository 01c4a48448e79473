"""Prompt assembly: interleaved multimodal content sequences.

Builds the ``(1 + num_codebooks, T)`` prompt matrix the DualAR LM consumes,
matching the reference's ``ContentSequence.encode_for_inference`` contract
(/root/reference/fish_tts/models/inference.py:467-640):

- row 0: text-token ids; positions covered by a VQ part carry
  ``semantic_begin_id + code`` instead (inference.py:631-633),
- rows 1..K: codebook values under the VQ mask, zero elsewhere (inference.py:634),
- parts are laid out as ``<|interleave|>`` then per reference
  ``[<|speaker:0|>, text, VQ codes, <|im_end|>]`` and finally
  ``[<|speaker:0|>, target text]`` (inference.py:779-789).

This is host-side numpy (it runs once per synthesize call); the device side
only ever sees the finished int32 matrix.

Consciously omitted: the reference's training-mode ``ContentSequence.encode``
surface (inference.py:523-609) also emits per-position labels and audio-part
masks for loss computation.  This framework is inference-only (as is the
reference's shipped product path — nothing in fish_tts calls encode with
labels), so only the inference projection is implemented; adding labels
later is a pure host-side extension of ``encode_for_inference``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Literal, Sequence, Union

import numpy as np

from fish_tts_tpu.models.tokenizer import (
    IM_END_TOKEN,
    MODALITY_TOKENS,
    FishTokenizer,
)


@dataclass
class TextPart:
    """A text span (reference inference.py:442-451)."""

    text: str | None = None
    tokens: list[int] | None = None
    cal_loss: bool = False
    type: str = "text"

    def __post_init__(self):
        if self.text is None and self.tokens is None:
            raise ValueError("Either text or tokens must be provided")


@dataclass
class VQPart:
    """A span of audio codes, shape ``(num_codebooks, T)`` with row 0 the
    semantic codebook (reference inference.py:432-439)."""

    codes: np.ndarray
    cal_loss: bool = False
    type: str = "vq"

    def __post_init__(self):
        self.codes = np.asarray(self.codes)


Part = Union[TextPart, VQPart]

_PART_TYPES: dict[str, type] = {"text": TextPart, "vq": VQPart}


def _coerce_part(spec: Part | dict) -> Part:
    """Accept an already-built part or a ``{"type": ..., ...}`` dict (the
    dict-or-dataclass convention of the reference API surface)."""
    if not isinstance(spec, dict):
        return spec
    kwargs = dict(spec)
    kind = kwargs.pop("type", None)
    cls = _PART_TYPES.get(kind)
    if cls is None:
        raise ValueError(f"Unsupported part type: {kind}")
    return cls(**kwargs)


@dataclass
class EncodedPrompt:
    """Result of :meth:`ContentSequence.encode_for_inference`."""

    values: np.ndarray  # (1 + num_codebooks, T) int32
    vq_mask: np.ndarray  # (T,) bool — True where row 0 holds a semantic token


class ContentSequence:
    """Flexible sequence of content parts (reference inference.py:467-640)."""

    def __init__(
        self,
        parts: Sequence[Part | dict] | None = None,
        modality: Literal["text", "voice", "interleave"] | None = None,
        metadata: dict | None = None,
    ):
        self.modality = modality
        self.metadata = metadata or {}
        self.parts: list[Part] = [_coerce_part(p) for p in (parts or [])]
        # A modality sequence always opens with its tag token; prepend it
        # unless the caller's first part already carries it.
        if modality is not None and not self._opens_with_modality_tag():
            self.parts.insert(0, TextPart(text=MODALITY_TOKENS[modality]))

    def _opens_with_modality_tag(self) -> bool:
        if not self.parts:
            return False
        head = self.parts[0]
        return (
            isinstance(head, TextPart)
            and head.text is not None
            and head.text.startswith(MODALITY_TOKENS[self.modality])
        )

    def append(
        self,
        part_or_parts: Part | list[Part],
        add_end: bool = False,
        speaker: str | int | None = None,
    ) -> None:
        """Append one layout block: ``[<|speaker:s|>?] parts... [<|im_end|>?]``.

        This is how the per-reference blocks of the inference prompt are
        laid out (reference generate_long, inference.py:783-789).
        """
        block: list[Part] = []
        if speaker is not None:
            block.append(TextPart(text=f"<|speaker:{speaker}|>"))
        block += part_or_parts if isinstance(part_or_parts, list) else [part_or_parts]
        if add_end:
            tail = block[-1] if block else self.parts[-1]
            block.append(TextPart(text=IM_END_TOKEN, cal_loss=tail.cal_loss))
        self.parts += block

    def encode_for_inference(
        self, tokenizer: FishTokenizer, num_codebooks: int
    ) -> EncodedPrompt:
        """Token-ize all parts into the ``(1+K, T)`` prompt matrix."""
        token_chunks: list[np.ndarray] = []
        mask_chunks: list[np.ndarray] = []
        vq_chunks: list[np.ndarray] = []

        for part in self.parts:
            if isinstance(part, TextPart):
                if part.tokens is None:
                    toks = tokenizer.encode(part.text)
                else:
                    toks = list(part.tokens)
                toks = np.asarray(toks, dtype=np.int32)
                token_chunks.append(toks)
                mask_chunks.append(np.zeros(len(toks), dtype=bool))
            elif isinstance(part, VQPart):
                codes = np.asarray(part.codes, dtype=np.int32)
                if codes.ndim != 2 or codes.shape[0] != num_codebooks:
                    raise ValueError(
                        f"VQPart codes must be ({num_codebooks}, T), got {codes.shape}"
                    )
                # Row 0 of the prompt matrix holds the *token id* of each
                # semantic code (semantic_begin_id + code), reference
                # inference.py:553-559, 631-633.
                sem_tokens = codes[0] + tokenizer.semantic_begin_id
                token_chunks.append(sem_tokens.astype(np.int32))
                mask_chunks.append(np.ones(codes.shape[1], dtype=bool))
                vq_chunks.append(codes)
            else:
                raise ValueError(f"Unsupported part type: {type(part)}")

        tokens = (
            np.concatenate(token_chunks) if token_chunks else np.zeros(0, np.int32)
        )
        vq_mask = np.concatenate(mask_chunks) if mask_chunks else np.zeros(0, bool)

        values = np.zeros((num_codebooks + 1, len(tokens)), dtype=np.int32)
        values[0] = tokens
        if vq_chunks:
            all_codes = np.concatenate(vq_chunks, axis=1)
            values[1:, vq_mask] = all_codes
        return EncodedPrompt(values=values, vq_mask=vq_mask)


def build_prompt(
    tokenizer: FishTokenizer,
    text: str,
    num_codebooks: int,
    prompt_texts: Sequence[str] = (),
    prompt_codes: Sequence[np.ndarray] = (),
) -> EncodedPrompt:
    """Assemble the full inference prompt as the reference does
    (``generate_long``, inference.py:779-795): an ``<|interleave|>`` modality
    tag, one ``[speaker, text, codes, <|im_end|>]`` block per voice reference,
    then ``[speaker, target text]`` with no end tag."""
    assert len(prompt_texts) == len(prompt_codes)
    seq = ContentSequence(modality="interleave")
    for t, c in zip(prompt_texts, prompt_codes):
        seq.append([TextPart(text=t), VQPart(codes=c)], add_end=True, speaker=0)
    seq.append([TextPart(text=text)], add_end=False, speaker=0)
    return seq.encode_for_inference(tokenizer, num_codebooks)
