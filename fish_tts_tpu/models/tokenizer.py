"""Text tokenizer for fish-tts-tpu.

Host-side tiktoken BPE wrapper, behavior-compatible with the reference
``FishTokenizer`` (/root/reference/fish_tts/models/tokenizer.py:72-166):

- same split pattern (including the reference's literal ``(\\?!\\S)`` quirk at
  tokenizer.py:19 — upstream GPT-4o uses a ``(?!\\S)`` lookahead; we replicate
  the reference's literal so token streams match its checkpoints bit-for-bit),
- same base64 ``.tiktoken`` vocab loader (tokenizer.py:118-128),
- same special-token table: 15 control tokens + 4096 ``<|semantic:i|>`` tokens
  appended after the mergeable ranks (tokenizer.py:26-69, 83-87),
- same ``semantic_begin_id``/``semantic_end_id`` and semantic-id <-> token-id
  mapping consumed by the LM embedding mask (reference llama.py:418-423).

Tokenization runs on the host once per request.  The default encode path is
this repo's own native C++ BPE (fish_tts_tpu/native/bpe.cc — the TPU-native
replacement for the Rust tiktoken core the reference leans on), verified
token-for-token against tiktoken by tests/test_native_bpe.py; tiktoken remains
the always-available fallback and the decode path.  Select with
``FISH_TTS_TPU_BPE=auto|native|tiktoken`` (default ``auto``).  Everything
downstream of token ids is JAX.
"""

from __future__ import annotations

import base64
import json
import os
import re
from pathlib import Path

# Modified GPT-4o pattern for better punctuation handling.
# NOTE: r"\s+(\?!\S)" is a *literal* "?!" group, replicated from the reference
# (tokenizer.py:19); do not "fix" it to a lookahead or token boundaries shift.
FISH_TIKTOKEN_PATTERN = "|".join(
    [
        r"(?i:'s|'t|'re|'ve|'m|'ll|'d)",
        r"\p{P}",
        r"[^\r\n\p{L}\p{N}]?\p{L}+",
        r"\p{N}",
        r" ?[^\s\p{L}\p{N}]+[\r\n]*",
        r"\s*[\r\n]+",
        r"\s+(\?!\S)",
        r"\s+",
    ]
)
TIKTOKEN_MAX_ENCODE_CHARS = 400_000

BOS_TOKEN = "<|begin_of_text|>"
EOS_TOKEN = "<|end_of_text|>"
PAD_TOKEN = "<|pad|>"
IM_START_TOKEN = "<|im_start|>"
IM_END_TOKEN = "<|im_end|>"
PHONEME_START_TOKEN = "<|phoneme_start|>"
PHONEME_END_TOKEN = "<|phoneme_end|>"
TOOL_CALL_START_TOKEN = "<|tool_call_start|>"
TOOL_CALL_END_TOKEN = "<|tool_call_end|>"

MODALITY_TEXT_TOKEN = "<|text|>"
MODALITY_VOICE_TOKEN = "<|voice|>"
MODALITY_INTERLEAVE_TOKEN = "<|interleave|>"
AUDIO_START_TOKEN = "<|audio_start|>"
AUDIO_END_TOKEN = "<|audio_end|>"
AUDIO_EMBED_TOKEN = "<|audio|>"

MODALITY_TOKENS = {
    "text": MODALITY_TEXT_TOKEN,
    "voice": MODALITY_VOICE_TOKEN,
    "interleave": MODALITY_INTERLEAVE_TOKEN,
}

SEMANTIC_TOKEN_TEMPLATE = "<|semantic:{i}|>"
NUM_SEMANTIC_TOKENS = 4096
SEMANTIC_TOKENS = [SEMANTIC_TOKEN_TEMPLATE.format(i=i) for i in range(NUM_SEMANTIC_TOKENS)]

ALL_SPECIAL_TOKENS = [
    BOS_TOKEN,
    EOS_TOKEN,
    PAD_TOKEN,
    IM_START_TOKEN,
    IM_END_TOKEN,
    PHONEME_START_TOKEN,
    PHONEME_END_TOKEN,
    TOOL_CALL_START_TOKEN,
    TOOL_CALL_END_TOKEN,
    MODALITY_TEXT_TOKEN,
    MODALITY_VOICE_TOKEN,
    MODALITY_INTERLEAVE_TOKEN,
    AUDIO_START_TOKEN,
    AUDIO_END_TOKEN,
    AUDIO_EMBED_TOKEN,
    *SEMANTIC_TOKENS,
]

_SEMANTIC_RE = re.compile(r"<\|semantic:(\d+)\|>")


def load_tiktoken_bpe(tiktoken_bpe_file: str | Path) -> dict[bytes, int]:
    """Parse a ``.tiktoken`` vocab: one ``<base64-token> <rank>`` pair per
    line.  Some published vocabs carry a literal ``=`` placeholder row, which
    is not a valid token and is dropped (matching how the reference
    checkpoints are loaded)."""
    pairs = (
        line.split()
        for line in Path(tiktoken_bpe_file).read_text().splitlines()
        if line
    )
    return {
        base64.b64decode(tok): int(rank)
        for tok, rank in pairs
        if tok != "="
    }


class FishTokenizer:
    """BPE tokenizer with Fish-Speech special tokens.

    API-compatible with the reference ``FishTokenizer``: ``encode``/``decode``/
    ``get_token_id``/``semantic_begin_id``/``semantic_end_id``/
    ``semantic_id_to_token_id``/``vocab_size``/``num_special_tokens``.
    """

    def __init__(self, model_path: str | Path, special_tokens: list[str] | None = None):
        specials = list(special_tokens) if special_tokens is not None else ALL_SPECIAL_TOKENS

        ranks = load_tiktoken_bpe(model_path)
        # id layout contract: specials follow the mergeable ranks, in list
        # order, so ``<|semantic:i|>`` ids form one contiguous block
        self.all_special_tokens_with_ids = dict(
            zip(specials, range(len(ranks), len(ranks) + len(specials)))
        )

        self.semantic_id_to_token_id = {
            int(m.group(1)): tid
            for tok, tid in self.all_special_tokens_with_ids.items()
            if (m := _SEMANTIC_RE.match(tok))
        }
        if not self.semantic_id_to_token_id:
            raise ValueError("special-token list has no <|semantic:i|> entries")
        self.num_semantic_tokens = max(self.semantic_id_to_token_id) + 1
        self.semantic_begin_id = self.semantic_id_to_token_id[0]
        self.semantic_end_id = self.semantic_id_to_token_id[
            self.num_semantic_tokens - 1
        ]

        import tiktoken

        self.tkt_model = tiktoken.core.Encoding(
            name=Path(model_path).stem,
            pat_str=FISH_TIKTOKEN_PATTERN,
            mergeable_ranks=ranks,
            special_tokens=self.all_special_tokens_with_ids,
        )

        mode = os.environ.get("FISH_TTS_TPU_BPE", "auto")
        if mode not in ("auto", "native", "tiktoken"):
            raise ValueError(
                f"FISH_TTS_TPU_BPE={mode!r}: expected auto|native|tiktoken"
            )
        self._native = None
        if mode in ("auto", "native"):
            from fish_tts_tpu.native.bpe import load_native_bpe

            self._native = load_native_bpe(ranks)
            if self._native is None and mode == "native":
                raise RuntimeError(
                    "FISH_TTS_TPU_BPE=native but the native BPE library is "
                    "unavailable (no g++ toolchain or build failure)"
                )
        self._special_split_res: dict[frozenset, re.Pattern] = {}

    @property
    def vocab_size(self) -> int:
        return len(self.tkt_model._mergeable_ranks)

    @property
    def num_special_tokens(self) -> int:
        return len(self.all_special_tokens_with_ids)

    @property
    def total_vocab_size(self) -> int:
        return self.vocab_size + self.num_special_tokens

    def get_token_id(self, token: str) -> int:
        return self.all_special_tokens_with_ids[token]

    @property
    def im_end_id(self) -> int:
        return self.get_token_id(IM_END_TOKEN)

    def _special_split_re(self, allowed: frozenset) -> re.Pattern:
        """Regex matching any allowed special token literally.  No special is
        a prefix-at-same-position of another (they all close with ``|>``), so
        alternation order cannot change matches; sorted for determinism."""
        pat = self._special_split_res.get(allowed)
        if pat is None:
            pat = re.compile("|".join(re.escape(t) for t in sorted(allowed)))
            self._special_split_res[allowed] = pat
        return pat

    def _encode_span_native(self, span: str, allowed: set[str]) -> list[int]:
        """Mirror tiktoken's encode: split on *allowed* specials, BPE-encode
        the ordinary text between them (non-allowed specials flow into
        ordinary text, as with tiktoken's ``disallowed_special=set()``)."""
        native = self._native
        if not allowed:
            return native.encode_ordinary(span)
        out: list[int] = []
        pos = 0
        for m in self._special_split_re(frozenset(allowed)).finditer(span):
            if m.start() > pos:
                out.extend(native.encode_ordinary(span[pos:m.start()]))
            out.append(self.all_special_tokens_with_ids[m.group()])
            pos = m.end()
        if pos < len(span):
            out.extend(native.encode_ordinary(span[pos:]))
        return out

    def encode(self, s: str, allowed_special: bool | set[str] = True) -> list[int]:
        """Encode text, splitting very long inputs into fixed-size spans
        (tiktoken's regex engine degrades on multi-hundred-kB strings).  The
        span boundary can in principle split a BPE merge, which matches the
        reference's behavior for equally long inputs."""
        if not isinstance(s, str):
            raise TypeError(f"encode expects str, got {type(s).__name__}")
        if allowed_special is True:
            allowed = self.tkt_model.special_tokens_set
        else:
            # tiktoken silently ignores allowed entries that are not
            # registered specials; intersect so the native split regex (and
            # its special-id lookup) sees the same set on both paths.
            allowed = (allowed_special or set()) & set(
                self.all_special_tokens_with_ids
            )
        out: list[int] = []
        for start in range(0, len(s), TIKTOKEN_MAX_ENCODE_CHARS):
            span = s[start:start + TIKTOKEN_MAX_ENCODE_CHARS]
            if self._native is not None:
                out.extend(self._encode_span_native(span, allowed))
            else:
                out.extend(
                    self.tkt_model.encode(
                        span, allowed_special=allowed, disallowed_special=set()
                    )
                )
        return out

    def decode(self, tokens: list[int]) -> str:
        return self.tkt_model.decode(tokens)

    @classmethod
    def from_pretrained(cls, path: str | Path) -> "FishTokenizer":
        """Load from a checkpoint dir: ``tokenizer.tiktoken`` plus optional
        ``special_tokens.json`` (reference tokenizer.py:155-166)."""
        path = Path(path)
        special_tokens_path = path / "special_tokens.json"
        if special_tokens_path.exists():
            with open(special_tokens_path) as f:
                special_tokens = json.load(f)
        else:
            special_tokens = ALL_SPECIAL_TOKENS
        return cls(path / "tokenizer.tiktoken", special_tokens)


def write_tiny_vocab(path: str | Path, num_tokens: int = 256) -> None:
    """Write a minimal byte-level ``.tiktoken`` vocab for hermetic tests.

    256 single-byte tokens gives a valid BPE table that can encode any string
    (no merges).  Combined with a reduced special-token list this yields a tiny
    but fully functional FishTokenizer without the real checkpoint.
    """
    lines = []
    for i in range(min(num_tokens, 256)):
        lines.append(f"{base64.b64encode(bytes([i])).decode()} {i}")
    Path(path).write_text("\n".join(lines) + "\n")


def tiny_special_tokens(num_semantic: int) -> list[str]:
    """Special-token list with a reduced semantic range, for tiny test configs."""
    base = [t for t in ALL_SPECIAL_TOKENS if not t.startswith("<|semantic:")]
    return base + [SEMANTIC_TOKEN_TEMPLATE.format(i=i) for i in range(num_semantic)]
