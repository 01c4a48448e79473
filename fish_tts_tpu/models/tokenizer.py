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

Tokenization is not on the TPU hot path (it runs once per synthesize call on
the host), so tiktoken's native BPE is the right tool; everything downstream of
token ids is JAX.
"""

from __future__ import annotations

import base64
import json
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
    """Parse a base64 ``token rank`` vocab file (reference tokenizer.py:118-128)."""
    data: dict[bytes, int] = {}
    for line in open(tiktoken_bpe_file).read().splitlines():
        if not line:
            continue
        token, rank = line.split()
        if token == "=":
            continue
        data[base64.b64decode(token)] = int(rank)
    return data


class FishTokenizer:
    """BPE tokenizer with Fish-Speech special tokens.

    API-compatible with the reference ``FishTokenizer``: ``encode``/``decode``/
    ``get_token_id``/``semantic_begin_id``/``semantic_end_id``/
    ``semantic_id_to_token_id``/``vocab_size``/``num_special_tokens``.
    """

    def __init__(self, model_path: str | Path, special_tokens: list[str] | None = None):
        if special_tokens is None:
            special_tokens = ALL_SPECIAL_TOKENS

        mergeable_ranks = load_tiktoken_bpe(model_path)
        special_token_begin = len(mergeable_ranks)
        self.all_special_tokens_with_ids = {
            token: special_token_begin + i for i, token in enumerate(special_tokens)
        }

        self.semantic_id_to_token_id: dict[int, int] = {}
        end_idx = 0
        for token in special_tokens:
            m = _SEMANTIC_RE.match(token)
            if token.startswith("<|semantic:") and m:
                idx = int(m.group(1))
                self.semantic_id_to_token_id[idx] = self.all_special_tokens_with_ids[token]
                end_idx = max(end_idx, idx)

        self.semantic_begin_id = self.semantic_id_to_token_id[0]
        self.semantic_end_id = self.semantic_id_to_token_id[end_idx]
        self.num_semantic_tokens = end_idx + 1

        import tiktoken

        self.tkt_model = tiktoken.core.Encoding(
            name=Path(model_path).stem,
            pat_str=FISH_TIKTOKEN_PATTERN,
            mergeable_ranks=mergeable_ranks,
            special_tokens=self.all_special_tokens_with_ids,
        )

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

    def encode(self, s: str, allowed_special: bool | set[str] = True) -> list[int]:
        assert isinstance(s, str)
        subs = [
            s[i : i + TIKTOKEN_MAX_ENCODE_CHARS]
            for i in range(0, len(s), TIKTOKEN_MAX_ENCODE_CHARS)
        ]
        if allowed_special is True:
            allowed_special = self.tkt_model.special_tokens_set
        elif allowed_special is False:
            allowed_special = set()
        return sum(
            self.tkt_model.encode_batch(
                subs, allowed_special=allowed_special, disallowed_special=set()
            ),
            start=[],
        )

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
