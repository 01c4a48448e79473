"""Native C++ BPE encoder: token-for-token parity with tiktoken.

The native path (fish_tts_tpu/native/bpe.cc) re-implements the reference's
tiktoken split pattern (/root/reference/fish_tts/models/tokenizer.py:11-22)
— including the literal ``(\\?!\\S)`` quirk — and the byte-pair merge.  These
tests drive both engines over the same inputs and require exact id equality.
Skipped wholesale when the library can't be built (no g++)."""

import random

import pytest

from fish_tts_tpu.models.tokenizer import FISH_TIKTOKEN_PATTERN
from fish_tts_tpu.native.bpe import load_native_bpe

BYTE_RANKS = {bytes([i]): i for i in range(256)}

pytestmark = pytest.mark.skipif(
    load_native_bpe(BYTE_RANKS) is None,
    reason="native BPE library unavailable (no g++ toolchain?)",
)


def _merged_ranks(seed=0, n_merges=2000):
    """Byte vocab + pseudo-random merges, to exercise merge order and ties."""
    ranks = dict(BYTE_RANKS)
    rng = random.Random(seed)
    keys = list(ranks)
    nxt = 256
    for _ in range(n_merges):
        m = rng.choice(keys) + rng.choice(keys)
        if len(m) <= 8 and m not in ranks:
            ranks[m] = nxt
            keys.append(m)
            nxt += 1
    return ranks


@pytest.fixture(scope="module")
def engines():
    import tiktoken

    ranks = _merged_ranks()
    tkt = tiktoken.core.Encoding(
        name="parity", pat_str=FISH_TIKTOKEN_PATTERN,
        mergeable_ranks=ranks, special_tokens={},
    )
    nat = load_native_bpe(ranks)
    return tkt, nat


CORPUS = [
    "",
    " ",
    "\n",
    "\t\t",
    "hello world",
    "The theory of THE THEORY",
    "it's Bob's, IT'S",
    "don't we'll I'm you're we've they'd 'q",
    "don’t",  # curly apostrophe is \p{P}, not alternative 1
    "ſs 'ſ",  # U+017F long s case-folds to 's' under (?i:)
    "123 4,5.6 9999999",
    "mixed123abc x2y",
    "  leading and   internal   runs",
    "line1\nline2\r\n\r\n end",
    "  \n\n  x",  # \s*[\r\n]+ backtracks to the last newline
    "wait  ?!now",  # the literal "?!" quirk: "\s+?!\S" is one piece
    "wait ?! now",  # trailing space after ?! -> quirk does NOT match
    "?!x ?! !?",
    "$100.50 €5 £3",
    "(paren) [brack] {brace} a-b_c",
    'quote "q" \'single\'',
    "héllo wörld àççénts",
    "日本語のテキストです。",
    "中文文本，带标点！",
    "русский текст с пробелами",
    "مرحبا بالعالم",
    "한국어 텍스트",
    "emoji 😀👍🏽 done",
    "　ideographic space line sep para sep nbsp",
    "。、「」！？～",
    "a" * 300,
    ("word " * 120).strip(),
    "tab\tand thin spaces",
]


def test_corpus_parity(engines):
    tkt, nat = engines
    for text in CORPUS:
        assert nat.encode_ordinary(text) == tkt.encode(text), repr(text)


def test_random_unicode_fuzz(engines):
    """Seeded full-range scalar fuzz: catches Unicode table drift between the
    generated header and tiktoken's regex engine (the tables are probed from
    tiktoken by gen_unicode_tables.py, so this should stay exact)."""
    tkt, nat = engines
    rng = random.Random(1234)
    for _ in range(1500):
        n = rng.randint(1, 32)
        s = ""
        while len(s) < n:
            c = rng.randint(0, 0x10FFFF)
            if 0xD800 <= c <= 0xDFFF:
                continue
            s += chr(c)
        assert nat.encode_ordinary(s) == tkt.encode(s), [
            hex(ord(c)) for c in s
        ]


def test_random_ascii_whitespace_fuzz(engines):
    """Dense fuzz over the characters the pattern's alternatives fight over
    (whitespace/newline/?!/digit/letter boundaries)."""
    tkt, nat = engines
    rng = random.Random(99)
    pool = list(" \t\n\r?!.,;:'\"abcDEF0123  \n\r")
    for _ in range(3000):
        s = "".join(rng.choice(pool) for _ in range(rng.randint(0, 24)))
        assert nat.encode_ordinary(s) == tkt.encode(s), repr(s)


def test_tokenizer_uses_native_in_auto_mode(tiny_tokenizer):
    assert tiny_tokenizer._native is not None, (
        "FishTokenizer should pick the native BPE on this toolchain"
    )


def test_tokenizer_native_matches_tiktoken_with_specials(tiny_tokenizer):
    tk = tiny_tokenizer
    texts = [
        "Hello <|im_end|> world",
        "<|interleave|><|speaker:0|>text<|semantic:0|><|semantic:47|>",
        "no specials at all",
        "adjacent<|im_end|><|im_end|>pairs",
        "unknown <|not_a_special|> stays text",
    ]
    for text in texts:
        native_ids = tk.encode(text)
        tkt_ids = tk.tkt_model.encode(
            text, allowed_special=tk.tkt_model.special_tokens_set,
            disallowed_special=set(),
        )
        assert native_ids == tkt_ids, repr(text)
        assert tk.decode(native_ids) == tk.decode(tkt_ids)


def test_tokenizer_allowed_special_subset(tiny_tokenizer):
    """A non-allowed special must flow into ordinary text (tiktoken's
    ``disallowed_special=set()`` behavior), not raise and not split."""
    tk = tiny_tokenizer
    text = "a <|im_end|> b <|pad|> c"
    allowed = {"<|im_end|>"}
    native_ids = tk.encode(text, allowed_special=allowed)
    tkt_ids = tk.tkt_model.encode(
        text, allowed_special=allowed, disallowed_special=set()
    )
    assert native_ids == tkt_ids
    assert tk.get_token_id("<|pad|>") not in native_ids
    assert tk.get_token_id("<|im_end|>") in native_ids


def test_whole_piece_vocab_hit(engines):
    """A piece present verbatim in the vocab encodes as one id."""
    tkt, nat = engines
    # find some multi-byte rank in the merged vocab and use its bytes
    import tiktoken  # noqa: F401

    ranks = _merged_ranks()
    multi = next(k for k in ranks if len(k) >= 3 and k.isascii())
    try:
        text = multi.decode("utf-8")
    except UnicodeDecodeError:
        pytest.skip("no decodable multi-byte token in the toy vocab")
    assert nat.encode_ordinary(text) == tkt.encode(text)


def test_build_is_cached():
    from fish_tts_tpu.native.bpe import build_library

    p1 = build_library()
    p2 = build_library()
    assert p1 == p2 and p1.exists()


def test_cache_dir_honors_repo_cache_root(monkeypatch, tmp_path):
    """The build cache lives under the repo's one cache knob
    (FISH_TTS_TPU_CACHE_DIR), not a second divergent root."""
    from pathlib import Path

    from fish_tts_tpu.native import bpe as bpe_mod

    monkeypatch.setenv("FISH_TTS_TPU_CACHE_DIR", str(tmp_path))
    assert bpe_mod._cache_dir() == tmp_path / "native"
    # "" disables the XLA cache but just means default here
    monkeypatch.setenv("FISH_TTS_TPU_CACHE_DIR", "")
    assert bpe_mod._cache_dir() == (
        Path.home() / ".cache" / "fish-tts-tpu" / "native"
    )


def test_allowed_special_unknown_entry_ignored(tiny_tokenizer):
    """allowed_special entries that are not registered specials must be
    ignored on both engines — tiktoken never matches them; the native split
    regex must not build them in (it would KeyError on the id lookup)."""
    tk = tiny_tokenizer
    text = "hello foo <|im_end|> bar foo"
    ids = tk.encode(text, allowed_special={"foo", "<|im_end|>"})
    ref = tk.tkt_model.encode(
        text, allowed_special={"<|im_end|>"}, disallowed_special=set()
    )
    assert ids == ref
    assert tk.decode(ids) == text


def test_invalid_bpe_mode_rejected(tiny_vocab_path, monkeypatch):
    """A typo'd FISH_TTS_TPU_BPE must raise, not silently fall back to
    tiktoken and lose the strict-native guarantee."""
    from fish_tts_tpu.models.tokenizer import FishTokenizer, tiny_special_tokens

    monkeypatch.setenv("FISH_TTS_TPU_BPE", "Native")
    with pytest.raises(ValueError, match="FISH_TTS_TPU_BPE"):
        FishTokenizer(tiny_vocab_path, tiny_special_tokens(num_semantic=48))


def test_malformed_utf8_rejected_at_c_abi():
    """Overlong encodings, surrogates, out-of-range codepoints, bare
    continuation bytes, and truncated sequences all return -1 at the C ABI
    (unreachable via str.encode — exercised with raw bytes)."""
    import ctypes

    nat = load_native_bpe(BYTE_RANKS)
    bad_inputs = [
        b"\xc0\x80",              # overlong NUL
        b"\xe0\x80\xaf",          # overlong 3-byte
        b"\xf0\x80\x80\x80",      # overlong 4-byte
        b"\xed\xa0\x80",          # UTF-8-encoded surrogate U+D800
        b"\xf7\xbf\xbf\xbf",      # codepoint 0x1FFFFF > U+10FFFF
        b"\xf4\x90\x80\x80",      # 0x110000, first past the Unicode range
        b"\x80",                  # bare continuation byte
        b"\xc2",                  # truncated 2-byte sequence
        b"ok\xc0\x80",            # valid prefix then malformed
    ]
    for bad in bad_inputs:
        out = ctypes.POINTER(ctypes.c_uint32)()
        n = nat._lib.ft_bpe_encode(nat._handle, bad, len(bad),
                                   ctypes.byref(out))
        assert n == -1, bad
    # the handle still encodes valid input afterwards
    assert nat.encode_ordinary("ok") == [ord("o"), ord("k")]
    # boundary cases that must PASS strict validation
    for good in ("퟿", "", "\U0010ffff", "߿", "ࠀ"):
        assert nat.encode_ordinary(good) == list(good.encode("utf-8"))
