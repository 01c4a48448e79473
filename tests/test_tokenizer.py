"""Tokenizer unit tests (reference contract: tokenizer.py:72-166)."""

import numpy as np
import pytest


def test_special_token_layout(tiny_tokenizer):
    tk = tiny_tokenizer
    # Specials start right after the mergeable ranks.
    assert tk.get_token_id("<|begin_of_text|>") == tk.vocab_size
    # Semantic tokens are the last block of specials; begin/end span them.
    assert tk.semantic_begin_id == tk.get_token_id("<|semantic:0|>")
    assert tk.semantic_end_id == tk.get_token_id("<|semantic:47|>")
    assert tk.semantic_end_id - tk.semantic_begin_id == 47
    assert tk.num_special_tokens == 15 + 48
    assert tk.total_vocab_size == 256 + 15 + 48


def test_semantic_id_mapping(tiny_tokenizer):
    tk = tiny_tokenizer
    for sem_id in (0, 1, 47):
        tok_id = tk.semantic_id_to_token_id[sem_id]
        assert tok_id == tk.semantic_begin_id + sem_id


def test_encode_decode_roundtrip(tiny_tokenizer):
    tk = tiny_tokenizer
    s = "Hello, world! 123"
    toks = tk.encode(s)
    assert all(isinstance(t, int) for t in toks)
    assert tk.decode(toks) == s


def test_special_tokens_encode_as_single_ids(tiny_tokenizer):
    tk = tiny_tokenizer
    toks = tk.encode("<|im_end|>")
    assert toks == [tk.get_token_id("<|im_end|>")]
    toks = tk.encode("<|interleave|>")
    assert toks == [tk.get_token_id("<|interleave|>")]


def test_im_end_property(tiny_tokenizer):
    assert tiny_tokenizer.im_end_id == tiny_tokenizer.get_token_id("<|im_end|>")


def test_real_vocab_constants():
    """The full special-token list matches the reference layout
    (tokenizer.py:26-69): 15 control tokens then 4096 semantic tokens."""
    from fish_tts_tpu.models.tokenizer import ALL_SPECIAL_TOKENS

    assert len(ALL_SPECIAL_TOKENS) == 15 + 4096
    assert ALL_SPECIAL_TOKENS[15] == "<|semantic:0|>"
    assert ALL_SPECIAL_TOKENS[-1] == "<|semantic:4095|>"
