"""Prompt-assembly tests: golden (1+K, T) matrices per the reference
algorithm (inference.py:467-640, 779-795)."""

import numpy as np
import pytest

from fish_tts_tpu.models.prompt import ContentSequence, TextPart, VQPart, build_prompt

K = 4  # num_codebooks of TINY_CONFIG


def test_plain_text_prompt(tiny_tokenizer):
    tk = tiny_tokenizer
    enc = build_prompt(tk, "hi", num_codebooks=K)
    v = enc.values
    assert v.shape[0] == K + 1
    # layout: <|interleave|> <|speaker:0|> ...text...
    assert v[0, 0] == tk.get_token_id("<|interleave|>")
    # speaker tag is not a special token; it byte-encodes like the reference.
    assert list(v[0, 1:]) == tk.encode("<|speaker:0|>") + tk.encode("hi")
    # no VQ rows set
    assert (v[1:] == 0).all()
    assert not enc.vq_mask.any()


def test_prompt_with_reference(tiny_tokenizer):
    tk = tiny_tokenizer
    codes = np.arange(K * 3).reshape(K, 3) % 8  # (K, 3)
    enc = build_prompt(
        tk, "x", num_codebooks=K, prompt_texts=["ref"], prompt_codes=[codes]
    )
    v = enc.values
    T = v.shape[1]

    # Find the VQ span via the mask
    assert enc.vq_mask.sum() == 3
    vq_cols = np.where(enc.vq_mask)[0]
    # Row 0 at VQ positions = semantic_begin + code row 0 (inference.py:631-633)
    np.testing.assert_array_equal(
        v[0, vq_cols], codes[0] + tk.semantic_begin_id
    )
    # Rows 1..K at VQ positions hold all K code rows (inference.py:634)
    np.testing.assert_array_equal(v[1:, vq_cols], codes)

    # im_end closes the reference block (append add_end=True)
    im_end = tk.get_token_id("<|im_end|>")
    assert v[0, vq_cols[-1] + 1] == im_end
    # structure: interleave, speaker, "ref", codes, im_end, speaker, "x"
    assert v[0, 0] == tk.get_token_id("<|interleave|>")


def test_vq_rows_zero_outside_mask(tiny_tokenizer):
    tk = tiny_tokenizer
    codes = np.ones((K, 5), dtype=np.int64)
    enc = build_prompt(
        tk, "abc", num_codebooks=K, prompt_texts=["r"], prompt_codes=[codes]
    )
    v = enc.values
    outside = ~enc.vq_mask
    assert (v[1:, outside] == 0).all()


def test_modality_token_not_duplicated(tiny_tokenizer):
    tk = tiny_tokenizer
    seq = ContentSequence(
        parts=[TextPart(text="<|interleave|>already")], modality="interleave"
    )
    assert isinstance(seq.parts[0], TextPart)
    assert seq.parts[0].text.startswith("<|interleave|>")
    assert len([p for p in seq.parts if isinstance(p, TextPart) and p.text and p.text.startswith("<|interleave|>")]) == 1


def test_vq_part_shape_validation(tiny_tokenizer):
    import pytest

    seq = ContentSequence(modality="interleave")
    seq.append([VQPart(codes=np.zeros((K + 1, 4)))])
    with pytest.raises(ValueError):
        seq.encode_for_inference(tiny_tokenizer, num_codebooks=K)


def test_multiple_references_concatenate(tiny_tokenizer):
    tk = tiny_tokenizer
    c1 = np.full((K, 2), 1)
    c2 = np.full((K, 3), 2)
    enc = build_prompt(
        tk, "t", num_codebooks=K,
        prompt_texts=["a", "b"], prompt_codes=[c1, c2],
    )
    assert enc.vq_mask.sum() == 5
    vq_cols = np.where(enc.vq_mask)[0]
    np.testing.assert_array_equal(
        enc.values[1:, vq_cols], np.concatenate([c1, c2], axis=1)
    )


# ---------------------------------------------------------------------------
# Training-mode encode (labels) — reference inference.py:523-609
# ---------------------------------------------------------------------------


def test_encode_labels_and_shift(tiny_tokenizer):
    """Golden check of the training surface: tokens/labels with the
    next-token shift, cal_loss gating, and the -100 ignore index."""
    from fish_tts_tpu.models.prompt import IGNORE_INDEX

    tk = tiny_tokenizer
    codes = (np.arange(K * 3).reshape(K, 3) % 8).astype(np.int64)
    seq = ContentSequence(modality="interleave")
    seq.append(
        [TextPart(text="ab", cal_loss=False), VQPart(codes=codes, cal_loss=True)],
        add_end=True, speaker=0,
    )
    enc = seq.encode(tk, add_shift=False)

    # unshifted golden layout
    toks_expected = (
        [tk.get_token_id("<|interleave|>")]
        + tk.encode("<|speaker:0|>")
        + tk.encode("ab")
        + list(codes[0] + tk.semantic_begin_id)
        + [tk.im_end_id]
    )
    np.testing.assert_array_equal(enc.tokens, toks_expected)
    # labels: IGNORE everywhere except the VQ part and the im_end that
    # inherits the preceding part's cal_loss (reference append(),
    # inference.py:517-519)
    n_head = 1 + len(tk.encode("<|speaker:0|>")) + len(tk.encode("ab"))
    assert (enc.labels[:n_head] == IGNORE_INDEX).all()
    np.testing.assert_array_equal(
        enc.labels[n_head:n_head + 3], codes[0] + tk.semantic_begin_id
    )
    assert enc.labels[-1] == tk.im_end_id  # im_end inherited cal_loss=True
    # masks mark exactly the VQ span
    assert enc.vq_mask_tokens.sum() == 3
    assert list(np.where(enc.vq_mask_tokens)[0]) == list(
        range(n_head, n_head + 3)
    )
    # vq payloads
    assert len(enc.vq_parts) == 1
    np.testing.assert_array_equal(enc.vq_parts[0], codes)
    np.testing.assert_array_equal(enc.vq_require_losses, [True])
    assert enc.audio_parts == [] and not enc.audio_masks.any()

    # shifted variant: tokens drop the last, labels drop the first, and the
    # two masks diverge by one position (inference.py:599-605)
    sh = seq.encode(tk, add_shift=True)
    np.testing.assert_array_equal(sh.tokens, enc.tokens[:-1])
    np.testing.assert_array_equal(sh.labels, enc.labels[1:])
    np.testing.assert_array_equal(sh.vq_mask_tokens, enc.vq_mask_tokens[:-1])
    np.testing.assert_array_equal(sh.vq_mask_labels, enc.vq_mask_tokens[1:])


def test_encode_ignore_loss_tokens(tiny_tokenizer):
    """ignore_loss_tokens force matching label ids to IGNORE_INDEX even when
    their part had cal_loss=True (reference inference.py:595-596)."""
    from fish_tts_tpu.models.prompt import IGNORE_INDEX

    tk = tiny_tokenizer
    seq = ContentSequence()
    seq.append([TextPart(text="xy", cal_loss=True)], add_end=True)
    enc = seq.encode(tk, add_shift=False, ignore_loss_tokens=["<|im_end|>"])
    assert enc.labels[-1] == IGNORE_INDEX  # the im_end label was scrubbed
    assert (enc.labels[:-1] == enc.tokens[:-1]).all()


def test_encode_for_inference_consistency(tiny_tokenizer):
    """The inference projection is the unshifted encode's token row — the
    two surfaces must agree on layout (reference encode_for_inference calls
    encode(add_shift=False), inference.py:611-617)."""
    tk = tiny_tokenizer
    codes = np.ones((K, 4), dtype=np.int64) * 2
    seq = ContentSequence(modality="interleave")
    seq.append([TextPart(text="t"), VQPart(codes=codes)], add_end=True, speaker=0)
    msg = seq.encode(tk, add_shift=False)
    inf = seq.encode_for_inference(tk, num_codebooks=K)
    np.testing.assert_array_equal(inf.values[0], msg.tokens)
    np.testing.assert_array_equal(inf.vq_mask, msg.vq_mask_tokens)


def test_encode_rejects_malformed_vq_codes(tiny_tokenizer):
    """1-D codes raise a clear ValueError (not a TypeError deep inside),
    and mixed codebook counts within one sequence are rejected."""
    seq = ContentSequence([VQPart(codes=np.array([1, 2, 3]))])
    with pytest.raises(ValueError, match="num_codebooks"):
        seq.encode(tiny_tokenizer)

    seq2 = ContentSequence([
        VQPart(codes=np.zeros((K, 2), np.int64)),
        VQPart(codes=np.zeros((K + 1, 2), np.int64)),
    ])
    with pytest.raises(ValueError, match="codebook counts differ"):
        seq2.encode(tiny_tokenizer)


def test_append_add_end_on_empty_sequence_raises():
    """append([], add_end=True) on an empty sequence has no part to inherit
    cal_loss from — must be a clear error, not IndexError."""
    seq = ContentSequence(modality=None)
    with pytest.raises(ValueError, match="empty sequence"):
        seq.append([], add_end=True)
