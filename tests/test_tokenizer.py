"""Tokenizer bit-exactness vs goldens generated from the PyTorch reference."""

import json
import os

import pytest

from texocr_tpu.tokenizer import (
    DEFAULT_SPECIAL_TOKENS_PATH,
    RegexBPETokenizer,
    load_default_tokenizer,
    load_special_tokens,
)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _goldens(name):
    with open(os.path.join(GOLDEN_DIR, name)) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def tok():
    return load_default_tokenizer()


def test_vocab_metadata(tok):
    assert tok.vocab_size == 1000
    assert tok.special_tokens == {"<PAD>": 999, "<BOS>": 998, "<EOS>": 997}
    assert len(tok.bp_merges) == 741


def test_encode_decode_goldens(tok):
    for case in _goldens("tokenizer_encode.json"):
        ids = tok.encode(case["text"])
        assert ids == case["ids"], f"encode mismatch for {case['text']!r}"
        assert tok.decode(ids) == case["decoded"]
        assert tok.decode_list(ids) == case["decoded_list"]


def test_round_trip(tok):
    s = r"\int _ { 0 } ^ { 1 } x ^ 2 d x"
    assert tok.decode(tok.encode(s)) == s


def test_unknown_token_raises(tok):
    with pytest.raises(ValueError):
        tok.decode([123456])


def test_special_token_assignment():
    specials = load_special_tokens(DEFAULT_SPECIAL_TOKENS_PATH, 1000)
    assert specials == {"<PAD>": 999, "<BOS>": 998, "<EOS>": 997}


def test_train_parity_with_reference():
    """Retraining on the same mini corpus reproduces the reference's merges,
    including the stats.update overwrite quirk (reference tokenizer.py:153-155)."""
    golden = _goldens("tokenizer_train.json")
    samples = [c["text"] for c in _goldens("tokenizer_encode.json") if c["text"]]
    corpus = "\n".join(samples) * golden["corpus_repeats"]
    t = RegexBPETokenizer(
        vocab_size=golden["vocab_size"],
        special_tokens={k: v for k, v in golden["special_tokens"].items()},
    )
    t.train(corpus)
    expected = {tuple(k): v for k, v in golden["merges"]}
    assert t.bp_merges == expected


def test_save_load_round_trip(tok, tmp_path):
    path = tmp_path / "tok.txt"
    tok.save(str(path))
    # Byte-identical to the shipped file it was loaded from.
    from texocr_tpu.tokenizer import DEFAULT_VOCAB_PATH

    assert path.read_bytes() == open(DEFAULT_VOCAB_PATH, "rb").read()
    reloaded = RegexBPETokenizer().load(str(path))
    assert reloaded.bp_merges == tok.bp_merges
    assert reloaded.special_tokens == tok.special_tokens


def test_encode_batch_matches_encode(tok):
    """The native C++ batched encoder is bit-exact with the Python loop,
    including special-token fallback texts."""
    texts = [c["text"] for c in _goldens("tokenizer_encode.json")]
    assert tok.encode_batch(texts) == [tok.encode(t) for t in texts]


def test_native_encoder_availability():
    # The toolchain is present in this image; if this fails the build broke.
    from texocr_tpu.tokenizer.native import native_available

    assert native_available()
