"""Host-side BPE tokenizer (bit-exact with the reference; see bpe.py)."""

import os

from texocr_tpu.tokenizer.bpe import (  # noqa: F401
    SPLIT_PATTERN,
    BPETokenizer,
    RegexBPETokenizer,
    load_special_tokens,
)

_VOCAB_DIR = os.path.join(os.path.dirname(__file__), "vocab")

#: Path to the shipped 1000-token LaTeX BPE vocabulary (reference
#: tokenizer/tokenizer_clean_1k.txt, shipped verbatim as data).
DEFAULT_VOCAB_PATH = os.path.join(_VOCAB_DIR, "tokenizer_clean_1k.txt")

#: Path to the shipped special-token list (<PAD>, <BOS>, <EOS>).
DEFAULT_SPECIAL_TOKENS_PATH = os.path.join(_VOCAB_DIR, "special_tokens.txt")


def load_default_tokenizer() -> RegexBPETokenizer:
    """The shipped 1k-vocab tokenizer: specials {<PAD>:999, <BOS>:998, <EOS>:997}."""
    tok = RegexBPETokenizer()
    tok.load(DEFAULT_VOCAB_PATH)
    return tok
