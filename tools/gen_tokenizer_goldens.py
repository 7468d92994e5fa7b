"""Generate tokenizer parity goldens from the PyTorch reference.

Run once on a machine with /root/reference mounted; outputs JSON goldens under
tests/goldens/ which the (hermetic) test suite compares against. The reference
tokenizer is pure Python + regex, so this does not need torch.
"""

import importlib.util
import json
import os
import sys

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")
REF = "/root/reference"

# Load the reference tokenizer module directly (avoids the TeXOCR package
# import machinery, which needs the parent dir on PYTHONPATH).
spec = importlib.util.spec_from_file_location(
    "ref_tokenizer", os.path.join(REF, "tokenizer", "tokenizer.py")
)
ref_tok = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ref_tok)

SAMPLES = [
    r"\int _ { 0 } ^ { 1 } x ^ 2 d x",
    r"\frac { a + b } { c - d } = \sqrt { e ^ { i \pi } + 1 }",
    r"\sum _ { n = 1 } ^ { \infty } \frac { 1 } { n ^ 2 } = \frac { \pi ^ 2 } { 6 }",
    r"\alpha \beta \gamma \delta \epsilon \zeta \eta \theta",
    r"x y z 0 1 2 3 4 5 6 7 8 9",
    r"\mathbb { R } ^ { n } \to \mathbb { C } ^ { m }",
    r"\left( \begin{matrix} a & b \\ c & d \end{matrix} \right)",
    r"e = m c ^ { 2 }",
    r"\lim _ { x \to 0 } \frac { \sin x } { x } = 1",
    r"\nabla \cdot \vec { E } = \frac { \rho } { \varepsilon _ 0 }",
    "",
    " ",
    "plain text with 'contractions' isn't unusual, you're right",
    "unicode: ü ñ λ → ∀x∈ℝ",
    r"<BOS>\int x dx<EOS><PAD><PAD>",  # special tokens embedded in text
]


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    tok = ref_tok.RegExTokenizer()
    tok.load(os.path.join(REF, "tokenizer", "tokenizer_clean_1k.txt"))

    encode_goldens = []
    for s in SAMPLES:
        ids = tok.encode(s)
        encode_goldens.append(
            {
                "text": s,
                "ids": ids,
                "decoded": tok.decode(ids),
                "decoded_list": tok.decode_list(ids),
            }
        )

    # Small training-parity golden: train a 300-token vocab on a mini corpus
    # with specials, record the merges dict (training quirks included).
    corpus = "\n".join(s for s in SAMPLES if s) * 20
    specials = {"<PAD>": 299, "<BOS>": 298, "<EOS>": 297}
    trainer = ref_tok.RegExTokenizer(vocab_size=300, special_tokens=specials)
    trainer.train(corpus)
    train_golden = {
        "vocab_size": 300,
        "special_tokens": specials,
        "corpus_repeats": 20,
        "merges": [[list(k), v] for k, v in trainer.bp_merges.items()],
    }

    with open(os.path.join(GOLDEN_DIR, "tokenizer_encode.json"), "w") as f:
        json.dump(encode_goldens, f, indent=1)
    with open(os.path.join(GOLDEN_DIR, "tokenizer_train.json"), "w") as f:
        json.dump(train_golden, f, indent=1)
    print(f"wrote {len(encode_goldens)} encode goldens + train golden")


if __name__ == "__main__":
    sys.exit(main())
