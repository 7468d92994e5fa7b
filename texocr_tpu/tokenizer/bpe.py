"""Byte-level BPE tokenizer, bit-exact with the reference implementation.

Host-side pure Python (plus the ``regex`` module) — tokenization never runs on
TPU. Behaviour contract (verified by golden tests against the shipped
``tokenizer_clean_1k.txt``):

- 256-byte base vocabulary; merges assign ids 256, 257, ... in training order
  (reference tokenizer/tokenizer.py:83-108).
- Encoding repeatedly applies the lowest-ranked (earliest-trained) eligible
  merge until none applies (tokenizer.py:52-73).
- Pairs straddling a special-token id are never counted (tokenizer.py:34-36).
- ``RegexBPETokenizer`` pre-splits text with a GPT-4-style pattern; merges
  never cross split boundaries (tokenizer.py:139-170), and encoding first
  splits out special tokens by regex alternation (tokenizer.py:172-188).
- Training quirk preserved: per-split pair counts are combined with dict
  ``update`` (overwrite, NOT sum) across regex splits (tokenizer.py:153-155),
  so a retrain here reproduces the reference vocab exactly.
- Decoding decodes each token's bytes independently with errors='replace'
  and joins (tokenizer.py:222-238) — multi-byte UTF-8 sequences split across
  tokens intentionally degrade the same way the reference does.
- Save format is the reference's 3-line text file (vocab_size, special-token
  dict repr, merges dict repr; tokenizer.py:110-126). We parse it with
  ``ast.literal_eval`` instead of ``eval`` but read/write identical bytes.
"""

from __future__ import annotations

import ast
from typing import Dict, Iterable, List, Tuple

import regex as re

# GPT-4-style pre-split pattern (reference tokenizer.py:5).
SPLIT_PATTERN = (
    r"""'(?i:[sdmt]|ll|ve|re)|[^\r\n\p{L}\p{N}]?+\p{L}+| ?\p{N}{1,3}|"""
    r""" ?[^\s\p{L}\p{N}]++[\r\n]*|\s*[\r\n]|\s+(?!\S)|\s+"""
)

Pair = Tuple[int, int]


def _pair_counts(ids: List[int], skip_ids: Iterable[int]) -> Dict[Pair, int]:
    """Count adjacent id pairs, skipping any pair touching a special id
    (reference tokenizer.py:30-37)."""
    skip = set(skip_ids)
    counts: Dict[Pair, int] = {}
    prev = None
    for cur in ids:
        if prev is not None and prev not in skip and cur not in skip:
            pair = (prev, cur)
            counts[pair] = counts.get(pair, 0) + 1
        prev = cur
    return counts


def _apply_merge(ids: List[int], pair: Pair, new_id: int) -> List[int]:
    """Replace every non-overlapping left-to-right occurrence of ``pair``
    (reference tokenizer.py:39-50)."""
    out: List[int] = []
    i, n = 0, len(ids)
    first, second = pair
    while i < n:
        if i + 1 < n and ids[i] == first and ids[i + 1] == second:
            out.append(new_id)
            i += 2
        else:
            out.append(ids[i])
            i += 1
    return out


def _merge_until_done(
    ids: List[int], merges: Dict[Pair, int], skip_ids: Iterable[int]
) -> List[int]:
    """Apply the lowest-ranked eligible merge repeatedly (reference
    tokenizer.py:52-73). Rank = merge id; unseen pairs rank +inf."""
    while len(ids) >= 2:
        counts = _pair_counts(ids, skip_ids)
        if not counts:
            break
        best = min(counts, key=lambda p: merges.get(p, float("inf")))
        if best not in merges:
            break
        ids = _apply_merge(ids, best, merges[best])
    return ids


class BPETokenizer:
    """Plain byte-level BPE without regex pre-splitting (reference
    tokenizer.py:7-126)."""

    def __init__(self, vocab_size: int = 800):
        self.vocab_size = vocab_size
        self.special_tokens: Dict[str, int] = {}
        self.bp_merges: Dict[Pair, int] = {}
        self.vocab = self._build_vocab()

    def _build_vocab(self) -> Dict[int, bytes]:
        """Rebuild id -> bytes from merges + specials (reference tokenizer.py:16-28)."""
        vocab = {i: bytes([i]) for i in range(256)}
        for (a, b), tid in self.bp_merges.items():
            vocab[tid] = vocab[a] + vocab[b]
        for tok, tid in self.special_tokens.items():
            vocab[tid] = tok.encode("utf-8")
        return vocab

    # -- encode / decode ----------------------------------------------------

    def encode(self, text: str) -> List[int]:
        ids = list(text.encode("utf-8"))
        return _merge_until_done(ids, self.bp_merges, self.special_tokens.values())

    def decode(self, tokens: List[int]) -> str:
        """Joint byte decode, strict errors (reference tokenizer.py:75-77)."""
        return b"".join(self.vocab[t] for t in tokens).decode("utf-8")

    def decode_list(self, tokens: List[int]) -> List[str]:
        return [self.vocab[t].decode("utf-8") for t in tokens]

    # -- training ------------------------------------------------------------

    def train(self, text: str, verbose: bool = False) -> None:
        """Greedy most-frequent-pair merges (reference tokenizer.py:83-108)."""
        base = 256
        ids = list(text.encode("utf-8"))
        n_merges = self.vocab_size - base - len(self.special_tokens)
        merges: Dict[Pair, int] = {}
        for step in range(n_merges):
            counts = _pair_counts(ids, self.special_tokens.values())
            if not counts:
                break
            best = max(counts, key=counts.get)
            new_id = base + step
            ids = _apply_merge(ids, best, new_id)
            merges[best] = new_id
            if verbose:
                print(f"Training merge {step + 1}/{n_merges}: {best} -> {new_id}")
        self.bp_merges = merges
        self.vocab = self._build_vocab()

    # -- persistence (format-compatible with the reference) ------------------

    def save(self, path: str) -> None:
        """3-line text format (reference tokenizer.py:110-116)."""
        with open(path, "w") as f:
            f.write(f"{self.vocab_size}\n")
            f.write(f"{self.special_tokens}\n")
            f.write(f"{self.bp_merges}\n")

    def load(self, path: str) -> "BPETokenizer":
        """Reads the reference's save files; uses ast.literal_eval rather than
        eval() (reference tokenizer.py:118-126 uses eval — unsafe)."""
        with open(path, "r") as f:
            self.vocab_size = int(f.readline())
            self.special_tokens = ast.literal_eval(f.readline())
            self.bp_merges = ast.literal_eval(f.readline())
        if hasattr(self, "inv_special_tokens"):
            self.inv_special_tokens = {v: k for k, v in self.special_tokens.items()}
        self.vocab = self._build_vocab()
        return self


class RegexBPETokenizer(BPETokenizer):
    """BPE with regex pre-splitting and special-token handling — the class the
    whole system uses (reference tokenizer.py:129-238; used at dataset.py:130,
    ocr_model.py:74)."""

    def __init__(
        self,
        vocab_size: int = 800,
        pattern: str = SPLIT_PATTERN,
        special_tokens: Dict[str, int] | None = None,
    ):
        super().__init__(vocab_size)
        self.split_pattern = pattern
        self.re_pattern = re.compile(pattern)
        self.special_tokens = dict(special_tokens or {})
        self.inv_special_tokens = {v: k for k, v in self.special_tokens.items()}
        self.vocab = self._build_vocab()

    # -- encode ----------------------------------------------------------------

    def encode(self, text: str) -> List[int]:
        """Split out special tokens first, BPE-encode the rest
        (reference tokenizer.py:172-188)."""
        if not self.special_tokens:
            return self._encode_text(text)
        special_pattern = (
            "(" + "|".join(re.escape(tok) for tok in self.special_tokens) + ")"
        )
        ids: List[int] = []
        for chunk in re.split(special_pattern, text):
            if chunk in self.special_tokens:
                ids.append(self.special_tokens[chunk])
            else:
                ids.extend(self._encode_text(chunk))
        return ids

    def _encode_text(self, text: str) -> List[int]:
        ids: List[int] = []
        for split in re.findall(self.re_pattern, text):
            ids.extend(
                _merge_until_done(
                    list(split.encode("utf-8")),
                    self.bp_merges,
                    self.special_tokens.values(),
                )
            )
        return ids

    def encode_batch(self, texts: List[str]) -> List[List[int]]:
        """Encode many texts at once through the native C++ merge loop
        (texocr_tpu/tokenizer/native) — ONE FFI call for all regex splits of
        all texts, which is what makes it pay (per-string native calls lose
        to FFI overhead). Bit-exact with ``encode``; falls back to the pure
        Python path when the native library is unavailable or a text
        contains special tokens."""
        native = self._native_encoder()
        if native is None:
            return [self.encode(t) for t in texts]

        special_texts = (
            set()
            if not self.special_tokens
            else {t for t in texts if any(s in t for s in self.special_tokens)}
        )
        all_splits: List[bytes] = []
        spans: List[Tuple[int, int]] = []  # split-range per text
        for t in texts:
            if t in special_texts:
                spans.append((-1, -1))
                continue
            start = len(all_splits)
            all_splits.extend(
                s.encode("utf-8") for s in re.findall(self.re_pattern, t)
            )
            spans.append((start, len(all_splits)))

        ids_stream, offsets = native.encode_concat(all_splits)
        out: List[List[int]] = []
        for t, (lo, hi) in zip(texts, spans):
            if lo < 0:
                out.append(self.encode(t))  # special-token texts: slow path
            else:
                out.append(ids_stream[offsets[lo] : offsets[hi]].tolist())
        return out

    # -- native fast path ----------------------------------------------------

    _native_cache = None
    _native_for_merges = None

    def _native_encoder(self):
        """C++ merge-loop encoder (texocr_tpu/tokenizer/native). Only used
        when no merge id collides with a special-token id — the Python loop
        skips pairs touching special ids (bit-exactness guard); with the
        shipped vocab (merges 256..996, specials 997..999) there is no
        collision. Returns None to fall back to pure Python."""
        if self._native_for_merges is id(self.bp_merges):
            return self._native_cache
        self._native_for_merges = id(self.bp_merges)
        self._native_cache = None
        try:
            from texocr_tpu.tokenizer.native import (
                NativeBPEEncoder,
                native_available,
            )

            if native_available() and not (
                set(self.bp_merges.values()) & set(self.special_tokens.values())
            ):
                self._native_cache = NativeBPEEncoder(self.bp_merges)
        except Exception:
            self._native_cache = None
        return self._native_cache

    # -- decode ------------------------------------------------------------------

    def decode_list(self, tokens: List[int]) -> List[str]:
        """Per-token decode with errors='replace' (reference tokenizer.py:222-234).
        Raises on unknown ids like the reference."""
        pieces: List[bytes] = []
        for t in tokens:
            if t in self.inv_special_tokens:
                pieces.append(self.inv_special_tokens[t].encode("utf-8"))
            elif t in self.vocab:
                pieces.append(self.vocab[t])
            else:
                raise ValueError(f"Token {t} not found in vocabulary.")
        return [b.decode("utf-8", errors="replace") for b in pieces]

    def decode(self, tokens: List[int]) -> str:
        return "".join(self.decode_list(tokens))

    # -- training ----------------------------------------------------------------

    def train(self, text: str, verbose: bool = False) -> None:
        """Regex-split training. NOTE the preserved reference quirk: per-split
        stats are combined via dict.update (overwrite, not sum) each round
        (reference tokenizer.py:151-164) — deterministic, and required to
        reproduce the shipped vocab from the same corpus."""
        base = 256
        split_ids = [
            list(s.encode("utf-8")) for s in re.findall(self.re_pattern, text)
        ]
        n_merges = self.vocab_size - base - len(self.special_tokens)
        merges: Dict[Pair, int] = {}
        skip = self.special_tokens.values()
        for step in range(n_merges):
            stats: Dict[Pair, int] = {}
            for ids in split_ids:
                stats.update(_pair_counts(ids, skip))
            if not stats:
                break
            best = max(stats, key=stats.get)
            new_id = base + step
            split_ids = [_apply_merge(ids, best, new_id) for ids in split_ids]
            merges[best] = new_id
            if verbose:
                print(f"Training merge {step + 1}/{n_merges}: {best} -> {new_id}")
        self.bp_merges = merges
        self.vocab = self._build_vocab()


def load_special_tokens(path: str, vocab_size: int) -> Dict[str, int]:
    """Assign special-token ids top-down from vocab_size-1 in file line order
    (reference tokenizer.py:266-272): <PAD>=999, <BOS>=998, <EOS>=997 for the
    shipped 1k vocab."""
    specials: Dict[str, int] = {}
    with open(path, "r") as f:
        for i, line in enumerate(f):
            tok = line.strip()
            if tok:
                specials[tok] = vocab_size - i - 1
    return specials
