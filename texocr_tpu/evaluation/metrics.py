"""Sequence metrics, computed on the host in numpy.

``batch_acc`` reproduces the reference metric exactly (reference
eval/eval.py:3-33): pad the shorter of pred/target with PAD to equal length,
build the union mask of non-pad positions, per-row token accuracy over that
mask, mean over the batch. ``exact_match_rate`` is the stricter north-star
metric (every non-pad token equal).

Host numpy on purpose: these run on already-decoded token ids after the
device sync, and every (pred_len, target_len) pair would otherwise compile
its own tiny device executable — wasted latency (and an observed source of
spurious backend compile errors) for elementwise compares the host does in
microseconds. Device inputs are accepted; they're pulled with np.asarray.
"""

from __future__ import annotations

import numpy as np


def _pad_to_common(pred, target, pad_token: int):
    pred = np.asarray(pred)
    target = np.asarray(target)
    lp, lt = pred.shape[1], target.shape[1]
    if lp < lt:
        pred = np.pad(pred, ((0, 0), (0, lt - lp)), constant_values=pad_token)
    elif lt < lp:
        target = np.pad(target, ((0, 0), (0, lp - lt)), constant_values=pad_token)
    return pred, target


def batch_acc(pred, target, pad_token: int) -> float:
    """Mean per-row token accuracy over the union non-pad mask."""
    pred, target = _pad_to_common(pred, target, pad_token)
    mask = (pred != pad_token) | (target != pad_token)
    seq_lens = np.maximum(mask.sum(axis=1), 1)
    correct = ((pred == target) & mask).sum(axis=1)
    return float(np.mean(correct.astype(np.float32) / seq_lens.astype(np.float32)))


def exact_match_rate(pred, target, pad_token: int) -> float:
    """Fraction of rows whose entire union-masked token sequence matches."""
    pred, target = _pad_to_common(pred, target, pad_token)
    mask = (pred != pad_token) | (target != pad_token)
    row_ok = np.all((pred == target) | ~mask, axis=1)
    return float(np.mean(row_ok.astype(np.float32)))


def edit_similarity(pred, target, pad_token: int) -> float:
    """Mean normalized edit similarity: 1 - levenshtein(pred_row, target_row)
    / max(len_pred, len_target), averaged over rows (host-side numpy; runs on
    already-decoded id sequences, not on device).

    Why it exists: the reference's batch_acc (eval/eval.py:3-33) is
    position-aligned, so one inserted or dropped token zeroes the rest of a
    long row — free-running decodes that read 90%+ of the glyphs can score
    near 0. Edit similarity is alignment-robust and complements exact-match.
    Not a reference metric; reported alongside, never instead.
    """
    pred = np.asarray(pred)
    target = np.asarray(target)
    sims = []
    for p_row, t_row in zip(pred, target):
        p = p_row[p_row != pad_token].astype(np.int64)
        t = t_row[t_row != pad_token].astype(np.int64)
        if not len(p) and not len(t):
            sims.append(1.0)
            continue
        if len(p) and t.shape == p.shape and (p == t).all():
            sims.append(1.0)
            continue
        # Two-row Levenshtein DP with the inner loop vectorized: the
        # deletion/substitution candidates are elementwise in prev; the
        # insertion closure cur[j] = min_{k<=j}(cand[k] + (j - k)) is a
        # running min of (cand - arange) plus arange. O(len_p) numpy ops of
        # width len_t instead of a pure-Python double loop — the eval hot
        # loop runs this per batch at 100-300-token rows.
        m = len(t)
        ar = np.arange(m + 1)
        prev = ar.copy()
        for i, a in enumerate(p, 1):
            cand = np.empty(m + 1, np.int64)
            cand[0] = i
            cand[1:] = np.minimum(prev[1:] + 1, prev[:-1] + (t != a))
            prev = np.minimum.accumulate(cand - ar) + ar
        sims.append(1.0 - prev[-1] / max(len(p), len(t)))
    return float(np.mean(sims)) if sims else 0.0
