"""Sequence metrics, as pure jnp functions.

``batch_acc`` reproduces the reference metric exactly (reference
eval/eval.py:3-33): pad the shorter of pred/target with PAD to equal length,
build the union mask of non-pad positions, per-row token accuracy over that
mask, mean over the batch. ``exact_match_rate`` is the stricter north-star
metric (every non-pad token equal).
"""

from __future__ import annotations

import jax.numpy as jnp


def _pad_to_common(pred: jnp.ndarray, target: jnp.ndarray, pad_token: int):
    lp, lt = pred.shape[1], target.shape[1]
    if lp < lt:
        pred = jnp.pad(pred, ((0, 0), (0, lt - lp)), constant_values=pad_token)
    elif lt < lp:
        target = jnp.pad(target, ((0, 0), (0, lp - lt)), constant_values=pad_token)
    return pred, target


def batch_acc(pred: jnp.ndarray, target: jnp.ndarray, pad_token: int) -> jnp.ndarray:
    """Mean per-row token accuracy over the union non-pad mask."""
    pred, target = _pad_to_common(pred, target, pad_token)
    mask = (pred != pad_token) | (target != pad_token)
    seq_lens = jnp.maximum(mask.sum(axis=1), 1)
    correct = ((pred == target) & mask).sum(axis=1)
    return jnp.mean(correct.astype(jnp.float32) / seq_lens.astype(jnp.float32))


def exact_match_rate(
    pred: jnp.ndarray, target: jnp.ndarray, pad_token: int
) -> jnp.ndarray:
    """Fraction of rows whose entire union-masked token sequence matches."""
    pred, target = _pad_to_common(pred, target, pad_token)
    mask = (pred != pad_token) | (target != pad_token)
    row_ok = jnp.all((pred == target) | ~mask, axis=1)
    return jnp.mean(row_ok.astype(jnp.float32))


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
    import numpy as np

    pred = np.asarray(pred)
    target = np.asarray(target)
    sims = []
    for p_row, t_row in zip(pred, target):
        p = [int(t) for t in p_row if t != pad_token]
        t = [int(x) for x in t_row if x != pad_token]
        if not p and not t:
            sims.append(1.0)
            continue
        # Single-row Levenshtein, two-row DP.
        prev = list(range(len(t) + 1))
        for i, a in enumerate(p, 1):
            cur = [i] + [0] * len(t)
            for j, b in enumerate(t, 1):
                cur[j] = min(
                    prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (a != b)
                )
            prev = cur
        sims.append(1.0 - prev[-1] / max(len(p), len(t)))
    return float(np.mean(sims)) if sims else 0.0
