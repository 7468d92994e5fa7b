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
