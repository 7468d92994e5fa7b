"""batch_acc reference semantics + exact match."""

import jax.numpy as jnp
import numpy as np

from texocr_tpu.evaluation import batch_acc, exact_match_rate


def test_batch_acc_reference_example():
    # The reference's own inline example (reference eval/eval.py:36-42):
    # row0 perfect (8/8), row1 matches 4 of the union-mask 8 -> mean 0.75.
    pred = jnp.array([[1, 2, 3, 4, 5, 6, 7, 8], [1, 2, 3, 4, 5, 6, 7, 8]])
    target = jnp.array([[1, 2, 3, 4, 5, 6, 7, 8], [1, 2, 3, 4, 6, 999, 999, 999]])
    acc = batch_acc(pred, target, pad_token=999)
    np.testing.assert_allclose(float(acc), 0.75)


def test_batch_acc_length_mismatch():
    # Shorter side padded with PAD (reference eval/eval.py:9-17).
    pred = jnp.array([[1, 2, 3]])
    target = jnp.array([[1, 2, 3, 999, 999]])
    assert float(batch_acc(pred, target, pad_token=999)) == 1.0
    target2 = jnp.array([[1, 2, 3, 7, 999]])
    np.testing.assert_allclose(
        float(batch_acc(pred, target2, pad_token=999)), 3 / 4
    )


def test_exact_match():
    pred = jnp.array([[1, 2, 997, 999], [1, 2, 3, 997]])
    target = jnp.array([[1, 2, 997, 999], [1, 2, 4, 997]])
    np.testing.assert_allclose(
        float(exact_match_rate(pred, target, pad_token=999)), 0.5
    )


def test_edit_similarity():
    from texocr_tpu.evaluation.metrics import edit_similarity

    # Identity -> 1.0; one dropped token in a 5-token row -> 1 - 1/5.
    pred = jnp.array([[1, 2, 3, 4, 5], [1, 3, 4, 5, 999]])
    target = jnp.array([[1, 2, 3, 4, 5], [1, 2, 3, 4, 5]])
    np.testing.assert_allclose(
        edit_similarity(pred, target, pad_token=999), (1.0 + 0.8) / 2
    )
    # A single insertion shifts every later position: batch_acc collapses
    # (1/5 here) while edit similarity stays high — the motivating case.
    pred2 = jnp.array([[1, 7, 2, 3, 4]])
    target2 = jnp.array([[1, 2, 3, 4, 999]])
    np.testing.assert_allclose(
        float(batch_acc(pred2, target2, pad_token=999)), 0.2, rtol=1e-6
    )
    np.testing.assert_allclose(
        edit_similarity(pred2, target2, pad_token=999), 0.8
    )
    # Empty vs empty -> 1.0; empty vs non-empty -> 0.0.
    assert edit_similarity(
        jnp.array([[999]]), jnp.array([[999]]), pad_token=999
    ) == 1.0
    assert edit_similarity(
        jnp.array([[999]]), jnp.array([[1, 2]]), pad_token=999
    ) == 0.0
