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


def test_edit_similarity_matches_bruteforce():
    """The vectorized two-row DP (insertion closure as a running min) equals
    the textbook pure-Python Levenshtein on random padded batches."""
    from texocr_tpu.evaluation.metrics import edit_similarity

    def lev(p, t):
        prev = list(range(len(t) + 1))
        for i, a in enumerate(p, 1):
            cur = [i] + [0] * len(t)
            for j, b in enumerate(t, 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (a != b))
            prev = cur
        return prev[-1]

    rng = np.random.default_rng(3)
    for _ in range(50):
        b = int(rng.integers(1, 4))
        pred = rng.integers(0, 6, (b, int(rng.integers(1, 12))))
        target = rng.integers(0, 6, (b, int(rng.integers(1, 12))))
        pred[rng.random(pred.shape) < 0.3] = 999
        target[rng.random(target.shape) < 0.3] = 999
        want = []
        for pr, tr in zip(pred, target):
            p = [int(x) for x in pr if x != 999]
            t = [int(x) for x in tr if x != 999]
            want.append(
                1.0 if not p and not t
                else 1.0 - lev(p, t) / max(len(p), len(t))
            )
        np.testing.assert_allclose(
            edit_similarity(pred, target, pad_token=999), np.mean(want)
        )


def test_clamp_to_pos_table(capsys):
    """Decode budgets beyond the checkpoint's positional table are clamped
    (positions past the table would read NaN-filled embeddings) and
    config['max_length'] is synced to the table size."""
    from texocr_tpu.evaluation.evaluate import clamp_to_pos_table

    params = {
        "decoder": {"pos_embedding": {"embedding": np.zeros((128, 16))}}
    }
    config = {"max_length": 512}
    assert clamp_to_pos_table(params, config, 500) == 127
    assert config["max_length"] == 128
    assert "clamping" in capsys.readouterr().out
    # Within-budget decode passes through untouched.
    config2 = {"max_length": 64}
    assert clamp_to_pos_table(params, config2, 100) == 100
    assert config2["max_length"] == 128
