"""Utils semantics: process_output goldens, top-k quirk, SAME-padding math."""

import numpy as np
import jax.numpy as jnp

from texocr_tpu import utils


def test_process_output_golden():
    # Verified reference behaviour (reference utils.py:73-79, SURVEY.md §2.4).
    assert (
        utils.process_output(r"\int _ { 0 } ^ { 1 } x ^ 2 d x")
        == r"\int_{0}^{1}x^2dx"
    )
    assert utils.process_output(r"\alpha x + \beta y") == r"\alpha x+\beta y"
    assert utils.process_output("a  b\t c") == "abc"
    assert utils.process_output(r"\frac { a } { b }") == r"\frac{a}{b}"


def test_topk_size_fp_quirk():
    # int((1-0.9)*1000) == 99 in float arithmetic (reference utils.py:87).
    assert utils.topk_filter_size(1000) == 99
    assert utils.topk_filter_size(100) == 9
    assert utils.topk_filter_size(10) == 0 or utils.topk_filter_size(10) == 1


def test_topk_filter_keeps_exactly_k():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(4, 1000)).astype(np.float32))
    out = utils.topk_filter(logits)
    kept = np.isfinite(np.asarray(out)).sum(axis=-1)
    assert (kept == 99).all()
    # Kept entries are unchanged and are the largest 99.
    arr, outn = np.asarray(logits), np.asarray(out)
    for row in range(4):
        top = np.sort(arr[row])[-99:]
        assert set(np.round(outn[row][np.isfinite(outn[row])], 6)) == set(
            np.round(top, 6)
        )


def test_same_padding_matches_lax_same():
    """Our SAME-pad helper equals what lax 'SAME' padding computes."""
    import jax

    for x in [7, 8, 159, 160, 1008]:
        for k, s in [(7, 2), (3, 2), (3, 1), (1, 2), (1, 1)]:
            lo, hi = utils.same_pad_lo_hi(x, k, s)
            (lax_lo, lax_hi), = jax.lax.padtype_to_pads(
                (x,), (k,), (s,), "SAME"
            )
            assert (lo, hi) == (lax_lo, lax_hi), (x, k, s)


def test_pad_to_multiple():
    assert utils.pad_to_multiple(1, 16) == 16
    assert utils.pad_to_multiple(16, 16) == 16
    assert utils.pad_to_multiple(17, 64) == 64
    assert utils.pad_to_multiple(65, 64) == 128
