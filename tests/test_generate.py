"""Decode loops: greedy/sampled/beam consistency on a tiny model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from texocr_tpu.models import OCRModel
from texocr_tpu.models.beam import beam_decode
from texocr_tpu.models.generate import greedy_decode, sampled_decode

from tests.tiny import tiny_model_config

BOS, EOS, PAD = 48, 47, 49


@pytest.fixture(scope="module")
def setup():
    model = OCRModel(tiny_model_config())
    rng = np.random.default_rng(3)
    images = jnp.asarray(rng.normal(size=(2, 32, 64, 1)).astype(np.float32))
    labels = jnp.full((2, 8), PAD, jnp.int32)
    params = model.init(jax.random.PRNGKey(1), images, labels)
    enc = model.apply(params, images, method=OCRModel.encode)
    return model, params, enc


def _seq_logprob(model, params, enc, tokens):
    """Teacher-forced log-prob of a generated suffix (BOS prepended)."""
    full = jnp.concatenate(
        [jnp.full((tokens.shape[0], 1), BOS, jnp.int32), tokens], axis=1
    )
    logits = model.apply(params, full[:, :-1], enc, method=OCRModel.decode_logits)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    picked = jnp.take_along_axis(logp, full[:, 1:, None], axis=-1)[..., 0]
    live = jnp.cumsum(
        jnp.concatenate(
            [jnp.ones((full.shape[0], 1), bool), full[:, 1:-1] == EOS], axis=1
        ).astype(jnp.int32),
        axis=1,
    ) <= 1  # positions up to and including first EOS
    return jnp.sum(jnp.where(live, picked, 0.0), axis=1)


@pytest.mark.slow
def test_greedy_matches_full_reforward(setup):
    model, params, enc = setup
    toks = greedy_decode(
        model, params, enc, bos_token=BOS, eos_token=-1, pad_token=PAD, max_len=9
    )
    out = jnp.full((2, 1), BOS, jnp.int32)
    for _ in range(9):
        logits = model.apply(params, out, enc, method=OCRModel.decode_logits)
        nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        out = jnp.concatenate([out, nxt[:, None]], axis=1)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(out[:, 1:]))


def test_greedy_eos_stops_and_pads(setup):
    model, params, enc = setup
    free = greedy_decode(
        model, params, enc, bos_token=BOS, eos_token=-1, pad_token=PAD, max_len=12
    )
    free = np.asarray(free)
    # Pick the first token the model emits and use it as a fake EOS: the
    # decode must stop immediately and pad the rest.
    fake_eos = int(free[0, 0])
    toks = np.asarray(
        greedy_decode(
            model, params, enc,
            bos_token=BOS, eos_token=fake_eos, pad_token=PAD, max_len=12,
        )
    )
    row = toks[0]
    assert row[0] == fake_eos
    assert (row[1:] == PAD).all()


def test_sampled_decode_temp_zero_limit(setup):
    """At very low temperature, sampling equals greedy (argmax of top-k)."""
    model, params, enc = setup
    greedy = np.asarray(
        greedy_decode(
            model, params, enc, bos_token=BOS, eos_token=EOS, pad_token=PAD,
            max_len=8,
        )
    )
    sampled = np.asarray(
        sampled_decode(
            model, params, enc, jax.random.PRNGKey(0),
            bos_token=BOS, eos_token=EOS, pad_token=PAD, max_len=8, temp=1e-4,
        )
    )
    np.testing.assert_array_equal(sampled, greedy)


def test_beam_1_equals_greedy(setup):
    model, params, enc = setup
    greedy = np.asarray(
        greedy_decode(
            model, params, enc, bos_token=BOS, eos_token=EOS, pad_token=PAD,
            max_len=8,
        )
    )
    beam = np.asarray(
        beam_decode(
            model, params, enc, bos_token=BOS, eos_token=EOS, pad_token=PAD,
            max_len=8, beam_size=1,
        )
    )
    np.testing.assert_array_equal(beam, greedy)


def test_beam_5_scores_are_consistent(setup):
    """The score beam search reports for its chosen beam equals the
    teacher-forced log-prob of the returned sequence computed by a full
    re-forward — this catches KV-cache reorder bugs. (Beam > greedy is NOT
    guaranteed in general — pruning can drop greedy's path — so that is not
    asserted.)"""
    model, params, enc = setup
    beam, scores = beam_decode(
        model, params, enc, bos_token=BOS, eos_token=EOS, pad_token=PAD,
        max_len=8, beam_size=5, return_scores=True,
    )
    lp = np.asarray(_seq_logprob(model, params, enc, beam))
    np.testing.assert_allclose(np.asarray(scores), lp, rtol=2e-4, atol=2e-4)


def test_attention_map_introspection(setup):
    """return_attn / return_embeddings / return_hidden API (reference
    Transformer.forward, decoder.py:41-67)."""
    model, params, enc = setup
    tokens = jnp.array([[BOS, 5, 6], [BOS, 7, 8]], jnp.int32)

    logits, maps = model.apply(
        params, tokens, enc,
        method=lambda m, t, e: m.decoder(t, enc=e, return_attn=True),
    )
    # 1 layer x (self + cross) = 2 attention sub-layers.
    assert len(maps) == 2
    assert maps[0].shape == (2, 2, 3, 3)          # self: (B, H, T, T)
    assert maps[1].shape[:3] == (2, 2, 3)          # cross: (B, H, T, N_enc)
    rows = np.asarray(maps[0]).sum(-1)
    np.testing.assert_allclose(rows, np.ones_like(rows), atol=1e-5)

    emb = model.apply(
        params, tokens, enc,
        method=lambda m, t, e: m.decoder(t, enc=e, return_embeddings=True),
    )
    assert emb.shape == (2, 3, 32)


def test_int8_kv_quant_decode_close(setup):
    """kv_quant='int8' decode matches the unquantized decode's logits within
    the int8 rounding budget (and typically the same tokens)."""
    import dataclasses

    model, params, enc = setup
    cfg8 = dataclasses.replace(tiny_model_config(), kv_quant="int8")
    model8 = OCRModel(cfg8)
    toks, logits = greedy_decode(
        model, params, enc, bos_token=BOS, eos_token=-1, pad_token=PAD,
        max_len=6, return_logits=True,
    )
    toks8, logits8 = greedy_decode(
        model8, params, enc, bos_token=BOS, eos_token=-1, pad_token=PAD,
        max_len=6, return_logits=True,
    )
    err = np.abs(np.asarray(logits8) - np.asarray(logits))
    scale = np.abs(np.asarray(logits)).max()
    assert err.max() / scale < 0.05, (err.max(), scale)


def test_int8_self_kv_quant_decode_close(setup):
    """self_kv_quant='int8' (int8 merged self-attention prefix, per-position
    scales quantized at merge_hot) matches the bf16-cache decode's logits
    within the int8 rounding budget. max_len spans multiple DECODE_CHUNKs so
    the quantized prefix is actually read."""
    import dataclasses

    model, params, enc = setup
    cfg8 = dataclasses.replace(tiny_model_config(), self_kv_quant="int8")
    model8 = OCRModel(cfg8)
    from texocr_tpu.models.generate import DECODE_CHUNK

    n = DECODE_CHUNK + 6
    toks, logits = greedy_decode(
        model, params, enc, bos_token=BOS, eos_token=-1, pad_token=PAD,
        max_len=n, return_logits=True,
    )
    toks8, logits8 = greedy_decode(
        model8, params, enc, bos_token=BOS, eos_token=-1, pad_token=PAD,
        max_len=n, return_logits=True,
    )
    err = np.abs(np.asarray(logits8) - np.asarray(logits))
    scale = np.abs(np.asarray(logits)).max()
    assert err.max() / scale < 0.05, (err.max(), scale)


def test_int8_self_kv_quant_beam_close(setup):
    """Beam search over the int8 merged prefix returns the same best beams
    as the bf16 cache on the tiny model (scores differ only by the rounding
    budget; the discrete argmax agrees at this scale)."""
    import dataclasses

    model, params, enc = setup
    cfg8 = dataclasses.replace(tiny_model_config(), self_kv_quant="int8")
    model8 = OCRModel(cfg8)
    from texocr_tpu.models.generate import DECODE_CHUNK

    n = DECODE_CHUNK + 6
    kw = dict(bos_token=BOS, eos_token=EOS, pad_token=PAD, max_len=n,
              beam_size=3, return_scores=True)
    toks, scores = beam_decode(model, params, enc, **kw)
    toks8, scores8 = beam_decode(model8, params, enc, **kw)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks8))
    np.testing.assert_allclose(
        np.asarray(scores), np.asarray(scores8), rtol=0.05, atol=0.3
    )


def test_sampled_decode_respects_topk_filter(setup):
    """Every sampled token must come from the top-k(99-of-1000-rule) filter
    set of that step's logits (reference utils.py:85-91 semantics). With the
    tiny vocab (50), the fp quirk gives k = int((1-0.9)*50) = 4 (not 5) —
    the same arithmetic that yields 99-of-1000 for the real vocab."""
    from texocr_tpu.utils import topk_filter_size

    model, params, enc = setup
    k = topk_filter_size(50)
    assert k == 4
    toks, logits = None, None
    toks8, logits8 = greedy_decode(  # reuse logits buffer machinery
        model, params, enc, bos_token=BOS, eos_token=-1, pad_token=PAD,
        max_len=6, return_logits=True,
    )
    # Re-run the sampler many times; every emitted token must be within the
    # top-5 of the greedy path's logits at step 0 (same first-step logits).
    step0 = np.asarray(logits8)[:, 0, :]
    topk = np.argsort(step0, axis=-1)[:, -k:]
    for seed in range(8):
        s = np.asarray(
            sampled_decode(
                model, params, enc, jax.random.PRNGKey(seed),
                bos_token=BOS, eos_token=-1, pad_token=PAD, max_len=1, temp=0.7,
            )
        )
        for row in range(s.shape[0]):
            assert s[row, 0] in topk[row], (seed, row, s[row, 0], topk[row])


def test_split_cache_attention_matches_monolithic():
    """The split-cache decode attention (_attend_split over merged + hot
    windows) must equal monolithic cached attention over the same positions.

    This is the unit-level guarantee behind the hot-window decode design
    (RESULTS.md "KV-cache write cost"): masking merged positions >= t0 and
    hot positions > w exposes exactly the prefix 0..t0+w."""
    from texocr_tpu.models.attention import MultiHeadAttention

    rng = np.random.default_rng(7)
    B, H, dh, T, W = 3, 2, 8, 16, 4
    q = jnp.asarray(rng.standard_normal((B, H, 1, dh)), jnp.float32)
    # Absolute-position K/V stream 0..t0+w, laid out both ways.
    kv = rng.standard_normal((2, B, H, dh, T)).astype(np.float32)
    k_all, v_all = jnp.asarray(kv[0]), jnp.asarray(kv[1])
    scale = dh**-0.5

    for t0 in (0, 4, 8, 12):
        for w in (0, 1, 3):
            # Monolithic: everything up to absolute index t0 + w.
            key_ok = (jnp.arange(T) <= t0 + w)[None, None, None, :]
            want = MultiHeadAttention._attend_transposed(
                q, k_all, v_all, scale, key_ok
            )
            # Split: merged prefix < t0 in (B,H,dh,T); current chunk in the
            # sequence-major (W,B,H,dh) hot window.
            big_k = jnp.where(jnp.arange(T) < t0, k_all, 0.0)
            big_v = jnp.where(jnp.arange(T) < t0, v_all, 0.0)
            hot_k = jnp.moveaxis(
                jax.lax.dynamic_slice_in_dim(k_all, t0, W, axis=3), 3, 0
            )
            hot_v = jnp.moveaxis(
                jax.lax.dynamic_slice_in_dim(v_all, t0, W, axis=3), 3, 0
            )
            got = MultiHeadAttention._attend_split(
                q, big_k, big_v, hot_k, hot_v, scale, t0, w
            )
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5,
                err_msg=f"t0={t0} w={w}",
            )


def test_tier_sizes_invariants():
    """Every chunk base t0 must be covered by its tier's static width, the
    last width must equal the buffer, and widths stay chunk multiples."""
    from texocr_tpu.models.generate import _tier_sizes

    for chunk in (8, 32):
        for n_chunks in (1, 2, 3, 4, 5, 7, 16):
            padded = chunk * n_chunks
            q, sizes = _tier_sizes(padded, chunk)
            assert sizes[-1] == padded
            assert sizes == sorted(set(sizes))
            assert all(s % chunk == 0 for s in sizes)
            for t0 in range(0, padded, chunk):
                tier = min(max(0, -(-t0 // q) - 1), len(sizes) - 1)
                assert sizes[tier] >= t0, (chunk, padded, t0, q, sizes)


def test_tiered_decode_matches_single_tier(setup, monkeypatch):
    """Multi-chunk greedy decode must be bit-identical whether the merged
    prefix is read at full width every chunk (one tier) or through the
    statically-sliced tier ladder (PREFIX_TIERS) — the sliced positions are
    exactly the ok_big-masked ones."""
    import texocr_tpu.models.generate as gen

    model, params, enc = setup
    kw = dict(bos_token=BOS, eos_token=-1, pad_token=PAD, max_len=64)

    monkeypatch.setattr(gen, "PREFIX_TIERS", 1)
    # max_len 64 = 2 chunks of 32; re-derive defaults from the patched value.
    one = gen.greedy_decode(model, params, enc, **kw)
    monkeypatch.setattr(gen, "PREFIX_TIERS", 4)
    tiered = gen.greedy_decode(model, params, enc, **kw)
    np.testing.assert_array_equal(np.asarray(one), np.asarray(tiered))
