"""Pallas flash attention vs the XLA einsum path (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from texocr_tpu.ops.attention_core import xla_attention
from texocr_tpu.ops.flash_attention import (
    flash_attention,
    flash_attention_supported,
)


def _qkv(rng, b=2, h=3, nq=200, nk=200, dh=64):
    q = jnp.asarray(rng.normal(size=(b, h, nq, dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, nk, dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, nk, dh)).astype(np.float32))
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
def test_matches_xla(rng, causal):
    q, k, v = _qkv(rng)
    want = xla_attention(q, k, v, scale=0.125, causal=causal)
    got = flash_attention(q, k, v, scale=0.125, causal=causal, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_unequal_q_kv_lengths(rng):
    q, k, v = _qkv(rng, nq=64, nk=300)
    want = xla_attention(q, k, v, scale=0.1)
    got = flash_attention(q, k, v, scale=0.1, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_kv_lens_masking(rng):
    """Per-row key lengths equal XLA with an explicit tail-pad mask."""
    b, nk = 3, 160
    q, k, v = _qkv(rng, b=b, nq=96, nk=nk)
    lens = jnp.asarray([160, 100, 1], dtype=jnp.int32)
    allowed = (jnp.arange(nk)[None, :] < lens[:, None])[:, None, None, :]
    want = xla_attention(q, k, v, scale=0.2, allowed=allowed)
    got = flash_attention(q, k, v, scale=0.2, kv_lens=lens, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_supported_gate(rng):
    q, k, v = _qkv(rng)
    assert flash_attention_supported(q, k)
    assert not flash_attention_supported(q, k, allowed=jnp.ones((2, 1, 1, 1), bool))
    assert not flash_attention_supported(q[:, :, :1], k)  # 1-query decode


def test_gradients_flow(rng):
    from texocr_tpu.ops.flash_attention import flash_attention_diff

    q, k, v = _qkv(rng, b=1, h=2, nq=140, nk=140)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention_diff(q, k, v, 0.125, True) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(xla_attention(q, k, v, scale=0.125, causal=True) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flash, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-3)


def test_encoder_uses_flash_without_changing_outputs(rng):
    """VisionEncoder(use_flash=True) == use_flash=False numerically."""
    from tests.tiny import tiny_model_config
    from texocr_tpu.models import OCRModel
    import dataclasses

    cfg = tiny_model_config()
    images = jnp.asarray(rng.normal(size=(2, 32, 64, 1)).astype(np.float32))
    labels = jnp.full((2, 8), 49, jnp.int32)

    base = OCRModel(cfg)
    params = base.init(jax.random.PRNGKey(0), images, labels)
    flash_cfg = dataclasses.replace(cfg, use_flash_attention=True)
    flash = OCRModel(flash_cfg)

    out_base = base.apply(params, images, method=OCRModel.encode)
    out_flash = flash.apply(params, images, method=OCRModel.encode)
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_base), atol=2e-5
    )
