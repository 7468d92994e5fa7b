"""Cross-attention heatmap tool: replay math and output contract."""

import os
import sys

import numpy as np

from texocr_tpu.tokenizer import DEFAULT_VOCAB_PATH

from tests.tiny import TINY_CONFIG
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def _engine():
    from texocr_tpu.serving import TexOCR

    cfg = dict(TINY_CONFIG)
    cfg.update(
        img_size=(32, 128), vocab_size=1000, trg_pad_idx=999,
        bos_token=998, eos_token=997, tokenizer_path=DEFAULT_VOCAB_PATH,
        max_length=64,
    )
    return TexOCR(cfg)


@pytest.mark.slow
def test_cross_attention_maps_shape_and_normalization():
    from attention_maps import cross_attention_maps

    engine = _engine()
    canvas = np.full((1, 32, 128, 1), 255, np.uint8)
    ids = [5, 17, 42]
    attn = cross_attention_maps(engine, canvas, ids)

    from texocr_tpu.models.resnet import ResNetV2

    gh, gw = ResNetV2.feature_grid(
        (32, 128), len(engine.model.config.encoder.resnet_depths)
    )
    n_layers = engine.model.config.decoder.num_layers
    n_heads = engine.model.config.decoder.heads
    # (L, H, T, N): one cross map per decoder layer, T = BOS + ids.
    assert attn.shape == (n_layers, n_heads, len(ids) + 1, gh * gw + 1)
    # Post-softmax rows are distributions over encoder tokens.
    np.testing.assert_allclose(attn.sum(axis=-1), 1.0, rtol=1e-4)


def test_heat_overlay_is_rgb_canvas_sized():
    from attention_maps import heat_to_overlay

    base = np.full((32, 128), 255, np.uint8)
    heat = np.random.default_rng(0).random((2, 8)).astype(np.float32)
    img = heat_to_overlay(base, heat)
    assert img.mode == "RGB" and img.size == (128, 32)
