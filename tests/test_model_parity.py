"""Numeric parity vs the PyTorch reference (goldens in tests/goldens/).

A small-but-faithful instance of the architecture (same code paths: hybrid
ResNet embed, shared-norm double-norm stack, GLU out-proj, inner-dim 128 !=
embed 64) was run in the reference; here we convert its state_dict with the
torch shim and require matching outputs at every level.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from texocr_tpu.config import ModelConfig
from texocr_tpu.checkpoint import convert_torch_state_dict
from texocr_tpu.models import OCRModel

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens")

CONFIG = {
    "img_size": (48, 128),
    "patch_size": 16,
    "vocab_size": 50,
    "max_length": 32,
    "glu": True,
    "bos_token": 48,
    "eos_token": 47,
    "trg_pad_idx": 49,
    "dtype": "float32",
    "encoder": {
        "n_channels": 1,
        "embed_dim": 64,
        "num_layers": 2,
        "heads": 2,
        "resnet_depths": (1, 1, 1),
        "resnet_channels": (128, 128, 128),
        "stem_channels": 32,
    },
    "decoder": {
        "embed_dim": 64,
        "num_layers": 2,
        "heads": 2,
        "cross_attend": True,
        "dropout": 0.0,
        "exp_factor": 4,
    },
}


@pytest.fixture(scope="module")
def golden():
    return np.load(os.path.join(GOLDEN, "model_io.npz"))


@pytest.fixture(scope="module")
def model_and_params():
    state = dict(np.load(os.path.join(GOLDEN, "model_state.npz")))
    params = convert_torch_state_dict(
        state,
        num_encoder_layers=2,
        num_decoder_layers=2,
        resnet_depths=(1, 1, 1),
        glu=True,
    )
    model = OCRModel(ModelConfig.from_dict(dict(CONFIG)))
    return model, {"params": params}


def _nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


@pytest.mark.slow
def test_converted_tree_matches_init_structure(model_and_params, golden):
    """The converted tree has exactly the structure model.init produces."""
    model, params = model_and_params
    images = jnp.asarray(_nhwc(golden["images"]))
    targets = jnp.asarray(golden["targets"].astype(np.int32))
    ref = model.init(jax.random.PRNGKey(0), images, targets)
    ref_paths = {
        tuple(p): v.shape for p, v in jax.tree_util.tree_flatten_with_path(ref)[0]
    }
    got_paths = {
        tuple(p): v.shape for p, v in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    assert set(map(str, ref_paths)) == set(map(str, got_paths))
    for k in ref_paths:
        assert ref_paths[k] == got_paths[k], f"shape mismatch at {k}"


def test_backbone_parity(model_and_params, golden):
    model, params = model_and_params
    images = jnp.asarray(_nhwc(golden["images"]))

    def run(params, images):
        return model.apply(
            params,
            images,
            method=lambda m, im: m.encoder.backbone(im),
        )

    feats = np.asarray(run(params, images))
    want = _nhwc(golden["backbone_feats"])
    np.testing.assert_allclose(feats, want, rtol=1e-4, atol=1e-4)


def test_encoder_parity(model_and_params, golden):
    model, params = model_and_params
    images = jnp.asarray(_nhwc(golden["images"]))
    enc = np.asarray(model.apply(params, images, method=OCRModel.encode))
    np.testing.assert_allclose(enc, golden["enc_out"], rtol=1e-4, atol=1e-4)


def test_decoder_logits_and_loss_parity(model_and_params, golden):
    from texocr_tpu.training.losses import sequence_ce_loss

    model, params = model_and_params
    images = jnp.asarray(_nhwc(golden["images"]))
    targets = jnp.asarray(golden["targets"].astype(np.int32))
    logits, labels = model.apply(params, images, targets)
    np.testing.assert_allclose(
        np.asarray(logits), golden["dec_logits"], rtol=1e-4, atol=2e-4
    )
    # Parity mode: UNMASKED cross entropy (reference decoder.py:140).
    loss = sequence_ce_loss(logits, labels, pad_token=49, mask_pad=False)
    np.testing.assert_allclose(float(loss), float(golden["loss"]), rtol=1e-5)


def test_greedy_decode_parity(model_and_params, golden):
    """Our KV-cached greedy decode reproduces the reference's argmax loop
    token-for-token (and the per-step logits numerically)."""
    from texocr_tpu.models.generate import greedy_decode

    model, params = model_and_params
    images = jnp.asarray(_nhwc(golden["images"]))
    enc = model.apply(params, images, method=OCRModel.encode)

    steps = golden["greedy_step_logits"].shape[1]
    tokens, step_logits = greedy_decode(
        model,
        params,
        enc,
        bos_token=48,
        eos_token=-1,  # golden trace never stops early; disable stopping
        pad_token=49,
        max_len=steps,
        return_logits=True,
    )
    np.testing.assert_allclose(
        np.asarray(step_logits),
        golden["greedy_step_logits"],
        rtol=1e-4,
        atol=2e-4,
    )
    want = golden["greedy_tokens"][:, 1:]  # strip BOS
    np.testing.assert_array_equal(np.asarray(tokens), want)
