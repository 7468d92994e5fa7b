"""Remat (activation rematerialization) parity.

`ModelConfig.remat` wraps each transformer sub-layer (attention.py
_sublayer_step) and ResNet bottleneck (resnet.py Stage) in ``nn.remat`` so
the backward pass recomputes activations instead of storing them — the
jax.checkpoint FLOPs-for-HBM trade that lets large-canvas/long-seq buckets
train at full batch while the dataset itself is device-resident
(training/device_data.py). Remat must be a pure memory optimization: same
params tree, same loss, same gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from texocr_tpu.models import OCRModel
from tests.tiny import tiny_model_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_model_config()
    cfg_r = tiny_model_config(remat=True)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((2, 32, 64, 1)), jnp.float32)
    targets = jnp.asarray(rng.integers(0, 40, (2, 12)), jnp.int32)
    model = OCRModel(cfg)
    params = model.init(jax.random.PRNGKey(0), images, targets)
    return model, OCRModel(cfg_r), params, images, targets


def _value_and_grad(model, params, images, targets, deterministic):
    def loss_fn(p):
        logits, shifted = model.apply(
            p, images, targets, deterministic=deterministic,
            rngs=None if deterministic else {"dropout": jax.random.PRNGKey(7)},
        )
        return jnp.mean(logits.astype(jnp.float32) ** 2)

    return jax.jit(jax.value_and_grad(loss_fn))(params)


def test_param_tree_unchanged(setup):
    model, model_r, params, images, targets = setup
    params_r = model_r.init(jax.random.PRNGKey(0), images, targets)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        params_r
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params_r)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("deterministic", [True, False])
def test_loss_and_grads_match(setup, deterministic):
    model, model_r, params, images, targets = setup
    loss, grads = _value_and_grad(model, params, images, targets, deterministic)
    loss_r, grads_r = _value_and_grad(
        model_r, params, images, targets, deterministic
    )
    # Same params, same dropout key: remat must not change the math.
    np.testing.assert_allclose(float(loss), float(loss_r), rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(grads), jax.tree_util.tree_leaves(grads_r)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_remat_inside_scan_train_step(setup):
    """The production use: remat under the device-resident lax.scan step."""
    import optax

    from texocr_tpu.training.device_data import make_scan_train_step
    from texocr_tpu.training.train_step import TrainState

    _, model_r, params, images, targets = setup
    tx = optax.adam(1e-3)
    inner = params["params"]
    state = TrainState(
        params=inner, opt_state=tx.init(inner), step=jnp.int32(0),
        dropout_rng=jax.random.PRNGKey(0),
    )
    run = make_scan_train_step(model_r, tx, batch_size=2, steps_cap=2)
    imgs_u8 = jnp.asarray(
        (np.asarray(images[..., 0]) * 255).astype(np.uint8)
    )
    labels = jnp.concatenate([targets, targets], axis=0)[:2]
    state, metrics = run(
        state, imgs_u8, labels, jnp.int32(2), jnp.int32(2), jnp.int32(0),
        jnp.int32(0),
    )
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 2


def test_prevent_cse_derived_from_device_data():
    """prevent_cse barriers stay ON for the host-loop train step (forward and
    backward in ONE jitted program, where CSE could undo the recompute) and
    are dropped only in device_data scan mode, where fwd/bwd live in
    different loop bodies (models/attention.py _sublayer_step_remat)."""
    assert tiny_model_config(remat=True).remat_prevent_cse is True
    assert (
        tiny_model_config(remat=True, device_data=True).remat_prevent_cse
        is False
    )


@pytest.mark.parametrize("deterministic", [True, False])
def test_prevent_cse_does_not_change_math(setup, deterministic):
    """Barrier on vs off is purely a compiler hint: identical loss/grads."""
    _, model_r, _, images, targets = setup
    # Fresh params: the fixture's were donated by the scan-step test above.
    params = model_r.init(jax.random.PRNGKey(0), images, targets)
    cfg_scan = tiny_model_config(remat=True, device_data=True)
    assert cfg_scan.remat_prevent_cse is False
    model_scan = OCRModel(cfg_scan)
    loss, grads = _value_and_grad(
        model_r, params, images, targets, deterministic
    )
    loss_s, grads_s = _value_and_grad(
        model_scan, params, images, targets, deterministic
    )
    np.testing.assert_allclose(float(loss), float(loss_s), rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(grads), jax.tree_util.tree_leaves(grads_s)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )
