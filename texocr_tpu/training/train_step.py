"""Jitted training step with donated state, sharded over the mesh.

The step (forward + backward + Adam update) compiles once per (image-shape,
seq-len) bucket. Params/optimizer state are placed per
``texocr_tpu.parallel.sharding`` rules (replicated under pure DP, matrices
split under TP); batches shard over the 'data' axis; GSPMD emits the gradient
psum over ICI. State is donated, so the update is in-place in HBM.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from texocr_tpu.models.ocr_model import OCRModel
from texocr_tpu.parallel.sharding import batch_sharding, shard_pytree
from texocr_tpu.training.losses import sequence_ce_loss


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    dropout_rng: jax.Array


def create_train_state(
    model: OCRModel,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    sample_images: jnp.ndarray,
    sample_labels: jnp.ndarray,
    mesh=None,
) -> TrainState:
    """Init params (optionally placing them on ``mesh`` per the partition
    rules) and the optimizer state. Initializing the optimizer from
    already-sharded params under jit makes the Adam moments inherit their
    parameters' shardings — no per-optimizer plumbing."""
    init_rng, dropout_rng = jax.random.split(rng)
    # Jitted init: ONE compiled execution (persistently cacheable) instead of
    # eager op-by-op dispatch — through the remote tunnel, eager init of the
    # flagship at full-canvas shapes costs tens of minutes in per-op latency.
    variables = jax.jit(model.init)(init_rng, sample_images, sample_labels)
    params = variables["params"]
    if mesh is not None:
        params = shard_pytree(params, mesh)
    opt_state = jax.jit(tx.init)(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=opt_state,
        dropout_rng=dropout_rng,
    )


def make_train_step(
    model: OCRModel,
    tx: optax.GradientTransformation,
    *,
    mask_pad: bool = True,
):
    """Build the jitted (state, images, labels) -> (state, metrics) step."""
    pad_token = model.config.pad_token

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(
        state: TrainState, images: jnp.ndarray, labels: jnp.ndarray
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        step_rng = jax.random.fold_in(state.dropout_rng, state.step)

        def loss_fn(params):
            logits, shifted = model.apply(
                {"params": params},
                images,
                labels,
                deterministic=False,
                rngs={"dropout": step_rng},
            )
            loss = sequence_ce_loss(
                logits, shifted, pad_token=pad_token, mask_pad=mask_pad
            )
            acc_mask = (
                (shifted != pad_token)
                if mask_pad
                else jnp.ones_like(shifted, jnp.bool_)
            )
            acc = jnp.sum(
                (jnp.argmax(logits, -1) == shifted) & acc_mask
            ) / jnp.maximum(jnp.sum(acc_mask), 1)
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            dropout_rng=state.dropout_rng,
        )
        metrics = {"loss": loss, "token_acc": acc}
        return new_state, metrics

    return train_step


def make_eval_step(model: OCRModel, *, mask_pad: bool = True):
    pad_token = model.config.pad_token

    @jax.jit
    def eval_step(params, images, labels):
        logits, shifted = model.apply({"params": params}, images, labels)
        return sequence_ce_loss(
            logits, shifted, pad_token=pad_token, mask_pad=mask_pad
        )

    return eval_step


def put_batch(mesh, images, labels):
    sh = batch_sharding(mesh)
    return jax.device_put(jnp.asarray(images), sh), jax.device_put(
        jnp.asarray(labels), sh
    )
