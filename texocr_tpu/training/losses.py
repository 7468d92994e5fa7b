"""Sequence losses.

The reference trains with an UNMASKED cross entropy — pad positions contribute
to the loss (reference decoder.py:140; the ignore_index criterion built at
train.py:54 is never used). ``mask_pad=False`` reproduces that exactly
("parity mode"); the default masks pads out, which is what you actually want.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sequence_ce_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    pad_token: int,
    mask_pad: bool = True,
) -> jnp.ndarray:
    """Mean token cross entropy.

    logits: (B, T, V); labels: (B, T) int. Log-softmax in float32.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if not mask_pad:
        return jnp.mean(nll)
    mask = (labels != pad_token).astype(jnp.float32)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def get_loss_fn(name: str):
    """Config-name loss registry (the reference resolves config['loss_fn']
    by reflection on torch.nn, utils.py:48-50; only CrossEntropyLoss is ever
    used)."""
    if name in ("CrossEntropyLoss", "cross_entropy"):
        return sequence_ce_loss
    raise ValueError(f"unknown loss_fn: {name!r}")
