"""Attention inner math with switchable backends.

The XLA path is a fused einsum-softmax-einsum; logits accumulate in float32
on the MXU regardless of the compute dtype, and masked positions are filled
(not added) with -finfo(f32).max so fully-masked rows softmax to uniform,
matching the reference's masked_fill semantics (reference attention.py:148-166).

The Pallas flash path (texocr_tpu.ops.flash_attention) computes the same
thing blockwise in VMEM without materializing the (Nq, Nk) score matrix; it
is numerically validated against this path in tests.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_MASK_VAL = -jnp.finfo(jnp.float32).max


def attention_core(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    allowed: Optional[jnp.ndarray] = None,
    causal: bool = False,
    use_flash: bool = False,
) -> jnp.ndarray:
    """Scaled dot-product attention.

    Args:
      q: (B, H, Nq, dh); k, v: (B, H, Nk, dh).
      allowed: optional bool mask broadcastable to (B, H, Nq, Nk); True means
        the position may be attended.
      causal: apply a right-aligned causal mask (query i attends keys
        j <= i + (Nk - Nq)), composed with ``allowed`` — reference
        attention.py:157-164 (the F.pad(j-i) construction).
      use_flash: route through the Pallas flash kernel when shapes allow.

    Returns (B, H, Nq, dh) in q's dtype.
    """
    if use_flash:
        from texocr_tpu.ops.flash_attention import (
            flash_attention_diff,
            flash_attention_supported,
        )

        if flash_attention_supported(q, k, allowed=allowed):
            # custom-vjp wrapper: kernel forward, XLA-attention backward
            return flash_attention_diff(q, k, v, scale, causal)

    return xla_attention(q, k, v, scale=scale, allowed=allowed, causal=causal)


def xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    allowed: Optional[jnp.ndarray] = None,
    causal: bool = False,
    return_probs: bool = False,
):
    out_dtype = q.dtype
    raw = jnp.einsum(
        "bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32
    )
    raw = raw * jnp.float32(scale)

    mask = combined_mask(
        q.shape[-2], k.shape[-2], allowed=allowed, causal=causal
    )
    logits = raw if mask is None else jnp.where(mask, raw, _MASK_VAL)

    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhij,bhjd->bhid",
        probs.astype(out_dtype),
        v,
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)
    if return_probs:
        # The reference's attention intermediates (attention.py:175-180):
        # pre-softmax = scaled UNMASKED energies, post-softmax = probs.
        return out, {"pre_softmax_attn": raw, "post_softmax_attn": probs}
    return out


def combined_mask(
    nq: int,
    nk: int,
    *,
    allowed: Optional[jnp.ndarray] = None,
    causal: bool = False,
) -> Optional[jnp.ndarray]:
    """Compose padding and causal masks into one boolean 'may attend' mask
    (or None if unmasked). Composition happens in boolean space so the fill
    value is applied exactly once — an additive composition could overflow
    float32 to -inf and NaN the softmax on fully-masked rows."""
    mask = allowed
    if causal:
        rows = jnp.arange(nq)[:, None]
        cols = jnp.arange(nk)[None, :]
        causal_ok = cols <= rows + (nk - nq)  # right-aligned
        causal_ok = causal_ok[None, None, :, :]
        mask = causal_ok if mask is None else (mask & causal_ok)
    return mask
