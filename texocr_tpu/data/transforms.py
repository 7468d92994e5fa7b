"""Image preprocessing.

Host side (PIL/numpy): the training-time augmentation — a random scale affine
(0.85-1.05, bilinear, white fill), equivalent in distribution to the
reference's RandomAffine (reference dataset.py:365-371). The reference applies
this augmentation at val/test/inference time too (a documented defect,
SURVEY.md §7); here augmentation is explicit and defaults to train-only.

Device side (jit-fused): grayscale conversion, [0,1] scaling, color inversion
and pad-to-patch-multiple run inside XLA ahead of the encoder
(``preprocess_jax``), so serving feeds raw uint8 image bytes to the chip and
the whole pipeline fuses with the ResNet stem.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax.numpy as jnp

from texocr_tpu.utils import pad_to_multiple

# ITU-R 601 luma weights — what torchvision's Grayscale uses.
_LUMA = np.array([0.2989, 0.587, 0.114], dtype=np.float32)


def affine_scale_aug(
    img, rng: np.random.Generator, scale_range: Tuple[float, float] = (0.85, 1.05)
):
    """Random center scale with white fill, bilinear resample (the reference's
    RandomAffine(degrees=0, scale=(.85,1.05), fill=255); distributionally
    equivalent, not bit-identical — torch RNG vs numpy RNG)."""
    from PIL import Image

    s = float(rng.uniform(*scale_range))
    w, h = img.size
    cx, cy = w * 0.5, h * 0.5
    # PIL AFFINE maps OUTPUT (x, y) -> INPUT (a x + b y + c, d x + e y + f);
    # scaling by s around the center means sampling input at c + (p - c)/s.
    inv = 1.0 / s
    coeffs = (inv, 0.0, cx - cx * inv, 0.0, inv, cy - cy * inv)
    return img.transform(
        (w, h), Image.AFFINE, coeffs, resample=Image.BILINEAR, fillcolor=255
    )


def to_model_array(img) -> np.ndarray:
    """PIL image -> float32 (H, W, 1) in [0, 1], grayscale, inverted
    (ink=1, background=0) — the reference's ToTensor+Grayscale+Invert chain
    (dataset.py:365-371)."""
    arr = np.asarray(img)
    if arr.ndim == 2:
        gray = arr.astype(np.float32) / 255.0
    else:
        rgb = arr[..., :3].astype(np.float32) / 255.0
        gray = rgb @ _LUMA
    return (1.0 - gray)[..., None]


def img_transform(
    img, rng: Optional[np.random.Generator] = None, augment: bool = False
) -> np.ndarray:
    """Full host transform. ``augment=True`` applies the random scale affine
    first (train only by default; pass augment=True everywhere for strict
    reference-behaviour parity — it augments at eval time too)."""
    if augment:
        if rng is None:
            rng = np.random.default_rng()
        img = affine_scale_aug(img, rng)
    return to_model_array(img)


def preprocess_jax(
    raw: jnp.ndarray, patch_size: int = 16, width_multiple: int = 64
) -> jnp.ndarray:
    """Jit-fusable preprocessing for serving: uint8 (B, H, W[, C]) ->
    float32 (B, H', W', 1) grayscale/inverted, center-padded to the render
    rule's canvas multiples (h -> 16k, w -> 64k; reference render_data.py:81-92
    pads at render time, this is the runtime equivalent for raw inputs)."""
    x = raw.astype(jnp.float32) / 255.0
    if x.ndim == 4 and x.shape[-1] >= 3:
        x = x[..., :3] @ jnp.asarray(_LUMA)
    elif x.ndim == 4:
        x = x[..., 0]
    x = 1.0 - x  # invert: ink -> 1, white background -> 0

    b, h, w = x.shape
    new_h = pad_to_multiple(h, patch_size)
    new_w = pad_to_multiple(w, width_multiple)
    pad_h, pad_w = new_h - h, new_w - w
    # Center padding with background (0 after inversion).
    x = jnp.pad(
        x,
        (
            (0, 0),
            (pad_h // 2, pad_h - pad_h // 2),
            (pad_w // 2, pad_w - pad_w // 2),
        ),
    )
    return x[..., None]
