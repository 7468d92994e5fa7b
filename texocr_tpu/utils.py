"""Host-side utilities.

Re-implements the reference's utility semantics (reference: utils.py) where
they are behaviour-critical for parity:

- ``process_output`` — LaTeX whitespace post-processing (utils.py:73-79).
- ``topk_filter_size`` — the fp-quirky top-k size: ``int((1-0.9)*1000) == 99``
  not 100 (utils.py:85-91, verified in SURVEY.md §2.4).
- SAME-padding math used by the weight-standardized convs (utils.py:93-123).
"""

from __future__ import annotations

import math
import os
import re
from typing import List, Optional, Tuple

import jax.numpy as jnp


def enable_compile_cache(path: Optional[str] = None) -> None:
    """Point JAX's persistent compilation cache at a shared directory.

    Full-canvas decode/train executables take minutes to build through a
    remote-compile tunnel; reruns (and resumed evals) reuse the cached
    binaries. Default location is ``<repo root>/.jax_cache`` (the directory
    above the installed package); override with the ``TEXOCR_JAX_CACHE``
    environment variable. Call before the first jitted computation.

    Also re-asserts the ``JAX_PLATFORMS`` environment variable as the
    ``jax_platforms`` config: some PJRT plugins force-set the config at
    import time, silently overriding the env var — and a CPU-only run
    (``JAX_PLATFORMS=cpu``) would otherwise hang trying to reach an
    unavailable accelerator backend.
    """
    import jax

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)
    path = path or os.environ.get("TEXOCR_JAX_CACHE") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def process_output(output: str) -> str:
    """Strip whitespace from decoded LaTeX, keeping the single space a LaTeX
    command needs before an alphanumeric argument (reference utils.py:73-79).

    '\\int _ { 0 } ^ { 1 } x ^ 2 d x' -> '\\int_{0}^{1}x^2dx'
    """
    output = re.sub(r"(\\[a-zA-Z]+)\s+([a-zA-Z0-9])", r"\1<SPACE>\2", output)
    output = re.sub(r"\s+", "", output)
    output = output.replace("<SPACE>", " ")
    return output


def topk_filter_size(vocab_size: int, threshold: float = 0.9) -> int:
    """Number of logits kept by the reference's top-k filter.

    The reference computes ``int((1 - threshold) * V)`` (utils.py:87); for
    threshold=0.9, V=1000 float arithmetic gives 99.999... -> 99, not 100.
    We reproduce the exact expression so the filter size matches bit-for-bit.
    """
    return int((1 - threshold) * vocab_size)


def topk_filter(logits: jnp.ndarray, threshold: float = 0.9) -> jnp.ndarray:
    """Keep the top-k logits, setting the rest to -inf (reference utils.py:85-91).

    ``logits``: (..., V). Static k derived from the vocab size. Exactly k
    logits survive, including on ties (``lax.top_k`` keeps the first k like
    ``torch.topk``); a threshold implying k == 0 raises rather than silently
    keeping everything.
    """
    import jax

    k = topk_filter_size(logits.shape[-1], threshold)
    if k <= 0:
        raise ValueError(
            f"top-k filter keeps 0 logits (vocab={logits.shape[-1]}, "
            f"threshold={threshold}); the reference degenerates to all -inf "
            "here — refusing instead."
        )
    vals, idx = jax.lax.top_k(logits, k)
    return jnp.put_along_axis(
        jnp.full_like(logits, -jnp.inf), idx, vals, axis=-1, inplace=False
    )


def max_negative_val(dtype) -> float:
    """Most negative finite value for a dtype (reference utils.py:81-83)."""
    return -float(jnp.finfo(dtype).max)


# ---------------------------------------------------------------------------
# SAME-padding math (reference utils.py:93-123). The convs in the JAX model
# use lax's 'SAME' padding, which matches the reference's dynamic pad_same
# split (lo = total // 2, hi = total - lo) exactly; these helpers exist for
# host-side shape planning and for the test suite to cross-check that claim.
# ---------------------------------------------------------------------------


def get_padding(kernel_size: int, stride: int = 1, dilation: int = 1) -> int:
    """Static symmetric padding for a conv layer (reference utils.py:93-96)."""
    return ((stride - 1) + dilation * (kernel_size - 1)) // 2


def get_same_padding(x: int, k: int, s: int, d: int = 1) -> int:
    """Total SAME padding along one spatial dim (reference utils.py:98-100)."""
    return max((math.ceil(x / s) - 1) * s + (k - 1) * d + 1 - x, 0)


def is_static_pad(kernel_size: int, stride: int = 1, dilation: int = 1) -> bool:
    """Whether SAME padding is input-independent (reference utils.py:102-104)."""
    return stride == 1 and (dilation * (kernel_size - 1)) % 2 == 0


def same_pad_lo_hi(x: int, k: int, s: int, d: int = 1) -> Tuple[int, int]:
    """(lo, hi) SAME padding split used by the reference (utils.py:116-123)."""
    total = get_same_padding(x, k, s, d)
    return total // 2, total - total // 2


def pad_to_multiple(x: int, multiple: int) -> int:
    """Round ``x`` up to the next multiple (render-time canvas rule:
    reference render_data.py:81-92 pads height to 16k and width to 64k)."""
    return ((x + multiple - 1) // multiple) * multiple


def exact_match(pred: List[int], target: List[int]) -> bool:
    """Token-level exact match between two id sequences."""
    return list(pred) == list(target)


def count_parameters(params) -> int:
    """Total parameter count of a pytree (reference utils.py:37-39)."""
    import jax

    return sum(int(x.size) for x in jax.tree.leaves(params))


def alphabetize_config(config: dict, path: str = "config.yml") -> dict:
    """Sort a config dict by key and rewrite it (reference utils.py:30-35)."""
    import yaml

    config = dict(sorted(config.items()))
    with open(path, "w") as f:
        yaml.dump(config, f)
    return config


def center_pad_image(img, height: int, width: int, fill: float = 0.0):
    """Center-pad an (H, W, C) array to (height, width) — the reference's
    ImagePadding transform (reference dataset.py:78-106; defined there but
    never applied, since padding happens at render time)."""
    import numpy as _np

    pad_h = height - img.shape[0]
    pad_w = width - img.shape[1]
    return _np.pad(
        img,
        (
            (pad_h // 2, pad_h - pad_h // 2),
            (pad_w // 2, pad_w - pad_w // 2),
        )
        + ((0, 0),) * (img.ndim - 2),
        constant_values=fill,
    )
