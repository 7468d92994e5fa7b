"""texocr_tpu — a TPU-native image-to-LaTeX OCR framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of the PyTorch
reference TeXOCR (image of a rendered equation -> LaTeX token string), designed
TPU-first:

- Flax models compiled with ``jax.jit`` / ``pjit`` over a named device mesh.
- Static-shape, KV-cached autoregressive decoding via ``lax.while_loop``.
- Shape-bucketed input pipeline producing a bounded set of compiled shapes.
- Optional Pallas flash-attention kernels on the hot attention paths.

Public surface mirrors the reference's L0-L7 layer map (see SURVEY.md).
"""

__version__ = "0.1.0"

from texocr_tpu.config import load_config  # noqa: F401
