"""Serving: the TeXOCR inference wrapper (image -> LaTeX)."""

from texocr_tpu.serving.wrapper import TexOCR  # noqa: F401
