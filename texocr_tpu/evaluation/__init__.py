"""Evaluation: token accuracy (reference batch_acc semantics) + exact match."""

from texocr_tpu.evaluation.metrics import batch_acc, exact_match_rate  # noqa: F401
