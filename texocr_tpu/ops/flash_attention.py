"""Pallas TPU flash attention (placeholder gating; kernel lands separately).

Until the kernel is in place, ``flash_attention_supported`` returns False so
``attention_core`` always takes the XLA path.
"""

from __future__ import annotations


def flash_attention_supported(q, k, allowed=None) -> bool:
    return False


def flash_attention(q, k, v, *, scale, allowed=None, causal=False):
    raise NotImplementedError("Pallas flash attention kernel not yet wired in.")
