"""Pallas TPU kernel for single-query (decode-step) attention.

The decode loop is op-latency bound: at (B, 1, D) activation sizes each XLA
op costs ~5-10us of fixed latency, and every attention call is ~6 ops
(einsum, scale, iota, mask-where, softmax, einsum). This kernel fuses them
into ONE op per attention call, reading K/V in the decode cache layout
(B, H, dh, T) blockwise through the Pallas pipeline.

Used for both the cached self-attention (valid keys = positions <= index)
and the cross-attention (valid keys = all N, or per-row kv_lens). The cache
UPDATE (dynamic_update_slice) stays in XLA where it aliases in place — making
the cache a kernel output would force a full-cache writeback per step.

Numerics match models.attention.MultiHeadAttention._attend_transposed:
f32 score accumulation, -0.7*f32max masked fill, f32 softmax.

STATUS: validated against the XLA path (tests) but NOT wired into the decode
loop — measured 2x SLOWER end-to-end on v5e (635ms vs 327ms for the headline
batch-64 256-step decode). The per-(batch, head) single-query dots map poorly
onto the MXU and lose XLA's DMA/compute overlap. Kept as infrastructure for
revisiting with a better inner structure (e.g. head-batched dots).
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)


def _kernel(limit_ref, q_ref, k_ref, v_ref, o_ref, *, scale, batch_block):
    """One (batch-block, head) cell.

    q_ref: (BB, 1, 1, dh); k_ref/v_ref: (BB, 1, dh, T); o_ref: (BB, 1, 1, dh);
    limit_ref: (B,) int32 scalar-prefetch — number of valid keys per batch row.
    """
    bi = pl.program_id(0)
    t = k_ref.shape[3]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)
    for i in range(batch_block):
        row = bi * batch_block + i
        q = q_ref[i, 0]  # (1, dh)
        k = k_ref[i, 0]  # (dh, T)
        s = jax.lax.dot_general(
            q, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (1, T)
        s = jnp.where(col < limit_ref[row], s, MASK_VALUE)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        v = v_ref[i, 0]  # (dh, T)
        o = jax.lax.dot_general(
            p.astype(v.dtype),
            v,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, dh)
        o_ref[i, 0, 0] = o[0].astype(o_ref.dtype)


def decode_attention(
    q: jnp.ndarray,
    k_t: jnp.ndarray,
    v_t: jnp.ndarray,
    *,
    scale: float,
    limit,
    batch_block: int = 8,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """softmax(q K^T) V for a single query position.

    q: (B, H, 1, dh); k_t/v_t: (B, H, dh, T) (transposed cache layout).
    ``limit``: scalar or (B,) int32 — keys at positions >= limit are masked
    (pass index+1 for causal cached self-attention, T or enc lengths for
    cross). Returns (B, H, 1, dh) in q's dtype.
    """
    b, h, _, dh = q.shape
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    limit = jnp.broadcast_to(jnp.asarray(limit, jnp.int32), (b,))
    while b % batch_block:
        batch_block //= 2

    grid = (b // batch_block, h)
    kernel = functools.partial(
        _kernel, scale=scale, batch_block=batch_block
    )
    t = k_t.shape[3]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, 1, dh), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (batch_block, 1, 1, dh), lambda b_, h_, lim: (b_, h_, 0, 0)
                ),
                pl.BlockSpec(
                    (batch_block, 1, dh, t), lambda b_, h_, lim: (b_, h_, 0, 0)
                ),
                pl.BlockSpec(
                    (batch_block, 1, dh, t), lambda b_, h_, lim: (b_, h_, 0, 0)
                ),
            ],
            out_specs=pl.BlockSpec(
                (batch_block, 1, 1, dh), lambda b_, h_, lim: (b_, h_, 0, 0)
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(limit, q, k_t, v_t)
    return out
