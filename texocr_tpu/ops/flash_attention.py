"""Pallas TPU flash attention (forward).

Replaces XLA's materialized (B, H, N, N) float32 score tensors — ~1.6 GB per
encoder layer at batch 64, the encoder's bandwidth bottleneck — with a
blockwise kernel whose scores live only in VMEM.

Design (tuned for this model's shapes: N <= ~1k, head_dim 64):
- Full-K single-pass: the entire padded K/V for one (batch, head) fits in
  VMEM (640 x 128 bf16 = 164 KB each), so the kernel loads K/V once per
  (b, h) and iterates q blocks innermost — Pallas skips the re-fetch when the
  block index is unchanged, so K/V traffic is O(B*H*N*dh), not O(.. * Nq/bq).
  No online-softmax bookkeeping is needed: each q block sees all keys at once
  and softmaxes directly in VMEM (float32).
- head_dim is zero-padded 64 -> 128 (the TPU lane width); the MXU tiles at
  128 anyway, so the padding costs bandwidth only on Q/V, not extra FLOPs.
- Masking: optional causal (right-aligned not needed here: q and k are the
  same sequence when causal=True) and optional per-row key length
  (``kv_lens``) for tail padding; mask value is -0.7*f32max per the standard
  TPU practice (avoids exp(-inf - -inf) NaNs).

Gradients flow via jax.custom_vjp with the XLA attention's VJP (training
sequences here are short, so the materialized backward is fine); the forward
hot paths (encoder at serving/eval time) take the kernel.
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
LANES = 128
MAX_KV_FOR_FULL_K = 4096  # VMEM budget: scores block (128, N) f32 + K/V


def flash_attention_supported(q, k, allowed=None) -> bool:
    """Shapes/masks the kernel handles; callers fall back to XLA otherwise."""
    if allowed is not None:
        return False  # arbitrary dense masks stay on the XLA path
    if q.ndim != 4 or k.ndim != 4:
        return False
    if q.shape[-1] > LANES:
        return False
    if k.shape[2] > MAX_KV_FOR_FULL_K:
        return False
    if q.shape[2] < 2:
        return False  # single-query decode steps: XLA path is fine
    return True


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _fa_kernel(kv_len_ref, q_ref, k_ref, v_ref, o_ref, *, scale, causal,
               block_q):
    """One (batch, head, q-block) cell; K/V blocks span the whole sequence.

    q_ref: (1, 1, block_q, dh); k_ref/v_ref: (1, 1, n_k, dh);
    o_ref: (1, 1, block_q, dh); kv_len_ref: (B,) int32 scalar-prefetch —
    per-batch valid key counts, indexed by the batch grid coordinate.
    """
    bi = pl.program_id(0)
    qi = pl.program_id(2)

    q = q_ref[0, 0]  # (block_q, dh)
    k = k_ref[0, 0]  # (n_k, dh)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale

    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    mask = col < kv_len_ref[bi]
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + qi * block_q
        mask = mask & (col <= row)
    s = jnp.where(mask, s, MASK_VALUE)

    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    p = p / l

    v = v_ref[0, 0]  # (n_k, dh)
    o = jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    o_ref[0, 0] = o.astype(o_ref.dtype)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    allowed=None,
    causal: bool = False,
    kv_lens: Optional[jnp.ndarray] = None,
    block_q: int = 128,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """(B, H, Nq, dh) x (B, H, Nk, dh)^2 -> (B, H, Nq, dh), matching
    xla_attention numerics (softmax in f32). ``kv_lens``: optional (B,) int32
    valid-key counts (tail padding); defaults to all keys valid.

    ``interpret`` forces Pallas interpreter mode (used on CPU in tests);
    defaults to interpret-on-CPU-backend.
    """
    assert allowed is None, "dense masks are not supported by the kernel"
    b, h, n_q, dh = q.shape
    n_k = k.shape[2]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    out_dtype = q.dtype
    n_q_pad = _round_up(n_q, block_q)
    n_k_pad = _round_up(n_k, LANES)
    dh_pad = LANES

    def pad_to(x, n_pad):
        return jnp.pad(
            x,
            ((0, 0), (0, 0), (0, n_pad - x.shape[2]), (0, dh_pad - dh)),
        )

    qp, kp, vp = pad_to(q, n_q_pad), pad_to(k, n_k_pad), pad_to(v, n_k_pad)

    if kv_lens is None:
        kv_lens = jnp.full((b,), n_k, dtype=jnp.int32)
    kv_lens = kv_lens.astype(jnp.int32)

    grid = (b, h, n_q_pad // block_q)
    kernel = functools.partial(
        _fa_kernel,
        scale=scale,
        causal=causal,
        block_q=block_q,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, n_q_pad, dh_pad), out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, 1, block_q, dh_pad), lambda b_, h_, q_, lens: (b_, h_, q_, 0)
                ),
                # K/V: the full sequence per (b, h); the index map ignores the
                # q-block coordinate, so Pallas keeps the block resident
                # across the (innermost) q iteration — one HBM fetch per head.
                pl.BlockSpec(
                    (1, 1, n_k_pad, dh_pad), lambda b_, h_, q_, lens: (b_, h_, 0, 0)
                ),
                pl.BlockSpec(
                    (1, 1, n_k_pad, dh_pad), lambda b_, h_, q_, lens: (b_, h_, 0, 0)
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, block_q, dh_pad), lambda b_, h_, q_, lens: (b_, h_, q_, 0)
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kv_lens, qp, kp, vp)
    return out[:, :, :n_q, :dh]


# -- differentiable wrapper ---------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention_diff(q, k, v, scale, causal):
    return flash_attention(q, k, v, scale=scale, causal=causal)


def _fad_fwd(q, k, v, scale, causal):
    return flash_attention_diff(q, k, v, scale, causal), (q, k, v)


def _fad_bwd(scale, causal, res, g):
    from texocr_tpu.ops.attention_core import xla_attention

    q, k, v = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: xla_attention(q_, k_, v_, scale=scale, causal=causal),
        q, k, v,
    )
    return vjp(g)


flash_attention_diff.defvjp(_fad_fwd, _fad_bwd)
