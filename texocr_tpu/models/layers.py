"""Shared building blocks for the TPU-native model stack.

Flax modules, NHWC layout (TPU-native), float32 params with a configurable
compute dtype (bfloat16 by default for MXU throughput; float32 for numeric
parity testing against the PyTorch reference).

Initializers replicate torch defaults (kaiming_uniform(a=sqrt(5)) for
Linear/Conv weights and uniform(+-1/sqrt(fan_in)) biases) so from-scratch
training dynamics match the reference; explicitly specified inits (N(0, 0.02)
embeddings, zero cls/pos embeddings) are replicated where the reference sets
them (reference attention.py:27-28, decoder.py:38-39, encoder.py:106-107).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = jnp.dtype


def uniform_in(bound: float):
    """U(-bound, bound) initializer (torch Linear/Conv default shape)."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def normal_init(std: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * std

    return init


class TorchDense(nn.Module):
    """Dense layer with torch's default init: U(+-1/sqrt(fan_in)) for both
    kernel and bias. Kernel layout (in, out)."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        bound = 1.0 / math.sqrt(in_features)
        kernel = self.param(
            "kernel", uniform_in(bound), (in_features, self.features), jnp.float32
        )
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", uniform_in(bound), (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class WSConv(nn.Module):
    """Weight-standardized conv with TF-style SAME padding, NHWC/HWIO.

    Matches the reference's StdConv2d (reference resnet.py:38-66): the kernel
    is normalized per output channel to zero mean / unit variance (biased, eps
    inside the sqrt — the F.batch_norm-over-weights trick at resnet.py:61-64)
    before the convolution. Standardization runs in float32; the conv runs in
    the compute dtype. lax 'SAME' padding reproduces the reference's
    pad_same lo/hi split exactly (cross-checked in tests/test_utils.py).
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    use_bias: bool = False
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        kh, kw = self.kernel_size
        fan_in = in_features * kh * kw
        bound = 1.0 / math.sqrt(fan_in)
        kernel = self.param(
            "kernel",
            uniform_in(bound),
            (kh, kw, in_features, self.features),
            jnp.float32,
        )
        # Standardize over (h, w, in) per output channel; biased variance.
        mean = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(kernel, axis=(0, 1, 2), keepdims=True)
        kernel = (kernel - mean) * jax.lax.rsqrt(var + self.eps)

        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=self.strides,
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", uniform_in(bound), (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class Conv1x1(nn.Module):
    """Plain 1x1 conv (patch projection), torch-default init.

    The hybrid embed projection (reference encoder.py:63) is an ordinary
    Conv2d; with the ResNet backbone the reduced patch size is 1
    (encoder.py:166-168), so this is a pointwise projection with bias.
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        bound = 1.0 / math.sqrt(in_features)
        kernel = self.param(
            "kernel", uniform_in(bound), (in_features, self.features), jnp.float32
        )
        bias = self.param("bias", uniform_in(bound), (self.features,), jnp.float32)
        return (
            jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
            + bias.astype(self.dtype)
        )


class GroupNormAct(nn.Module):
    """GroupNorm(32 groups, eps 1e-5) + optional ReLU (reference resnet.py:14-35).

    Statistics are computed in float32 regardless of compute dtype.
    """

    num_groups: int = 32
    act: bool = True
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        g = self.num_groups
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        # One-pass statistics: fused sum/sum-of-squares reductions in float32
        # (channels stay on the TPU lane dim), then the normalization folds
        # into a single elementwise multiply-add in the compute dtype. This
        # keeps activation traffic at ~2 reads + 1 write instead of the
        # multiple float32 passes a naive (x - mean)/std materializes —
        # measured 76ms -> 46ms on the full backbone at batch 64.
        xf = x.astype(jnp.float32)
        reduce_axes = tuple(range(1, x.ndim - 1))
        s1 = jnp.sum(xf, axis=reduce_axes)  # (B, C)
        s2 = jnp.sum(xf * xf, axis=reduce_axes)
        n = int(np.prod([x.shape[a] for a in reduce_axes])) * (c // g)
        mean = s1.reshape(-1, g, c // g).sum(-1) / n  # (B, G)
        # E[x^2] - E[x]^2 can dip slightly negative in fp before the rsqrt
        # (catastrophic cancellation on near-constant groups); clamp at 0.
        var = jnp.maximum(
            s2.reshape(-1, g, c // g).sum(-1) / n - mean * mean, 0.0
        )
        inv = jax.lax.rsqrt(var + self.eps)
        # Broadcast group stats back to channels and fold with the affine.
        mean_c = jnp.repeat(mean, c // g, axis=-1)  # (B, C)
        inv_c = jnp.repeat(inv, c // g, axis=-1)
        w = inv_c * scale[None]
        b = bias[None] - mean_c * w
        bshape = (x.shape[0],) + (1,) * (x.ndim - 2) + (c,)
        y = x.astype(self.dtype) * w.astype(self.dtype).reshape(bshape) + b.astype(
            self.dtype
        ).reshape(bshape)
        if self.act:
            y = nn.relu(y)
        return y


def max_pool_same(x: jnp.ndarray, window: int, stride: int) -> jnp.ndarray:
    """Max pool with -inf SAME padding (reference resnet.py:69-79)."""
    return nn.max_pool(
        x,
        window_shape=(window, window),
        strides=(stride, stride),
        padding="SAME",
    )


class MLP(nn.Module):
    """Transformer FFN with GeGLU gate (reference attention.py:41-67).

    fc_in: Dense(embed -> 2*hidden), split into (value, gate), value *
    gelu(gate) with torch's exact (erf) gelu; fc_out: Dense(hidden -> embed).
    The non-GLU variant is Dense + exact gelu.
    """

    embed_dim: int
    exp_factor: int = 4
    glu: bool = True
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        hidden = self.embed_dim * self.exp_factor
        if self.glu:
            h = TorchDense(hidden * 2, dtype=self.dtype, name="fc_in")(x)
            value, gate = jnp.split(h, 2, axis=-1)
            h = value * nn.gelu(gate, approximate=False)
        else:
            h = TorchDense(hidden, dtype=self.dtype, name="fc_in")(x)
            h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return TorchDense(self.embed_dim, dtype=self.dtype, name="fc_out")(h)
