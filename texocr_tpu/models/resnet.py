"""Pre-activation-free ResNetV2-style CNN stem (reference model/resnet.py).

NHWC, weight-standardized convs, GroupNorm(32)+ReLU, TF-SAME padding.
Configuration matches the reference backbone used by the hybrid embed:
depths (2, 4, 6), channels (256, 512, 1024), stem 7x7/s2 + 3x3/s2 maxpool,
stage strides (1, 2, 2) -> total output stride 16, feature dim 1024
(reference resnet.py:200-254; (1,1,160,1008) -> (1,1024,10,63) verified in
SURVEY.md §2.1). Convolutions are plain XLA convs — they tile onto the MXU
directly and XLA fuses the GN/ReLU elementwise chain behind them.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from texocr_tpu.models.layers import Dtype, GroupNormAct, WSConv, max_pool_same


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1 WS-conv/GN bottleneck, ReLU after the
    residual add; bottle_ratio 0.25 (reference resnet.py:100-149)."""

    out_channels: int
    stride: int = 1
    bottle_ratio: float = 0.25
    use_proj: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mid = int(self.out_channels * self.bottle_ratio)
        res = x
        if self.use_proj:
            # DownSample: 1x1 WS-conv + GN without activation (resnet.py:82-97).
            res = WSConv(
                self.out_channels,
                (1, 1),
                strides=(self.stride, self.stride),
                dtype=self.dtype,
                name="proj_conv",
            )(x)
            res = GroupNormAct(act=False, dtype=self.dtype, name="proj_norm")(res)

        h = WSConv(mid, (1, 1), dtype=self.dtype, name="conv1")(x)
        h = GroupNormAct(dtype=self.dtype, name="norm1")(h)
        h = WSConv(
            mid, (3, 3), strides=(self.stride, self.stride), dtype=self.dtype,
            name="conv2",
        )(h)
        h = GroupNormAct(dtype=self.dtype, name="norm2")(h)
        h = WSConv(self.out_channels, (1, 1), dtype=self.dtype, name="conv3")(h)
        h = GroupNormAct(act=False, dtype=self.dtype, name="norm3")(h)
        return nn.relu(h + res)


class Stage(nn.Module):
    """``depth`` bottlenecks; the first carries the stride and the projection
    shortcut (reference resnet.py:152-197)."""

    out_channels: int
    depth: int
    stride: int
    dtype: Dtype = jnp.float32
    remat: bool = False
    remat_prevent_cse: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # remat: store only the block-boundary activations for backward and
        # recompute each bottleneck's conv/GN intermediates — the backbone's
        # early high-resolution feature maps dominate training HBM at the
        # (160, 1008) canvas. Param structure is unchanged (nn.remat lifts
        # the module transparently), so checkpoints are interchangeable.
        # prevent_cse=False only inside the scan train step (see
        # models/attention.py:_sublayer_step_remat for the full rationale).
        block_cls = (
            nn.remat(Bottleneck, prevent_cse=self.remat_prevent_cse)
            if self.remat
            else Bottleneck
        )
        for i in range(self.depth):
            x = block_cls(
                out_channels=self.out_channels,
                stride=self.stride if i == 0 else 1,
                use_proj=(i == 0),
                dtype=self.dtype,
                name=f"block{i}",
            )(x)
        return x


class ResNetV2(nn.Module):
    """CNN backbone feeding the hybrid ViT embed (reference resnet.py:200-254)."""

    depths: Sequence[int] = (2, 4, 6)
    channels: Sequence[int] = (256, 512, 1024)
    stem_channels: int = 64
    out_stride: int = 32
    dtype: Dtype = jnp.float32
    remat: bool = False
    remat_prevent_cse: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, C_in) -> (B, H/16, W/16, channels[-1]) for the default config."""
        h = WSConv(
            self.stem_channels, (7, 7), strides=(2, 2), dtype=self.dtype,
            name="stem_conv",
        )(x)
        h = GroupNormAct(dtype=self.dtype, name="stem_norm")(h)
        h = max_pool_same(h, window=3, stride=2)

        curr_stride = 4
        for stage_id, (depth, ch) in enumerate(zip(self.depths, self.channels)):
            stride = 1 if stage_id == 0 else 2
            if curr_stride >= self.out_stride:
                stride = 1
            h = Stage(
                out_channels=ch,
                depth=depth,
                stride=stride,
                dtype=self.dtype,
                remat=self.remat,
                remat_prevent_cse=self.remat_prevent_cse,
                name=f"stage{stage_id}",
            )(h)
            curr_stride *= stride
        return h

    @staticmethod
    def feature_grid(img_hw: Tuple[int, int], depths_len: int = 3) -> Tuple[int, int]:
        """Static output spatial dims for patch-multiple inputs: the stem is
        /4 and every stage after the first is /2 -> /16 total for 3 stages.
        Replaces the reference's zeros-forward probe (encoder.py:50-57) with
        static shape math (all pads are SAME => ceil division)."""
        stride = 4 * (2 ** (depths_len - 1))

        def cdiv(a: int, b: int) -> int:
            return -(-a // b)

        return cdiv(img_hw[0], stride), cdiv(img_hw[1], stride)
