"""Hybrid ResNet+ViT vision encoder (reference model/encoder.py).

Pipeline: ResNetV2 backbone -> 1x1 patch projection (the reduced patch size is
patch_size / 16 = 1 with the default 3-stage backbone; reference
encoder.py:162-169) -> prepend CLS token -> 2-D-aware learned positional
embedding -> shared-norm attention stack -> final LayerNorm.

The positional embedding is stored for the maximum (160, 1008) grid and
statically sliced by the input's (h, w) patch grid so smaller canvases reuse
the top-left of the grid (reference encoder.py:136-143). Because input
shapes come from a bounded bucket set (render rule: h mult of 16, w mult of
64; reference render_data.py:81-92), every distinct shape compiles once and
the slice is static — no gather at runtime.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from texocr_tpu.config import EncoderConfig
from texocr_tpu.models.attention import AttentionStack
from texocr_tpu.models.layers import Conv1x1, Dtype, uniform_in
from texocr_tpu.models.resnet import ResNetV2


class PatchEmbedding(nn.Module):
    """Plain strided-conv ViT patchify: (B, H, W, C) -> (B, h*w, D), with
    kernel = stride = patch_size (reference encoder.py:11-28 — defined there
    but unused by the factory; available here via encoder.embed_layer='patch').
    Implemented as a reshape + single matmul, which is how a stride=kernel
    conv maps onto the MXU."""

    patch_size: int
    embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, height, width, c = x.shape
        p = self.patch_size
        fan_in = c * p * p
        bound = 1.0 / (fan_in ** 0.5)
        kernel = self.param(
            "kernel", uniform_in(bound), (fan_in, self.embed_dim), jnp.float32
        )
        bias = self.param("bias", uniform_in(bound), (self.embed_dim,), jnp.float32)
        h, w = height // p, width // p
        patches = (
            x[:, : h * p, : w * p]
            .reshape(b, h, p, w, p, c)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, h * w, fan_in)
        )
        return (
            jnp.dot(patches.astype(self.dtype), kernel.astype(self.dtype))
            + bias.astype(self.dtype)
        )


class VisionEncoder(nn.Module):
    """(B, H, W, 1) image -> (B, h*w + 1, D) patch embeddings (CLS first)."""

    config: EncoderConfig
    dtype: Dtype = jnp.float32
    use_flash: bool = False
    remat: bool = False
    remat_prevent_cse: bool = True

    def setup(self):
        cfg = self.config
        if cfg.embed_layer == "hybrid":
            self.backbone = ResNetV2(
                depths=tuple(cfg.resnet_depths),
                channels=tuple(cfg.resnet_channels),
                stem_channels=cfg.stem_channels,
                dtype=self.dtype,
                remat=self.remat,
                remat_prevent_cse=self.remat_prevent_cse,
                name="backbone",
            )
            # Reduced patchify: with the /16 backbone the projection is
            # pointwise (reduced patch size 1; reference encoder.py:166-168).
            reduced = cfg.patch_size // (2 ** (len(cfg.resnet_depths) + 1))
            if reduced != 1:
                raise NotImplementedError(
                    "Only reduced patch size 1 (patch_size 16 with a 3-stage "
                    "backbone) is supported, matching the reference factory."
                )
            self.proj = Conv1x1(cfg.embed_dim, dtype=self.dtype, name="proj")
        elif cfg.embed_layer == "patch":
            self.patch_embed = PatchEmbedding(
                patch_size=cfg.patch_size,
                embed_dim=cfg.embed_dim,
                dtype=self.dtype,
                name="patch_embed",
            )
        else:
            raise ValueError(f"unknown embed_layer: {cfg.embed_layer!r}")

        max_h, max_w = self.max_grid()
        self.cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, cfg.embed_dim), jnp.float32
        )
        # Zero-init like the reference (encoder.py:106-107; its init_weights
        # override is commented out, so the torch.zeros survive).
        self.pos_embed = self.param(
            "pos_embed",
            nn.initializers.zeros,
            (1, max_h * max_w + 1, cfg.embed_dim),
            jnp.float32,
        )
        self.attn_layers = AttentionStack(
            embed_dim=cfg.embed_dim,
            num_layers=cfg.num_layers,
            heads=cfg.heads,
            causal=False,
            cross_attend=False,
            # The reference factory passes no ff_kwargs to the encoder stack
            # (encoder.py:182-190): glu defaults True, exp_factor 4, dropout 0.
            glu=True,
            exp_factor=4,
            ff_dropout=0.0,
            dtype=self.dtype,
            use_flash=self.use_flash,
            remat=self.remat,
            remat_prevent_cse=self.remat_prevent_cse,
            name="attn_layers",
        )
        self.norm = nn.LayerNorm(
            epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32, name="norm"
        )

    def max_grid(self) -> Tuple[int, int]:
        cfg = self.config
        return (
            cfg.img_size[0] // cfg.patch_size,
            cfg.img_size[1] // cfg.patch_size,
        )

    def __call__(self, images: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        b, img_h, img_w, _ = images.shape
        if cfg.embed_layer == "hybrid":
            feats = self.backbone(images.astype(self.dtype))  # (B, h, w, 1024)
            x = self.proj(feats)
            _, h, w, d = x.shape
            x = x.reshape(b, h * w, d)
        else:
            h, w = img_h // cfg.patch_size, img_w // cfg.patch_size
            x = self.patch_embed(images.astype(self.dtype))
            d = x.shape[-1]

        cls = jnp.broadcast_to(
            self.cls_token.astype(self.dtype), (b, 1, d)
        )
        x = jnp.concatenate([cls, x], axis=1)

        # Static 2-D grid slice of the positional table (reference
        # encoder.py:136-143): smaller images use the top-left (h, w) block.
        max_h, max_w = self.max_grid()
        grid = np.arange(max_h * max_w).reshape(max_h, max_w)
        pos_ids = np.concatenate([[0], grid[:h, :w].reshape(-1) + 1])
        pos = jnp.take(self.pos_embed[0], jnp.asarray(pos_ids), axis=0)
        x = x + pos.astype(self.dtype)[None]

        x = self.attn_layers(x, deterministic=deterministic)
        x = self.norm(x.astype(jnp.float32)).astype(self.dtype)
        return x

    def num_patches(self, img_hw: Tuple[int, int]) -> int:
        h, w = ResNetV2.feature_grid(img_hw, len(self.config.resnet_depths))
        return h * w + 1
