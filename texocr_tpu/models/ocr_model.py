"""Top-level OCR model: hybrid ViT encoder + autoregressive decoder.

Mirrors the reference's OCRModel wiring (reference model/ocr_model.py:14-66):
the target padding mask is (trg != pad) and the decoder shifts the target into
(x_in = trg[:, :-1], x_out = trg[:, 1:]) with the mask trimmed to match
(reference decoder.py:132-137). The loss lives in
``texocr_tpu.training.losses`` (functional, jit-friendly) rather than inside
the module.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from texocr_tpu.config import ModelConfig
from texocr_tpu.models.decoder import TransformerDecoder
from texocr_tpu.models.encoder import VisionEncoder


class OCRModel(nn.Module):
    config: ModelConfig

    def setup(self):
        dtype = jnp.dtype(self.config.dtype)
        self.encoder = VisionEncoder(
            self.config.encoder,
            dtype=dtype,
            use_flash=self.config.use_flash_attention,
            remat=self.config.remat,
            remat_prevent_cse=self.config.remat_prevent_cse,
            name="encoder",
        )
        self.decoder = TransformerDecoder(
            self.config.decoder,
            dtype=dtype,
            use_flash=self.config.use_flash_attention,
            remat=self.config.remat,
            remat_prevent_cse=self.config.remat_prevent_cse,
            name="decoder",
        )

    def target_mask(self, targets: jnp.ndarray) -> jnp.ndarray:
        return targets != self.config.pad_token

    def encode(self, images: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """(B, H, W, 1) -> (B, N_patches + 1, D)."""
        return self.encoder(images, deterministic=deterministic)

    def __call__(
        self,
        images: jnp.ndarray,
        targets: jnp.ndarray,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Teacher-forced logits.

        Returns (logits (B, T-1, V), labels (B, T-1)) — the shifted pair the
        loss is computed over (reference decoder.py:132-140).
        """
        trg_mask = self.target_mask(targets)
        enc = self.encode(images, deterministic=deterministic)
        x_in, x_out = targets[:, :-1], targets[:, 1:]
        logits = self.decoder(
            x_in,
            enc=enc,
            mask=trg_mask[:, :-1],
            deterministic=deterministic,
        )
        return logits, x_out

    # Exposed for the generate/serving path (see models/generate.py).

    def decode_logits(
        self,
        tokens: jnp.ndarray,
        enc: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        return self.decoder(tokens, enc=enc, mask=mask)

    def decoder_init_cache(self, batch: int, max_len: int):
        return self.decoder.init_cache(
            batch, max_len, quant=self.config.self_kv_quant
        )

    def decoder_init_hot(self, batch: int, window: int):
        return self.decoder.init_hot(batch, window)

    def decoder_cross_kv(self, enc: jnp.ndarray):
        return self.decoder.precompute_cross_kv(enc, quant=self.config.kv_quant)

    def decoder_step(self, token_t, index, w, cache, hot, cross_kv,
                     enc_mask=None, fused_qkv=None):
        return self.decoder.step(
            token_t, index, w, cache, hot, cross_kv=cross_kv,
            enc_mask=enc_mask, fused_qkv=fused_qkv,
        )

    def decoder_step_beam(self, token_t, index, w, cache, hot, beam_sel,
                          cross_kv, enc_mask=None):
        return self.decoder.step_beam(
            token_t, index, w, cache, hot, beam_sel, cross_kv=cross_kv,
            enc_mask=enc_mask,
        )


def create_model(config: dict) -> OCRModel:
    """Factory from a reference-format config dict (reference ocr_model.py:113-130)."""
    return OCRModel(ModelConfig.from_dict(config))
