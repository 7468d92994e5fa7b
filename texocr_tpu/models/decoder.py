"""Causal cross-attending transformer decoder (reference model/decoder.py).

Token embedding (N(0, 0.02)) + learned absolute positional embedding
(N(0, 0.02)) -> embed dropout -> shared-norm attention stack (causal self +
cross) -> final LayerNorm -> logits projection (reference decoder.py:10-67).

Two execution paths:
- ``__call__``: full teacher-forced forward over (B, T) tokens (training /
  parity checks).
- ``precompute_cross_kv`` + ``init_cache`` + ``step``: the KV-cached decode
  path driven by ``texocr_tpu.models.generate`` inside a jitted
  ``lax.while_loop`` — this replaces the reference's O(T^2) full re-forward
  generation loop (reference decoder.py:97-116).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from texocr_tpu.config import DecoderConfig
from texocr_tpu.models.attention import AttentionStack, KVCache
from texocr_tpu.models.layers import Dtype, TorchDense, normal_init


class TransformerDecoder(nn.Module):
    config: DecoderConfig
    dtype: Dtype = jnp.float32
    use_flash: bool = False
    remat: bool = False
    remat_prevent_cse: bool = True

    def setup(self):
        cfg = self.config
        self.token_embedding = nn.Embed(
            cfg.vocab_size,
            cfg.embed_dim,
            embedding_init=normal_init(0.02),
            param_dtype=jnp.float32,
            dtype=self.dtype,
            name="token_embedding",
        )
        self.pos_embedding = nn.Embed(
            cfg.max_length,
            cfg.embed_dim,
            embedding_init=normal_init(0.02),
            param_dtype=jnp.float32,
            dtype=self.dtype,
            name="pos_embedding",
        )
        self.embed_dropout = nn.Dropout(cfg.dropout)
        self.attn_layers = AttentionStack(
            embed_dim=cfg.embed_dim,
            num_layers=cfg.num_layers,
            heads=cfg.heads,
            causal=True,
            cross_attend=cfg.cross_attend,
            glu=cfg.glu,
            exp_factor=cfg.exp_factor,
            ff_dropout=0.0,  # reference passes no dropout into ff_kwargs
            dtype=self.dtype,
            use_flash=self.use_flash,
            remat=self.remat,
            remat_prevent_cse=self.remat_prevent_cse,
            name="attn_layers",
        )
        self.norm = nn.LayerNorm(
            epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32, name="norm"
        )
        self.to_logits = TorchDense(
            cfg.vocab_size, dtype=self.dtype, name="to_logits"
        )

    def _embed(self, tokens: jnp.ndarray, positions: jnp.ndarray) -> jnp.ndarray:
        return self.token_embedding(tokens) + self.pos_embedding(positions)

    def __call__(
        self,
        tokens: jnp.ndarray,
        enc: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        enc_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        return_embeddings: bool = False,
        return_attn: bool = False,
    ):
        """Teacher-forced logits for (B, T) token ids -> (B, T, V).

        ``return_embeddings``: return the pre-logits hidden states instead
        (reference decoder.py:60); ``return_attn``: also return the
        post-softmax attention maps per attention sub-layer (decoder.py:63-65).
        """
        t = tokens.shape[1]
        if t > self.config.max_length:
            raise ValueError(
                f"sequence length {t} exceeds the positional table "
                f"(max_length={self.config.max_length}) — positions past the "
                "table would read as NaN."
            )
        x = self._embed(tokens, jnp.arange(t)[None, :])
        x = self.embed_dropout(x, deterministic=deterministic)
        x = self.attn_layers(
            x, enc=enc, mask=mask, enc_mask=enc_mask,
            deterministic=deterministic, return_hidden=return_attn,
        )
        if return_attn:
            x, intermediates = x
        x = self.norm(x.astype(jnp.float32)).astype(self.dtype)
        out = x if return_embeddings else self.to_logits(x)
        if return_attn:
            maps = [
                m["post_softmax_attn"]
                for m in intermediates["attn_intermediates"]
            ]
            return out, maps
        return out

    # -- cached decode --------------------------------------------------------

    def init_cache(self, batch: int, max_len: int,
                   quant: str = "none") -> KVCache:
        return self.attn_layers.init_cache(batch, max_len, quant=quant)

    def init_hot(self, batch: int, window: int) -> KVCache:
        return self.attn_layers.init_hot(batch, window)

    def precompute_cross_kv(self, enc: jnp.ndarray, quant: str = "none"):
        return self.attn_layers.precompute_cross_kv(enc, quant=quant)

    def step(
        self,
        token_t: jnp.ndarray,
        index: jnp.ndarray,
        w: jnp.ndarray,
        cache: KVCache,
        hot: KVCache,
        cross_kv=None,
        enc_mask: Optional[jnp.ndarray] = None,
        fused_qkv=None,
    ) -> Tuple[jnp.ndarray, KVCache]:
        """Next-token logits for the token at absolute position ``index``.

        ``cache`` is the read-only merged prefix; ``hot`` the current
        chunk's window, appended at in-chunk position ``w`` (= index - t0).
        token_t: (B,) int32; returns ((B, V) logits, updated hot).
        """
        x = self._embed(token_t[:, None], index[None, None])
        x, hot = self.attn_layers.step(
            x, cache, hot, index - w, w, cross_kv=cross_kv, enc_mask=enc_mask,
            fused_qkv=fused_qkv,
        )
        x = self.norm(x.astype(jnp.float32)).astype(self.dtype)
        return self.to_logits(x)[:, 0, :], hot

    def step_beam(
        self,
        token_t: jnp.ndarray,
        index: jnp.ndarray,
        w: jnp.ndarray,
        cache: KVCache,
        hot: KVCache,
        beam_sel: jnp.ndarray,
        cross_kv=None,
        enc_mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, KVCache]:
        """Beam-search decode step: (B*beam,) token ids -> ((B*beam, V)
        logits, updated hot). Caches stay row-stable; ``beam_sel`` is the
        ancestry one-hot over absolute positions (see
        AttentionStack.step_beam). ``cross_kv``/``enc_mask`` are batch-level
        (unexpanded)."""
        x = self._embed(token_t[:, None], index[None, None])
        x, hot = self.attn_layers.step_beam(
            x, cache, hot, index - w, w, beam_sel, cross_kv=cross_kv,
            enc_mask=enc_mask,
        )
        x = self.norm(x.astype(jnp.float32)).astype(self.dtype)
        return self.to_logits(x)[:, 0, :], hot
