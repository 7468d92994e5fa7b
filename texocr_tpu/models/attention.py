"""Multi-head attention and the shared-norm attention stack.

Replicates the reference's non-standard architecture exactly (required for
checkpoint parity; reference attention.py:70-281):

- QKV projections WITHOUT bias to inner dim heads*64 (512), which differs
  from the 256 embed dim (attention.py:87-91).
- Output projection is Dense(512 -> 2*embed) followed by a GLU gate
  (attention.py:96-99).
- ONE LayerNorm instance is shared by every pre-norm and inter-layer norm in
  the stack (attention.py:200,221), and each non-final sub-layer output gets
  an extra post-residual norm (attention.py:257-259) — a "double-norm"
  residual stream. We reproduce both.
- Masked positions are filled with -finfo.max (not -inf), so fully-masked
  rows softmax to uniform exactly like the reference (attention.py:149-163).

Attention math runs through ``texocr_tpu.ops.attention_core`` so the XLA
einsum path and the Pallas flash-attention path are interchangeable.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from texocr_tpu.models.layers import MLP, Dtype, TorchDense
from texocr_tpu.ops.attention_core import attention_core

#: Decode-time self-attention cache: per-layer tuple of {"k","v"} arrays.
#: The MERGED cache is (B, H, dh, T) (see AttentionStack.init_cache); the
#: per-chunk HOT window is sequence-major (W, B, H, dh) (init_hot). The two
#: are combined by merge_hot at chunk boundaries.
KVCache = Tuple[Dict[str, jnp.ndarray], ...]


def _split_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    b, n, _ = x.shape
    return x.reshape(b, n, heads, -1).transpose(0, 2, 1, 3)  # (B, H, N, dh)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)


def _quantize_chunk(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-position int8 quantization of a (B, H, dh, W) chunk: scales over
    dh so every appended position carries its own scale — append-only
    semantics, no requantization of earlier positions ever."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=2)  # (B, H, W)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale[:, :, None, :]), -127, 127).astype(
        jnp.int8
    )
    return q, scale[:, :, None, :].astype(x.dtype)  # (B, H, 1, W)


def merge_hot(cache: KVCache, hot: KVCache, t0) -> KVCache:
    """Fold a decoded chunk's hot K/V window into the merged cache.

    ``cache``: per-layer (B, H, dh, T); ``hot``: per-layer (W, B, H, dh);
    ``t0``: the chunk's base position. One transpose + one
    dynamic_update_slice per layer per chunk — amortized over the W decode
    steps, versus a pathological per-step update of the big buffer (see
    MultiHeadAttention.step). Parameter-free, so callers use it directly
    (no ``Module.apply`` needed).

    If the merged cache is the int8 form ({'k8','v8','sk','sv'} from
    init_cache(quant='int8')), the chunk is quantized here — once per
    chunk, per-position scales over dh — so the big prefix's HBM stream
    is half-width while the per-step hot window stays bf16."""
    out = []
    for layer_cache, layer_hot in zip(cache, hot):
        hk = layer_hot["k"].transpose(1, 2, 3, 0)  # (B, H, dh, W)
        hv = layer_hot["v"].transpose(1, 2, 3, 0)
        if "k8" in layer_cache:
            k8, sk = _quantize_chunk(hk)
            v8, sv = _quantize_chunk(hv)
            out.append(
                {
                    "k8": jax.lax.dynamic_update_slice(
                        layer_cache["k8"], k8, (0, 0, 0, t0)
                    ),
                    "v8": jax.lax.dynamic_update_slice(
                        layer_cache["v8"], v8, (0, 0, 0, t0)
                    ),
                    "sk": jax.lax.dynamic_update_slice(
                        layer_cache["sk"], sk, (0, 0, 0, t0)
                    ),
                    "sv": jax.lax.dynamic_update_slice(
                        layer_cache["sv"], sv, (0, 0, 0, t0)
                    ),
                }
            )
            continue
        out.append(
            {
                "k": jax.lax.dynamic_update_slice(
                    layer_cache["k"], hk, (0, 0, 0, t0)
                ),
                "v": jax.lax.dynamic_update_slice(
                    layer_cache["v"], hv, (0, 0, 0, t0)
                ),
            }
        )
    return tuple(out)


class MultiHeadAttention(nn.Module):
    """Self- or cross-attention; self vs cross is chosen by whether ``context``
    is provided (reference attention.py:113-117)."""

    embed_dim: int
    heads: int = 8
    dim_head: int = 64
    causal: bool = False
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    use_flash: bool = False

    def setup(self):
        inner = self.heads * self.dim_head
        self.q_proj = TorchDense(inner, use_bias=False, dtype=self.dtype, name="q")
        self.k_proj = TorchDense(inner, use_bias=False, dtype=self.dtype, name="k")
        self.v_proj = TorchDense(inner, use_bias=False, dtype=self.dtype, name="v")
        self.out_proj = TorchDense(self.embed_dim * 2, dtype=self.dtype, name="fc_out")

    def project_kv(self, src: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """K/V head projections of ``src`` — exposed so decode can cache the
        cross-attention projections of the encoder output once."""
        return (
            _split_heads(self.k_proj(src), self.heads),
            _split_heads(self.v_proj(src), self.heads),
        )

    def _finish(self, out_heads: jnp.ndarray) -> jnp.ndarray:
        out = self.out_proj(_merge_heads(out_heads))
        value, gate = jnp.split(out, 2, axis=-1)  # torch nn.GLU
        return value * jax.nn.sigmoid(gate)

    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        context_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        return_maps: bool = False,
    ):
        """Full (uncached) attention over (B, N, D) inputs.

        ``mask``: (B, Nq) bool query-side padding mask; ``context_mask``:
        (B, Nk) key-side mask for cross attention. Mask composition follows
        reference attention.py:129-164: the input mask is the q x k outer
        product; for self-attention the key mask is the query mask.
        ``return_maps``: also return the pre/post-softmax attention maps
        (reference attention.py:175-180); forces the XLA path.
        """
        q = _split_heads(self.q_proj(x), self.heads)
        src = x if context is None else context
        k, v = self.project_kv(src)

        allowed = None  # (B, 1, Nq, Nk) bool, True = may attend
        if mask is not None or context_mask is not None:
            q_mask = (
                mask
                if mask is not None
                else jnp.ones(x.shape[:2], dtype=jnp.bool_)
            )
            if context is None:
                k_mask = q_mask
            else:
                k_mask = (
                    context_mask
                    if context_mask is not None
                    else jnp.ones(src.shape[:2], dtype=jnp.bool_)
                )
            allowed = q_mask[:, None, :, None] & k_mask[:, None, None, :]

        if return_maps:
            from texocr_tpu.ops.attention_core import xla_attention

            out, maps = xla_attention(
                q, k, v,
                scale=self.dim_head**-0.5, allowed=allowed, causal=self.causal,
                return_probs=True,
            )
            return self._finish(out), maps

        out = attention_core(
            q,
            k,
            v,
            scale=self.dim_head**-0.5,
            allowed=allowed,
            causal=self.causal,
            use_flash=self.use_flash,
        )
        # Note: the reference defines attention-map dropout but its factories
        # always construct it with dropout=0 (SURVEY.md §2.1), so none is
        # applied here either.
        return self._finish(out)

    def project_kv_transposed(
        self, src: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """K/V in the merged-cache layout (B, H, dh, T).

        The sequence dim sits on the TPU lane (minor-most) axis: T is large
        and ~128-aligned, whereas dh=64 would waste half of every 128-wide
        lane tile — measured ~2x excess HBM traffic on the per-step cache
        reads with the (B, H, T, dh) layout.
        """
        k, v = self.project_kv(src)
        return k.transpose(0, 1, 3, 2), v.transpose(0, 1, 3, 2)

    def project_kv_tmajor(
        self, src: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """K/V of a single-position input in the hot-window layout
        (1, B, H, dh) — sequence-major, so the per-step cache append is a
        contiguous (free) dynamic_update_slice."""
        k, v = self.project_kv(src)  # (B, H, 1, dh)
        return k.transpose(2, 0, 1, 3), v.transpose(2, 0, 1, 3)

    @staticmethod
    def _attend_transposed(q, k_t, v_t, scale, key_ok):
        """softmax(q K^T) V with K/V in (B, H, dh, N) layout; q: (B, H, 1, dh).

        Used by the cross-attention decode path, whose K/V are STATIC
        (precomputed once per sequence) — no per-step writes, so the
        monolithic layout is fine there. Masked fill with -finfo.max
        (matching the reference's masked_fill, attention.py:149-163);
        softmax in float32.
        """
        logits = jnp.einsum(
            "bhqd,bhdt->bhqt", q, k_t, preferred_element_type=jnp.float32
        ) * jnp.float32(scale)
        logits = jnp.where(key_ok, logits, -jnp.finfo(jnp.float32).max)
        probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        return jnp.einsum(
            "bhqt,bhdt->bhqd", probs, v_t, preferred_element_type=jnp.float32
        ).astype(q.dtype)

    @staticmethod
    def _attend_split(q, big_k, big_v, hot_k, hot_v, scale, t0, w,
                      big_sk=None, big_sv=None):
        """softmax(q K^T) V over the split decode cache; q: (B, H, 1, dh).

        Exactly the positions a monolithic cache would expose are unmasked:
        merged positions < t0 (big) plus in-chunk positions <= w (hot,
        absolute t0..t0+w). Masked fill with -finfo.max (matching the
        reference's masked_fill, attention.py:149-163); softmax in float32
        over the concatenated [big | hot] score vector.

        If ``big_sk``/``big_sv`` are given, ``big_k``/``big_v`` are int8
        with per-(B, H, 1, t) scales (merge_hot quantized form): the K
        scales multiply the logits after the dot and the V scales fold into
        the probabilities before the dot — the only approximation is the
        int8 rounding of the prefix itself.
        """
        t_big = big_k.shape[3]
        w_max = hot_k.shape[0]
        neg = -jnp.finfo(jnp.float32).max
        s_big = jnp.einsum(
            "bhqd,bhdt->bhqt", q, big_k.astype(q.dtype),
            preferred_element_type=jnp.float32,
        ) * jnp.float32(scale)
        if big_sk is not None:
            s_big = s_big * big_sk.astype(jnp.float32)
        s_hot = jnp.einsum(
            "bhqd,wbhd->bhqw", q, hot_k, preferred_element_type=jnp.float32
        ) * jnp.float32(scale)
        ok_big = (jnp.arange(t_big) < t0)[None, None, None, :]
        ok_hot = (jnp.arange(w_max) <= w)[None, None, None, :]
        s = jnp.concatenate(
            [jnp.where(ok_big, s_big, neg), jnp.where(ok_hot, s_hot, neg)],
            axis=-1,
        )
        probs = jax.nn.softmax(s, axis=-1)
        p_big = probs[..., :t_big].astype(q.dtype)
        if big_sv is not None:
            p_big = p_big * big_sv
        p_hot = probs[..., t_big:].astype(q.dtype)
        out = jnp.einsum(
            "bhqt,bhdt->bhqd", p_big, big_v.astype(q.dtype),
            preferred_element_type=jnp.float32,
        ) + jnp.einsum(
            "bhqw,wbhd->bhqd", p_hot, hot_v, preferred_element_type=jnp.float32
        )
        return out.astype(q.dtype)

    def step(
        self,
        x_t: jnp.ndarray,
        big_k: jnp.ndarray,
        big_v: jnp.ndarray,
        hot_k: jnp.ndarray,
        hot_v: jnp.ndarray,
        t0: jnp.ndarray,
        w: jnp.ndarray,
        fused_qkv: Optional[jnp.ndarray] = None,
        big_sk: Optional[jnp.ndarray] = None,
        big_sv: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Single cached self-attention decode step over the SPLIT cache.

        The cache is split so every per-step buffer write stays on a TPU
        fast path (measured in RESULTS.md "KV-cache write cost": a per-step
        dynamic_update_slice on a non-major axis of a large buffer costs a
        full masked pass over the buffer — ~320us for an 84MB cache, 48.9%
        of beam decode device time before this split):

        - ``big_k``/``big_v``: (B, H, dh, T) merged prefix — READ-ONLY here
          (positions < t0 valid). It changes only at chunk boundaries
          (``merge_hot``), so XLA hoists any relayout out of the inner
          decode loop and its per-step dots run at the HBM floor.
        - ``hot_k``/``hot_v``: (W, B, H, dh) sequence-MAJOR window holding
          the current chunk's K/V — the per-step append at (w, 0, 0, 0) is
          contiguous and effectively free.

        ``x_t``: (B, 1, D) current-token activations; ``t0``: merged prefix
        length (chunk base); ``w``: position within the chunk (the absolute
        position is t0 + w). Returns (out (B, 1, D), hot_k, hot_v).

        ``fused_qkv``: optional (D, 3*inner) concatenation of the q/k/v
        kernels, precomputed OUTSIDE the decode loop — one matmul instead of
        three per step (the step is op-latency bound at (B, 1, D) sizes).
        """
        if fused_qkv is not None:
            qkv = jnp.dot(x_t.astype(self.dtype), fused_qkv.astype(self.dtype))
            q_r, k_r, v_r = jnp.split(qkv, 3, axis=-1)
            q = _split_heads(q_r, self.heads)
            k_t = _split_heads(k_r, self.heads).transpose(2, 0, 1, 3)
            v_t = _split_heads(v_r, self.heads).transpose(2, 0, 1, 3)
        else:
            q = _split_heads(self.q_proj(x_t), self.heads)  # (B, H, 1, dh)
            k_t, v_t = self.project_kv_tmajor(x_t)  # (1, B, H, dh)
        hot_k = jax.lax.dynamic_update_slice(hot_k, k_t, (w, 0, 0, 0))
        hot_v = jax.lax.dynamic_update_slice(hot_v, v_t, (w, 0, 0, 0))

        out = self._attend_split(
            q, big_k, big_v, hot_k, hot_v, self.dim_head**-0.5, t0, w,
            big_sk=big_sk, big_sv=big_sv,
        )
        return self._finish(out), hot_k, hot_v

    def step_beam(
        self,
        x_t: jnp.ndarray,
        big_k: jnp.ndarray,
        big_v: jnp.ndarray,
        hot_k: jnp.ndarray,
        hot_v: jnp.ndarray,
        t0: jnp.ndarray,
        w: jnp.ndarray,
        beam_sel: jnp.ndarray,
        big_sk: Optional[jnp.ndarray] = None,
        big_sv: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Cached self-attention step for beam search WITHOUT cache reordering,
        over the SPLIT cache (see ``step`` for the split's rationale).
        ``big_sk``/``big_sv``: per-(B*beam, H, 1, t) scales when the big
        prefix is int8 (merge_hot quantized form) — K scales multiply the
        row-j logits, V scales fold into the selected probabilities.

        Cache rows never move; instead ``beam_sel`` (B, beam, beam, T_total)
        float with [b, i, j, t] = 1 iff beam slot i's position-t K/V lives in
        cache row j (the ancestry one-hot, indexed by ABSOLUTE position)
        selects the right rows inside the attention. Scores are computed
        against ALL beam rows of the same image — beam x more MXU work on
        tiny (1, dh) x (dh, T) matmuls, but the K/V HBM reads are unchanged
        and the old per-step full-cache gather disappears entirely.

        ``x_t``: (B*beam, 1, D); ``big_k``/``big_v``: (B*beam, H, dh, T);
        ``hot_k``/``hot_v``: (W, B*beam, H, dh); ``t0``/``w``: chunk base /
        in-chunk position.
        """
        q = _split_heads(self.q_proj(x_t), self.heads)  # (Bb, H, 1, dh)
        k_t, v_t = self.project_kv_tmajor(x_t)  # (1, Bb, H, dh)
        hot_k = jax.lax.dynamic_update_slice(hot_k, k_t, (w, 0, 0, 0))
        hot_v = jax.lax.dynamic_update_slice(hot_v, v_t, (w, 0, 0, 0))

        batch, beam = beam_sel.shape[0], beam_sel.shape[1]
        t_big = big_k.shape[3]
        w_max = hot_k.shape[0]
        qb = q.reshape(batch, beam, self.heads, self.dim_head)
        kb = big_k.reshape(batch, beam, self.heads, self.dim_head, t_big)
        vb = big_v.reshape(batch, beam, self.heads, self.dim_head, t_big)
        hkb = hot_k.reshape(w_max, batch, beam, self.heads, self.dim_head)
        hvb = hot_v.reshape(w_max, batch, beam, self.heads, self.dim_head)
        sel_big = beam_sel[..., :t_big]
        sel_hot = jax.lax.dynamic_slice(
            beam_sel, (0, 0, 0, t0), (batch, beam, beam, w_max)
        )

        scale = jnp.float32(self.dim_head**-0.5)
        # (B, i, j, H, T): slot i's query against every row j's keys.
        lb = jnp.einsum(
            "bihd,bjhdt->bijht", qb, kb.astype(q.dtype),
            preferred_element_type=jnp.float32,
        ) * scale
        if big_sk is not None:
            # (B*beam, H, 1, T) -> (B, 1, j, H, T): row j's per-t K scale.
            lb = lb * big_sk.reshape(batch, beam, self.heads, t_big)[
                :, None, :, :, :
            ].astype(jnp.float32)
        lh = jnp.einsum(
            "bihd,wbjhd->bijhw", qb, hkb, preferred_element_type=jnp.float32
        ) * scale
        # Ancestry selection: exactly one j survives per (b, i, t).
        lb = jnp.sum(lb * sel_big[:, :, :, None, :], axis=2)  # (B, i, H, T)
        lh = jnp.sum(lh * sel_hot[:, :, :, None, :], axis=2)  # (B, i, H, W)
        neg = -jnp.finfo(jnp.float32).max
        ok_big = (jnp.arange(t_big) < t0)[None, None, None, :]
        ok_hot = (jnp.arange(w_max) <= w)[None, None, None, :]
        s = jnp.concatenate(
            [jnp.where(ok_big, lb, neg), jnp.where(ok_hot, lh, neg)], axis=-1
        )
        probs = jax.nn.softmax(s, axis=-1)  # (B, i, H, T+W) f32
        pb = (
            probs[..., :t_big][:, :, None, :, :] * sel_big[:, :, :, None, :]
        ).astype(q.dtype)
        if big_sv is not None:
            pb = pb * big_sv.reshape(batch, beam, self.heads, t_big)[
                :, None, :, :, :
            ]
        ph = (
            probs[..., t_big:][:, :, None, :, :] * sel_hot[:, :, :, None, :]
        ).astype(q.dtype)
        out = jnp.einsum(
            "bijht,bjhdt->bihd", pb, vb.astype(q.dtype),
            preferred_element_type=jnp.float32,
        ) + jnp.einsum(
            "bijhw,wbjhd->bihd", ph, hvb, preferred_element_type=jnp.float32
        )
        out = out.astype(q.dtype).reshape(
            batch * beam, self.heads, 1, self.dim_head
        )
        return self._finish(out), hot_k, hot_v

    def attend_cached_kv_beam(
        self,
        x_t: jnp.ndarray,
        kv: dict,
        beam: int,
        key_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Cross-attention decode step for beam search against UNEXPANDED
        precomputed K/V: every beam of an image shares the same encoder
        output, so ``kv`` stays (B, H, dh, Nk) and is read once per image per
        step instead of once per beam (beam x less HBM traffic on the decode
        loop's dominant stream).

        ``x_t``: (B*beam, 1, D); ``key_mask``: (B, Nk) or None.
        """
        q = _split_heads(self.q_proj(x_t), self.heads)  # (Bb, H, 1, dh)
        if "k8" in kv:
            k_t = kv["k8"].astype(q.dtype)
            v_t = kv["v8"].astype(q.dtype)
        else:
            k_t, v_t = kv["k"], kv["v"]
        batch, n_k = k_t.shape[0], k_t.shape[3]
        qb = q.reshape(batch, beam, self.heads, self.dim_head)
        if "k8" in kv:
            qb = qb * kv["sk"][:, None, :, 0, :]  # fold K scales into q
        logits = jnp.einsum(
            "bihd,bhdn->bihn", qb, k_t, preferred_element_type=jnp.float32
        ) * jnp.float32(self.dim_head**-0.5)
        if key_mask is not None:
            logits = jnp.where(
                key_mask[:, None, None, :], logits, -jnp.finfo(jnp.float32).max
            )
        probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        out = jnp.einsum(
            "bihn,bhdn->bihd", probs, v_t, preferred_element_type=jnp.float32
        ).astype(q.dtype)
        if "k8" in kv:
            out = out * kv["sv"][:, None, :, 0, :]  # fold V scales into out
        out = out.reshape(batch * beam, self.heads, 1, self.dim_head)
        return self._finish(out)

    def attend_cached_kv(
        self,
        x_t: jnp.ndarray,
        kv: dict,
        key_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Cross-attention decode step against precomputed K/V in the
        transposed (B, H, dh, Nk) layout; ``kv`` is either {'k','v'} or the
        int8 form {'k8','v8','sk','sv'} from precompute_cross_kv."""
        q = _split_heads(self.q_proj(x_t), self.heads)
        if "k8" in kv:
            n_k = kv["k8"].shape[3]
        else:
            n_k = kv["k"].shape[3]
        if key_mask is None:
            key_ok = jnp.ones((1, 1, 1, n_k), jnp.bool_)
        else:
            key_ok = key_mask[:, None, None, :]
        scale = self.dim_head**-0.5
        if "k8" in kv:
            # Fold the K scales into q and the V scales into the output —
            # exact up to the int8 rounding of K/V.
            out = self._attend_transposed(
                q * kv["sk"], kv["k8"].astype(q.dtype), kv["v8"].astype(q.dtype),
                scale, key_ok,
            )
            return self._finish(out * kv["sv"])
        return self._finish(
            self._attend_transposed(q, kv["k"], kv["v"], scale, key_ok)
        )


def _sublayer_step(mdl: "AttentionStack", x, enc, mask, enc_mask,
                   layer: int, kind: str, deterministic: bool,
                   post_norm: bool):
    """One (norm -> block -> +residual [-> norm]) sub-layer step, factored
    out so the remat path can wrap it in ``nn.remat`` (backward recomputes
    the sub-layer instead of storing its activations — the jax.checkpoint
    trade of FLOPs for HBM that lets full-canvas/long-seq buckets train at
    batch 32 while the dataset itself is device-resident)."""
    residual = x
    h = mdl._norm(x)
    if kind == "self":
        out = mdl.self_attns[layer](h, mask=mask, deterministic=deterministic)
    elif kind == "cross":
        out = mdl.cross_attns[layer](
            h, context=enc, mask=mask, context_mask=enc_mask,
            deterministic=deterministic,
        )
    else:
        out = mdl.mlps[layer](h, deterministic=deterministic)
    x = out + residual
    if post_norm:
        x = mdl._norm(x)
    return x


# prevent_cse=False is safe ONLY when the forward and backward live in
# different XLA loop bodies — the device-resident lax.scan train step —
# where CSE cannot reach across iterations and the optimization-barrier ops
# would just pessimize fusion. In a plain jitted host-loop step (forward +
# backward in ONE program) CSE would re-merge the recomputed activations
# with the originals and silently void remat's HBM savings, so that path
# keeps the barrier (prevent_cse=True). Selection: AttentionStack
# .remat_prevent_cse, derived from the config's device_data flag
# (config.py ModelConfig.from_dict).
_sublayer_step_remat = nn.remat(
    _sublayer_step, static_argnums=(5, 6, 7, 8), prevent_cse=False
)
_sublayer_step_remat_barrier = nn.remat(
    _sublayer_step, static_argnums=(5, 6, 7, 8), prevent_cse=True
)


class AttentionStack(nn.Module):
    """Stack of (self[, cross], mlp) sub-layers with the reference's shared
    LayerNorm and double-norm residual stream (reference attention.py:183-269)."""

    embed_dim: int
    num_layers: int
    heads: int = 8
    dim_head: int = 64
    causal: bool = False
    cross_attend: bool = False
    glu: bool = True
    exp_factor: int = 4
    ff_dropout: float = 0.0
    dtype: Dtype = jnp.float32
    use_flash: bool = False
    remat: bool = False
    # True (safe default) keeps XLA optimization barriers around rematted
    # sub-layers; the device-resident scan train step sets False (see the
    # comment above _sublayer_step_remat).
    remat_prevent_cse: bool = True

    def setup(self):
        # ONE norm instance, reused everywhere (reference attention.py:200,221).
        self.shared_norm = nn.LayerNorm(
            epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32
        )
        self.self_attns = [
            MultiHeadAttention(
                embed_dim=self.embed_dim,
                heads=self.heads,
                dim_head=self.dim_head,
                causal=self.causal,
                dtype=self.dtype,
                use_flash=self.use_flash,
            )
            for _ in range(self.num_layers)
        ]
        if self.cross_attend:
            self.cross_attns = [
                MultiHeadAttention(
                    embed_dim=self.embed_dim,
                    heads=self.heads,
                    dim_head=self.dim_head,
                    causal=False,
                    dtype=self.dtype,
                    use_flash=self.use_flash,
                )
                for _ in range(self.num_layers)
            ]
        self.mlps = [
            MLP(
                embed_dim=self.embed_dim,
                exp_factor=self.exp_factor,
                glu=self.glu,
                dropout=self.ff_dropout,
                dtype=self.dtype,
            )
            for _ in range(self.num_layers)
        ]

    def _norm(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.shared_norm(x.astype(jnp.float32)).astype(self.dtype)

    def _sublayers(self, layer: int) -> List[Tuple[str, Any]]:
        subs: List[Tuple[str, Any]] = [("self", self.self_attns[layer])]
        if self.cross_attend:
            subs.append(("cross", self.cross_attns[layer]))
        subs.append(("mlp", self.mlps[layer]))
        return subs

    def __call__(
        self,
        x: jnp.ndarray,
        enc: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        enc_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        return_hidden: bool = False,
    ):
        """Full forward. ``return_hidden`` also returns the intermediates the
        reference collects (attention.py:235-267): hidden states entering
        each self-attention sub-layer and the attention maps."""
        if self.cross_attend and enc is None:
            raise ValueError("Must provide enc if cross_attend is True.")
        n_sub = self.num_layers * (3 if self.cross_attend else 2)
        if self.remat and not return_hidden:
            step = (
                _sublayer_step_remat_barrier
                if self.remat_prevent_cse
                else _sublayer_step_remat
            )
            idx = 0
            for layer in range(self.num_layers):
                for kind, _ in self._sublayers(layer):
                    idx += 1
                    x = step(
                        self, x, enc, mask, enc_mask,
                        layer, kind, deterministic, idx != n_sub,
                    )
            return x
        hiddens, attn_maps = [], []
        idx = 0
        for layer in range(self.num_layers):
            for kind, block in self._sublayers(layer):
                if kind == "self" and return_hidden:
                    hiddens.append(x)
                residual = x
                h = self._norm(x)
                if kind == "self":
                    out = block(
                        h, mask=mask, deterministic=deterministic,
                        return_maps=return_hidden,
                    )
                elif kind == "cross":
                    out = block(
                        h,
                        context=enc,
                        mask=mask,
                        context_mask=enc_mask,
                        deterministic=deterministic,
                        return_maps=return_hidden,
                    )
                else:
                    out = block(h, deterministic=deterministic)
                if kind in ("self", "cross") and return_hidden:
                    out, maps = out
                    attn_maps.append(maps)
                x = out + residual
                idx += 1
                if idx != n_sub:  # extra norm on all but the last sub-layer
                    x = self._norm(x)
        if return_hidden:
            return x, {"hiddens": hiddens, "attn_intermediates": attn_maps}
        return x

    # ------------------------------------------------------------------
    # Cached decode path
    # ------------------------------------------------------------------

    def init_cache(self, batch: int, max_len: int,
                   quant: str = "none") -> KVCache:
        """Zeroed static-shape MERGED self-attention KV cache: a per-layer
        tuple of {'k','v'} arrays, each (B, H, dh, T) — transposed so the
        sequence dim sits on the 128-wide lane axis (dh=64 as the minor dim
        wastes half of every lane tile). This buffer is read-only inside the
        per-step decode loop; per-step K/V land in the small sequence-major
        hot window (``init_hot``) and are merged in one contiguous write per
        chunk (``merge_hot``) — a per-step dynamic_update_slice here costs a
        full masked pass over the buffer on TPU (measured ~48.9% of beam
        decode device time).

        ``quant='int8'``: per-layer {'k8','v8','sk','sv'} — int8 values plus
        per-(B, H, 1, t) scales, filled by merge_hot's quantizing path. The
        zero scales of unwritten positions dequantize to 0, matching the
        bf16 init (those positions are masked in the attention anyway)."""
        shape = (batch, self.heads, self.dim_head, max_len)
        if quant == "int8":
            sshape = (batch, self.heads, 1, max_len)
            return tuple(
                {
                    "k8": jnp.zeros(shape, dtype=jnp.int8),
                    "v8": jnp.zeros(shape, dtype=jnp.int8),
                    "sk": jnp.zeros(sshape, dtype=self.dtype),
                    "sv": jnp.zeros(sshape, dtype=self.dtype),
                }
                for _ in range(self.num_layers)
            )
        if quant != "none":
            raise ValueError(f"unknown self kv quant mode: {quant!r}")
        return tuple(
            {
                "k": jnp.zeros(shape, dtype=self.dtype),
                "v": jnp.zeros(shape, dtype=self.dtype),
            }
            for _ in range(self.num_layers)
        )

    def init_hot(self, batch: int, window: int) -> KVCache:
        """Zeroed per-layer hot K/V window, each (W, B, H, dh): sequence-MAJOR
        so the per-step append (dynamic_update_slice at (w, 0, 0, 0)) is a
        contiguous write — the TPU fast path. Reset at every chunk boundary
        after ``merge_hot`` folds it into the merged cache."""
        shape = (window, batch, self.heads, self.dim_head)
        return tuple(
            {
                "k": jnp.zeros(shape, dtype=self.dtype),
                "v": jnp.zeros(shape, dtype=self.dtype),
            }
            for _ in range(self.num_layers)
        )

    def precompute_cross_kv(self, enc: jnp.ndarray, quant: str = "none"):
        """Per-layer cross-attention K/V of the encoder output, computed once
        per sequence.

        quant='none': tuple of {'k','v'} in (B, H, dh, Nk) bf16/f32.
        quant='int8': tuple of {'k8','v8','sk','sv'} — int8 values with
        per-(B, H, dh) scales. The scales fold exactly into q (for K) and the
        attention output (for V), so the only approximation is the int8
        rounding of K/V themselves (~0.4% relative). Halves the decode loop's
        dominant HBM traffic; measured >4x faster per-step cross-attention.
        """
        out = []
        for layer in range(self.num_layers):
            k, v = self.cross_attns[layer].project_kv_transposed(enc)
            if quant == "none":
                out.append({"k": k, "v": v})
                continue
            if quant != "int8":
                raise ValueError(f"unknown kv quant mode: {quant!r}")

            def q8(x):  # x: (B, H, dh, N)
                amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=3)
                scale = jnp.maximum(amax, 1e-8) / 127.0  # (B, H, dh)
                q = jnp.clip(
                    jnp.round(x.astype(jnp.float32) / scale[..., None]),
                    -127,
                    127,
                ).astype(jnp.int8)
                # Scale shaped (B, H, 1, dh) to multiply q / attention output.
                return q, scale[:, :, None, :].astype(x.dtype)

            k8, sk = q8(k)
            v8, sv = q8(v)
            out.append({"k8": k8, "v8": v8, "sk": sk, "sv": sv})
        return tuple(out)

    def step(
        self,
        x_t: jnp.ndarray,
        cache: KVCache,
        hot: KVCache,
        t0: jnp.ndarray,
        w: jnp.ndarray,
        cross_kv=None,
        enc_mask: Optional[jnp.ndarray] = None,
        fused_qkv=None,
    ) -> Tuple[jnp.ndarray, KVCache]:
        """One decode step over the whole stack for (B, 1, D) input.

        ``cache`` is the read-only merged prefix (positions < t0);
        ``hot`` is the per-chunk sequence-major window this step appends to
        at in-chunk position ``w``. Only the updated ``hot`` is returned —
        the caller merges it into ``cache`` at chunk boundaries
        (``merge_hot``).

        ``fused_qkv``: optional per-layer tuple of concatenated self-attn
        q/k/v kernels (built once outside the loop; see generate.py)."""
        n_sub = self.num_layers * (3 if self.cross_attend else 2)
        new_hot = []
        idx = 0
        x = x_t
        for layer in range(self.num_layers):
            for kind, block in self._sublayers(layer):
                residual = x
                h = self._norm(x)
                if kind == "self":
                    lc = cache[layer]
                    quant = "k8" in lc
                    out, hk, hv = block.step(
                        h, lc["k8"] if quant else lc["k"],
                        lc["v8"] if quant else lc["v"],
                        hot[layer]["k"], hot[layer]["v"], t0, w,
                        fused_qkv=None if fused_qkv is None else fused_qkv[layer],
                        big_sk=lc["sk"] if quant else None,
                        big_sv=lc["sv"] if quant else None,
                    )
                    new_hot.append({"k": hk, "v": hv})
                elif kind == "cross":
                    out = block.attend_cached_kv(
                        h, cross_kv[layer], key_mask=enc_mask
                    )
                else:
                    out = block(h, deterministic=True)
                x = out + residual
                idx += 1
                if idx != n_sub:
                    x = self._norm(x)
        return x, tuple(new_hot)

    def step_beam(
        self,
        x_t: jnp.ndarray,
        cache: KVCache,
        hot: KVCache,
        t0: jnp.ndarray,
        w: jnp.ndarray,
        beam_sel: jnp.ndarray,
        cross_kv=None,
        enc_mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, KVCache]:
        """One beam-search decode step over the whole stack.

        Like ``step`` but caches are never reordered: ``beam_sel``
        (B, beam, beam, T_total) is the ancestry one-hot consumed by the
        self-attention (absolute positions), and ``cross_kv``/``enc_mask``
        stay at batch level (B, ...) — shared by all beams of an image (see
        MultiHeadAttention.step_beam / attend_cached_kv_beam).
        ``x_t``: (B*beam, 1, D) current-token activations."""
        beam = beam_sel.shape[1]
        n_sub = self.num_layers * (3 if self.cross_attend else 2)
        new_hot = []
        idx = 0
        x = x_t
        for layer in range(self.num_layers):
            for kind, block in self._sublayers(layer):
                residual = x
                h = self._norm(x)
                if kind == "self":
                    lc = cache[layer]
                    quant = "k8" in lc
                    out, hk, hv = block.step_beam(
                        h, lc["k8"] if quant else lc["k"],
                        lc["v8"] if quant else lc["v"],
                        hot[layer]["k"], hot[layer]["v"], t0, w, beam_sel,
                        big_sk=lc["sk"] if quant else None,
                        big_sv=lc["sv"] if quant else None,
                    )
                    new_hot.append({"k": hk, "v": hv})
                elif kind == "cross":
                    out = block.attend_cached_kv_beam(
                        h, cross_kv[layer], beam, key_mask=enc_mask
                    )
                else:
                    out = block(h, deterministic=True)
                x = out + residual
                idx += 1
                if idx != n_sub:
                    x = self._norm(x)
        return x, tuple(new_hot)
