"""Jitted autoregressive decoding with a static-shape KV cache.

This replaces the reference's generation loop — a full transformer re-forward
over the whole prefix every step with no KV cache, O(T^2) work (reference
decoder.py:97-116) — with a ``lax.while_loop`` that:

- encodes once, precomputes per-layer cross-attention K/V of the encoder
  output once,
- appends one self-attention K/V per step into a small sequence-major
  per-layer hot window ((W, B, H, dh) — a contiguous, effectively free
  write) and folds the window into the read-only merged (B, H, dh, T)
  caches once per chunk (models/attention.py merge_hot; a per-step update
  of the big caches costs a full masked pass over them on TPU — formerly
  ~half of decode device time),
- keeps per-row done flags and stops as soon as every row has emitted EOS
  (the reference's stopping rule, decoder.py:115: "every row contains EOS"),
- writes PAD into rows that are already done (the reference keeps sampling
  garbage into finished rows — decoder.py:111 — which its own eval then
  counts against accuracy; emitting PAD is strictly more sensible and is
  masked out by the batch_acc union mask either way).

Sampling modes:
- ``greedy_decode``: argmax (the BASELINE "greedy" configs).
- ``sampled_decode``: the reference's top-k(99 of 1000)/temperature(0.3)
  categorical sampling (reference utils.py:85-91, ocr_model.py:47), with a
  JAX PRNG — distributionally equivalent, not draw-for-draw identical to
  torch.multinomial.

All functions are pure and jittable; ``max_len`` and shapes are static.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from texocr_tpu.models.attention import merge_hot
from texocr_tpu.models.ocr_model import OCRModel
from texocr_tpu.utils import topk_filter



#: Steps per inner scan chunk — also the hot K/V window size. The inner
#: lax.scan runs CHUNK decode steps with no done-checks (lets XLA pipeline
#: the loop body) against a frozen merged cache; the outer lax.while_loop
#: merges the hot window and checks the per-row done flags between chunks,
#: so a batch that finishes early stops within CHUNK steps of the last EOS.
DECODE_CHUNK = 32


def _decode_loop(
    model: OCRModel,
    variables,
    enc: jnp.ndarray,
    *,
    bos_token: int,
    eos_token: int,
    pad_token: int,
    max_len: int,
    sample_fn,
    init_carry_extra,
    enc_mask: Optional[jnp.ndarray] = None,
    return_logits: bool = False,
):
    batch = enc.shape[0]
    # The decode feeds absolute positions 0..max_len-1 into the positional
    # table; clamp the budget to what the table covers (the reference instead
    # slides a window over the prefix, decoder.py:99-100).
    max_len = min(max_len, model.config.decoder.max_length)
    chunk = min(DECODE_CHUNK, max_len)
    # Buffers are rounded up to a whole number of chunks so the inner scan
    # never needs a bounds guard; the result is sliced back to max_len.
    padded_len = -(-max_len // chunk) * chunk
    # Merged K/V prefix — READ-ONLY inside the inner scan; per-step K/V go
    # to the sequence-major hot window and are folded in once per chunk
    # (models/attention.py merge_hot — a per-step update of this buffer
    # costs a full masked pass over it on TPU, formerly ~half of decode
    # device time; see RESULTS.md "KV-cache write cost").
    cache = model.apply(
        variables, batch, padded_len, method=OCRModel.decoder_init_cache
    )
    cross_kv = model.apply(variables, enc, method=OCRModel.decoder_cross_kv)

    tokens = jnp.full((batch, padded_len), pad_token, dtype=jnp.int32)
    done = jnp.zeros((batch,), dtype=jnp.bool_)
    cur = jnp.full((batch,), bos_token, dtype=jnp.int32)
    vocab = model.config.decoder.vocab_size
    logits_buf = (
        jnp.zeros((batch, padded_len, vocab), dtype=jnp.float32)
        if return_logits
        else jnp.zeros((0,), dtype=jnp.float32)
    )

    def cond(state):
        step0, _, _, _, done, _, _ = state
        return (step0 < max_len) & ~jnp.all(done)

    def chunk_body(state):
        step0, cur, cache, tokens, done, extra, logits_buf = state
        hot = model.apply(
            variables, batch, chunk, method=OCRModel.decoder_init_hot
        )

        def step_body(carry, w):
            cur, hot, tokens, done, extra, logits_buf = carry
            step = step0 + w
            logits, hot = model.apply(
                variables,
                cur,
                step,
                w,
                cache,
                hot,
                cross_kv,
                enc_mask,
                method=OCRModel.decoder_step,
            )
            logits = logits.astype(jnp.float32)
            if return_logits:
                logits_buf = jax.lax.dynamic_update_slice(
                    logits_buf, logits[:, None, :], (0, step, 0)
                )
            nxt, extra = sample_fn(logits, extra)
            # A finished row stops evolving: emit PAD and freeze the done
            # flag. Past-EOS cache garbage is harmless — those rows' outputs
            # are fixed.
            nxt = jnp.where(done, pad_token, nxt).astype(jnp.int32)
            tokens = jax.lax.dynamic_update_slice(
                tokens, nxt[:, None], (0, step)
            )
            done = done | (nxt == eos_token)
            return (nxt, hot, tokens, done, extra, logits_buf), None

        (cur, hot, tokens, done, extra, logits_buf), _ = jax.lax.scan(
            step_body,
            (cur, hot, tokens, done, extra, logits_buf),
            jnp.arange(chunk),
        )
        cache = merge_hot(cache, hot, step0)
        return (step0 + chunk, cur, cache, tokens, done, extra, logits_buf)

    state = (0, cur, cache, tokens, done, init_carry_extra, logits_buf)
    state = jax.lax.while_loop(cond, chunk_body, state)
    tokens, logits_buf = state[3][:, :max_len], state[6]
    if return_logits:
        return tokens, logits_buf[:, :max_len]
    return tokens


def greedy_decode(
    model: OCRModel,
    variables,
    enc: jnp.ndarray,
    *,
    bos_token: int,
    eos_token: int,
    pad_token: int,
    max_len: int,
    enc_mask: Optional[jnp.ndarray] = None,
    return_logits: bool = False,
):
    """Argmax decode. Returns (B, max_len) int32 (PAD-filled after EOS)."""

    def sample(logits, extra):
        return jnp.argmax(logits, axis=-1), extra

    return _decode_loop(
        model,
        variables,
        enc,
        bos_token=bos_token,
        eos_token=eos_token,
        pad_token=pad_token,
        max_len=max_len,
        sample_fn=sample,
        init_carry_extra=0,
        enc_mask=enc_mask,
        return_logits=return_logits,
    )


def sampled_decode(
    model: OCRModel,
    variables,
    enc: jnp.ndarray,
    rng: jax.Array,
    *,
    bos_token: int,
    eos_token: int,
    pad_token: int,
    max_len: int,
    temp: float = 0.3,
    topk_threshold: float = 0.9,
    enc_mask: Optional[jnp.ndarray] = None,
):
    """Reference-mode sampling: top-k filter then categorical at ``temp``
    (reference decoder.py:103-108 with utils.py:85-91 semantics)."""

    def sample(logits, key):
        key, sub = jax.random.split(key)
        filtered = topk_filter(logits, topk_threshold)
        nxt = jax.random.categorical(sub, filtered / temp, axis=-1)
        return nxt, key

    return _decode_loop(
        model,
        variables,
        enc,
        bos_token=bos_token,
        eos_token=eos_token,
        pad_token=pad_token,
        max_len=max_len,
        sample_fn=sample,
        init_carry_extra=rng,
        enc_mask=enc_mask,
    )


def generate(
    model: OCRModel,
    variables,
    images: jnp.ndarray,
    *,
    max_len: int,
    mode: str = "greedy",
    rng: Optional[jax.Array] = None,
    temp: float = 0.3,
) -> jnp.ndarray:
    """Encode + decode in one call (reference OCRModel.generate,
    ocr_model.py:46-66). ``images``: (B, H, W, 1) preprocessed."""
    enc = model.apply(variables, images, method=OCRModel.encode)
    cfg = model.config
    common = dict(
        bos_token=cfg.bos_token,
        eos_token=cfg.eos_token,
        pad_token=cfg.pad_token,
        max_len=max_len,
    )
    if mode == "greedy":
        return greedy_decode(model, variables, enc, **common)
    if mode == "sample":
        if rng is None:
            raise ValueError("mode='sample' requires an rng key")
        return sampled_decode(model, variables, enc, rng, temp=temp, **common)
    raise ValueError(f"unknown decode mode: {mode!r}")


def make_jitted_generate(model: OCRModel, max_len: int, mode: str = "greedy"):
    """Build a jitted (variables, images[, rng]) -> tokens function with
    static max_len/mode — one compile per image bucket shape."""
    if mode == "greedy":

        @jax.jit
        def fn(variables, images):
            return generate(model, variables, images, max_len=max_len, mode="greedy")

        return fn

    @partial(jax.jit, static_argnames=("temp",))
    def fn(variables, images, rng, temp=0.3):
        return generate(
            model, variables, images, max_len=max_len, mode="sample", rng=rng,
            temp=temp,
        )

    return fn
