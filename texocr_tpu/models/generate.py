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

import os
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
#: Larger chunks amortize the per-chunk merge/relayout cost (~11.6% of
#: decode device time at 32 — RESULTS.md round-5 profile) over more steps
#: but widen the hot-window dot every step and coarsen early stopping;
#: TEXOCR_DECODE_CHUNK overrides for measurement.
DECODE_CHUNK = int(os.environ.get("TEXOCR_DECODE_CHUNK", "32"))

#: Number of static prefix-read tiers (see _tier_sizes). The merged-prefix
#: dots otherwise read the FULL (B, H, dh, padded_len) buffers every step —
#: at a 256-step decode the average valid prefix is half that, so ~40% of
#: the self-KV HBM stream (the top post-int8 profile category, ~25% of
#: decode device time — RESULTS.md round-5 profile) is masked positions.
#: Each tier compiles its own copy of the chunk scan reading a
#: statically-sliced prefix; lax.switch picks the smallest tier covering
#: the current chunk base. Bit-exact: the dropped positions are exactly
#: the ok_big-masked ones. Compile-time trade-off: every decode function
#: carries one scan body per tier, so warmup latency scales with the tier
#: count — TEXOCR_PREFIX_TIERS=1 restores the single full-width read
#: (same results, one compile) where cold-start matters more than the
#: long-decode HBM savings.
PREFIX_TIERS = int(os.environ.get("TEXOCR_PREFIX_TIERS", "4"))


def _tier_sizes(padded_len: int, chunk: int, ntiers: Optional[int] = None):
    """Static prefix widths [q, 2q, ..., padded_len] (chunk multiples) and
    the tier quantum q. Tier i covers chunk bases t0 <= (i+1)*q.

    ``ntiers`` defaults to the module's PREFIX_TIERS, read at call time so
    it can be overridden (tests, experiments) without re-importing."""
    if ntiers is None:
        ntiers = PREFIX_TIERS
    ntiers = max(1, min(ntiers, padded_len // chunk))
    q = -(-padded_len // (ntiers * chunk)) * chunk
    sizes = sorted({min(padded_len, q * (i + 1)) for i in range(ntiers)})
    return q, sizes


def _slice_cache(cache, size: int):
    """Statically slice every per-layer cache array ((B, H, dh, T) K/V and
    (B, H, 1, T) int8 scales share axis 3 = positions) to the first ``size``
    positions."""
    return tuple(
        {name: arr[:, :, :, :size] for name, arr in layer.items()}
        for layer in cache
    )


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

    tier_q, tier_sizes = _tier_sizes(padded_len, chunk)

    def chunk_body(state):
        step0, cur, cache, tokens, done, extra, logits_buf = state
        hot = model.apply(
            variables, batch, chunk, method=OCRModel.decoder_init_hot
        )

        def make_step_body(big):
            def step_body(carry, w):
                cur, hot, tokens, done, extra, logits_buf = carry
                step = step0 + w
                logits, hot = model.apply(
                    variables,
                    cur,
                    step,
                    w,
                    big,
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
                # flag. Past-EOS cache garbage is harmless — those rows'
                # outputs are fixed.
                nxt = jnp.where(done, pad_token, nxt).astype(jnp.int32)
                tokens = jax.lax.dynamic_update_slice(
                    tokens, nxt[:, None], (0, step)
                )
                done = done | (nxt == eos_token)
                return (nxt, hot, tokens, done, extra, logits_buf), None

            return step_body

        def run_chunk(size, carry):
            # The prefix dots only need positions < t0 <= size; the slice is
            # hoisted out of the scan (one copy per chunk, amortized over
            # CHUNK steps of reads at the smaller width).
            big = _slice_cache(cache, size) if size != padded_len else cache
            return jax.lax.scan(
                make_step_body(big), carry, jnp.arange(chunk)
            )[0]

        carry = (cur, hot, tokens, done, extra, logits_buf)
        if len(tier_sizes) == 1:
            carry = run_chunk(tier_sizes[0], carry)
        else:
            tier = jnp.clip(
                (step0 + tier_q - 1) // tier_q - 1, 0, len(tier_sizes) - 1
            )
            carry = jax.lax.switch(
                tier,
                [lambda c, s=s: run_chunk(s, c) for s in tier_sizes],
                carry,
            )
        cur, hot, tokens, done, extra, logits_buf = carry
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
