"""Beam-search decoding with the KV cache (BASELINE.json config #4).

The reference has no beam search (its generate is top-k sampling only,
reference decoder.py:97-116); this implements standard length-normalized
beam search the TPU way: static shapes, a chunked decode loop, and — the
parts that matter for speed — **no per-step cache reordering** and **no
per-step writes to the big caches**. Cache rows are append-only; an
ancestry matrix (B, beam, T) records which row holds each slot's K/V at
every position, and the self-attention selects rows through its one-hot
inside the kernel (models/attention.py:step_beam). The earlier
implementation re-gathered the entire (B*beam, H, dh, T) cache with
``jnp.take`` every step — a full cache read+write per step that dominated
the beam profile (measured 6.5 -> 16.6 img/s at the BASELINE #4 config
from removing it). A round-4 device-time profile then showed the
remaining per-step cache *writes* (dynamic_update_slice on the big
buffers) were 48.9% of device time; per-step K/V now land in a small
sequence-major hot window, merged once per chunk (see
MultiHeadAttention.step / RESULTS.md "KV-cache write cost").
Cross-attention K/V likewise stays at batch level (all beams of an image
share the encoder output), so its HBM stream shrinks by the beam factor.

Scoring: sum of token log-probs; finished beams (emitted EOS) are frozen and
forced to continue with PAD at zero additional cost. Returns the best beam's
token suffix per row, PAD-filled after EOS, shape (B, max_len).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from texocr_tpu.models.attention import merge_hot
from texocr_tpu.models.generate import DECODE_CHUNK, _slice_cache, _tier_sizes
from texocr_tpu.models.ocr_model import OCRModel

NEG_INF = jnp.float32(-1e30)


def beam_decode(
    model: OCRModel,
    variables,
    enc: jnp.ndarray,
    *,
    bos_token: int,
    eos_token: int,
    pad_token: int,
    max_len: int,
    beam_size: int = 5,
    length_penalty: float = 0.0,
    enc_mask: Optional[jnp.ndarray] = None,
    return_scores: bool = False,
) -> jnp.ndarray:
    """(B, N_enc, D) encoder output -> (B, max_len) best-beam tokens
    (optionally with the best beam's raw log-prob sum).

    ``length_penalty`` alpha: beams are ranked by
    score / ((5 + len) / 6)**alpha (GNMT); 0 = raw log-prob sum.
    """
    batch = enc.shape[0]
    # Positional-table clamp (see models/generate.py).
    max_len = min(max_len, model.config.decoder.max_length)
    bb = batch * beam_size
    chunk = min(DECODE_CHUNK, max_len)
    # Buffers rounded up to whole chunks (see models/generate.py).
    padded_len = -(-max_len // chunk) * chunk

    # Cross K/V and enc mask stay UNEXPANDED (B, ...): every beam of an image
    # attends the same encoder output, so expanding them would multiply the
    # decode loop's dominant HBM stream by beam_size for no information.
    cross_kv = model.apply(variables, enc, method=OCRModel.decoder_cross_kv)
    cache = model.apply(
        variables, bb, padded_len, method=OCRModel.decoder_init_cache
    )

    tokens = jnp.full((batch, beam_size, padded_len), pad_token, jnp.int32)
    # Beam 0 starts live, the rest start at -inf so the first step fans out
    # from a single BOS per row.
    scores = jnp.tile(
        jnp.concatenate([jnp.zeros((1,)), jnp.full((beam_size - 1,), NEG_INF)])[
            None
        ],
        (batch, 1),
    ).astype(jnp.float32)
    done = jnp.zeros((batch, beam_size), jnp.bool_)
    cur = jnp.full((batch, beam_size), bos_token, jnp.int32)
    lengths = jnp.zeros((batch, beam_size), jnp.int32)
    # Ancestry: anc[b, i, t] = cache row (within image b's beam group) holding
    # slot i's position-t K/V. Rows never move; this index does.
    anc = jnp.zeros((batch, beam_size, padded_len), jnp.int32)
    row_ids = jnp.broadcast_to(
        jnp.arange(beam_size, dtype=jnp.int32)[None, :, None],
        (batch, beam_size, 1),
    )

    vocab = model.config.decoder.vocab_size

    def cond(state):
        step0, _, _, _, _, done, _, _ = state
        return (step0 < max_len) & ~jnp.all(done)

    tier_q, tier_sizes = _tier_sizes(padded_len, chunk)

    def chunk_body(state):
        step0, cur, cache, anc, tokens, done, scores, lengths = state
        hot = model.apply(
            variables, bb, chunk, method=OCRModel.decoder_init_hot
        )

        def make_body(big):
            def body(carry, w):
                cur, hot, anc, tokens, done, scores, lengths = carry
                step = step0 + w
                # The token being fed now writes its K/V into its own row.
                anc = jax.lax.dynamic_update_slice(anc, row_ids, (0, 0, step))
                beam_sel = (
                    anc[:, :, None, :]
                    == jnp.arange(beam_size, dtype=jnp.int32)[
                        None, None, :, None
                    ]
                ).astype(jnp.float32)
                logits, hot = model.apply(
                    variables,
                    cur.reshape(-1),
                    step,
                    w,
                    big,
                    hot,
                    beam_sel,
                    cross_kv,
                    enc_mask,
                    method=OCRModel.decoder_step_beam,
                )
                logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
                logp = logp.reshape(batch, beam_size, vocab)

                # Finished beams may only emit PAD, at zero cost; live beams
                # may emit anything.
                pad_only = jnp.full((vocab,), NEG_INF).at[pad_token].set(0.0)
                logp = jnp.where(
                    done[..., None], pad_only[None, None, :], logp
                )

                cand = scores[..., None] + logp  # (B, beam, V)
                flat = cand.reshape(batch, beam_size * vocab)
                top_scores, top_idx = jax.lax.top_k(flat, beam_size)
                parent = top_idx // vocab  # (B, beam)
                tok = (top_idx % vocab).astype(jnp.int32)

                # Reorder per-slot state by parent — a few (B, beam[, T])
                # int/bool gathers; the multi-MB KV caches stay put.
                gather = lambda x: jnp.take_along_axis(x, parent, axis=1)
                anc = jnp.take_along_axis(anc, parent[..., None], axis=1)
                tokens = jnp.take_along_axis(
                    tokens, parent[..., None], axis=1
                )
                tokens = jax.lax.dynamic_update_slice(
                    tokens, tok[..., None], (0, 0, step)
                )
                new_done = gather(done) | (tok == eos_token)
                lengths = jnp.where(gather(done), gather(lengths), step + 1)

                return (
                    tok, hot, anc, tokens, new_done, top_scores, lengths,
                ), None

            return body

        def run_chunk(size, carry):
            # Prefix dots need positions < t0 <= size only; beam_sel adapts
            # via its own [..., :t_big] slice inside step_beam (the hot
            # window's sel is dynamic-sliced from the full-width beam_sel
            # either way). See generate.py PREFIX_TIERS.
            big = _slice_cache(cache, size) if size != padded_len else cache
            return jax.lax.scan(make_body(big), carry, jnp.arange(chunk))[0]

        carry = (cur, hot, anc, tokens, done, scores, lengths)
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
        cur, hot, anc, tokens, done, scores, lengths = carry
        cache = merge_hot(cache, hot, step0)
        return (step0 + chunk, cur, cache, anc, tokens, done, scores, lengths)

    state = (0, cur, cache, anc, tokens, done, scores, lengths)
    _, _, _, _, tokens, done, scores, lengths = jax.lax.while_loop(
        cond, chunk_body, state
    )
    tokens = tokens[:, :, :max_len]

    # Rank: GNMT length-normalized score. Every beam is normalized —
    # finished beams by their EOS position, unfinished beams by their
    # current (full-budget) length, so long unfinished beams are not
    # unfairly favored over finished ones.
    if length_penalty > 0.0:
        norm = ((5.0 + lengths.astype(jnp.float32)) / 6.0) ** length_penalty
        ranked = scores / jnp.maximum(norm, 1e-6)
    else:
        ranked = scores
    best = jnp.argmax(ranked, axis=1)  # (B,)
    best_tokens = jnp.take_along_axis(tokens, best[:, None, None], axis=1)[:, 0]
    if return_scores:
        best_scores = jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]
        return best_tokens, best_scores
    return best_tokens
