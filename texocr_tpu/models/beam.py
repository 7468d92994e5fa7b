"""Beam-search decoding with the KV cache (BASELINE.json config #4).

The reference has no beam search (its generate is top-k sampling only,
reference decoder.py:97-116); this implements standard length-normalized
beam search the TPU way: static shapes, one ``lax.while_loop``, caches kept
flat over (batch * beam) rows and re-gathered by parent beam each step.

Scoring: sum of token log-probs; finished beams (emitted EOS) are frozen and
forced to continue with PAD at zero additional cost. Returns the best beam's
token suffix per row, PAD-filled after EOS, shape (B, max_len).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from texocr_tpu.models.ocr_model import OCRModel

NEG_INF = jnp.float32(-1e30)


def _flatten_beams(x):
    return x.reshape((-1,) + x.shape[2:])


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

    ``length_penalty`` alpha: finished beams are ranked by
    score / ((5 + len) / 6)**alpha (GNMT); 0 = raw log-prob sum.
    """
    batch = enc.shape[0]
    # Positional-table clamp (see models/generate.py).
    max_len = min(max_len, model.config.decoder.max_length)
    bb = batch * beam_size

    # Expand encoder state to (B*beam, ...): each beam attends the same image.
    enc_exp = jnp.repeat(enc, beam_size, axis=0)
    cross_kv = model.apply(variables, enc_exp, method=OCRModel.decoder_cross_kv)
    enc_mask_exp = (
        jnp.repeat(enc_mask, beam_size, axis=0) if enc_mask is not None else None
    )
    cache = model.apply(
        variables, bb, max_len + 1, method=OCRModel.decoder_init_cache
    )

    tokens = jnp.full((batch, beam_size, max_len), pad_token, jnp.int32)
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

    vocab = model.config.decoder.vocab_size

    def cond(state):
        step, _, _, _, done, _, _, _ = state
        return (step < max_len) & ~jnp.all(done)

    def body(state):
        step, cur, cache, tokens, done, scores, lengths, _ = state
        logits, cache = model.apply(
            variables,
            _flatten_beams(cur),
            step,
            cache,
            cross_kv,
            enc_mask_exp,
            method=OCRModel.decoder_step,
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        logp = logp.reshape(batch, beam_size, vocab)

        # Finished beams may only emit PAD, at zero cost; live beams may emit
        # anything.
        pad_only = jnp.full((vocab,), NEG_INF).at[pad_token].set(0.0)
        logp = jnp.where(done[..., None], pad_only[None, None, :], logp)

        cand = scores[..., None] + logp  # (B, beam, V)
        flat = cand.reshape(batch, beam_size * vocab)
        top_scores, top_idx = jax.lax.top_k(flat, beam_size)
        parent = top_idx // vocab  # (B, beam)
        tok = (top_idx % vocab).astype(jnp.int32)

        # Reorder per-beam state by parent.
        gather = lambda x: jnp.take_along_axis(x, parent, axis=1)
        tokens = jnp.take_along_axis(
            tokens, parent[..., None], axis=1
        )
        tokens = jax.lax.dynamic_update_slice(
            tokens, tok[..., None], (0, 0, step)
        )
        new_done = gather(done) | (tok == eos_token)
        lengths = jnp.where(gather(done), gather(lengths), step + 1)

        # Reorder the KV caches: flat row index = b * beam + parent.
        row = (
            jnp.arange(batch)[:, None] * beam_size + parent
        ).reshape(-1)
        cache = jax.tree.map(lambda c: jnp.take(c, row, axis=0), cache)

        return (
            step + 1,
            tok,
            cache,
            tokens,
            new_done,
            top_scores,
            lengths,
            parent,
        )

    state = (
        0,
        cur,
        cache,
        tokens,
        done,
        scores,
        lengths,
        jnp.zeros((batch, beam_size), jnp.int32),
    )
    _, _, _, tokens, done, scores, lengths, _ = jax.lax.while_loop(cond, body, state)

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
