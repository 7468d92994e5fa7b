"""Evaluation harness: batched greedy decode over a test split, token
accuracy (reference batch_acc semantics) + exact match (reference test.py's
intent, with its defects fixed — the reference module crashes on import,
test.py:13, and its signature mismatch breaks validation, train.py:95)."""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from texocr_tpu.data.dataset import ImageDataset, create_dataloader
from texocr_tpu.evaluation.metrics import (
    batch_acc,
    edit_similarity,
    exact_match_rate,
)
from texocr_tpu.models import OCRModel
from texocr_tpu.models.generate import greedy_decode


def clamp_to_pos_table(params, config: dict, max_len: int):
    """Sync ``config['max_length']`` to the positional table actually present
    in ``params`` and clamp the decode budget to it.

    A model claiming more positions than the restored table has would read
    NaN-filled embeddings past the table (jnp.take's out-of-bounds fill) and
    decode silently-wrong tokens. ``params`` is the inner params dict (no
    'params' wrapper). Returns the clamped ``max_len``; mutates ``config``.
    """
    pos_rows = int(params["decoder"]["pos_embedding"]["embedding"].shape[0])
    if max_len + 1 > pos_rows:
        print(f"WARNING: decode budget {max_len} exceeds the checkpoint's "
              f"positional table ({pos_rows} rows); clamping to "
              f"{pos_rows - 1}.")
        max_len = pos_rows - 1
    config["max_length"] = pos_rows
    return max_len


def test_model(
    test_set: ImageDataset,
    model: OCRModel,
    params,
    config: dict,
    max_len: int = 276,
    verbose: bool = True,
    max_batches: Optional[int] = None,
    decode_mode: str = "greedy",
    beam_size: int = 5,
    skip_batches: int = 0,
    metrics_out: Optional[str] = None,
    pairs_out: Optional[str] = None,
) -> Dict[str, float]:
    """Decode the test split, report mean batch token-accuracy and
    exact-match. ``max_len`` defaults to the reference harness's decode budget
    (reference test.py:35). ``decode_mode``: 'greedy' (argmax, the BASELINE
    configs' default) or 'beam' (length-unnormalized beam search of width
    ``beam_size``; BASELINE config #4).

    ``pairs_out`` appends one JSON line per ROW with the pad-stripped
    predicted and gold token-id lists — the input for per-token error
    analysis (tools/confusion_report.py).

    ``skip_batches``/``metrics_out`` make long evals resumable across process
    restarts: the loader order is deterministic for a fixed config seed, each
    completed batch appends one JSON line to ``metrics_out``, and a rerun with
    ``skip_batches=<lines already written>`` continues where the previous
    process died (the single-chip tunnel can kill a long process with a
    spurious backend error; see tools/eval_full_split.py)."""
    cfg = model.config
    if decode_mode not in ("greedy", "beam"):
        raise ValueError(f"unknown decode_mode: {decode_mode!r}")

    decode_cache = {}

    def decode(images):
        key = tuple(images.shape)
        if key not in decode_cache:

            @jax.jit
            def fn(params, images):
                enc = model.apply(params, images, method=OCRModel.encode)
                common = dict(
                    bos_token=cfg.bos_token, eos_token=cfg.eos_token,
                    pad_token=cfg.pad_token, max_len=max_len,
                )
                if decode_mode == "beam":
                    from texocr_tpu.models.beam import beam_decode

                    return beam_decode(
                        model, params, enc, beam_size=beam_size, **common
                    )
                return greedy_decode(model, params, enc, **common)

            decode_cache[key] = fn
        return decode_cache[key](params, images)

    accs, ems, sims, n = [], [], [], 0
    # Skip at the SAMPLER level: resumed evals pay only the id-list iteration
    # for already-completed batches, not image decode + collate (at batch 200
    # of a full-split eval that's ~6,400 avoided PNG decodes per restart).
    # Metrics are invariant to within-batch row order, so the collator's
    # shuffle-seed schedule shifting by the skipped calls is immaterial.
    loader = create_dataloader(test_set, config)
    for batch_ids in loader.sampler:
        if n < skip_batches:
            n += 1
            continue
        images, labels = loader.collate([test_set[i] for i in batch_ids])
        # One device sync per batch; metrics run on the host (metrics.py).
        pred = np.asarray(decode(jnp.asarray(images)))
        # Targets exclude the leading BOS (generate returns the suffix only,
        # like the reference: decoder.py:118).
        target = np.asarray(labels)[:, 1:]
        accs.append(batch_acc(pred, target, cfg.pad_token))
        ems.append(exact_match_rate(pred, target, cfg.pad_token))
        sims.append(edit_similarity(pred, target, cfg.pad_token))
        n += 1
        if metrics_out:
            import json

            with open(metrics_out, "a") as f:
                f.write(json.dumps({
                    "batch": n, "rows": int(pred.shape[0]),
                    "token_acc": float(accs[-1]),
                    "exact_match": float(ems[-1]),
                    "edit_similarity": float(sims[-1]),
                }) + "\n")
        if pairs_out:
            import json

            with open(pairs_out, "a") as f:
                for r in range(pred.shape[0]):
                    f.write(json.dumps({
                        "pred": [int(t) for t in pred[r]
                                 if t != cfg.pad_token],
                        "gold": [int(t) for t in target[r]
                                 if t != cfg.pad_token],
                    }) + "\n")
        if verbose:
            print(f"batch {n}: token_acc {accs[-1]:.3f}  exact {ems[-1]:.3f}"
                  f"  edit_sim {sims[-1]:.3f}")
            ids = [int(t) for t in pred[0] if t not in (cfg.pad_token,)]
            print("  pred:", test_set.tokenizer.decode(ids))
            gold = [int(t) for t in target[0] if t != cfg.pad_token]
            print("  gold:", test_set.tokenizer.decode(gold))
        if max_batches and n >= max_batches:
            break

    out = {
        "token_acc": float(np.mean(accs)) if accs else 0.0,
        "exact_match": float(np.mean(ems)) if ems else 0.0,
        "edit_similarity": float(np.mean(sims)) if sims else 0.0,
        "batches": n,
    }
    if verbose:
        print(f"Test accuracy: {out['token_acc']:.4f}  "
              f"exact match: {out['exact_match']:.4f}  "
              f"edit similarity: {out['edit_similarity']:.4f}")
    return out


def single_prediction(test_set, model, params, config, index: int = 0):
    """Teacher-forced argmax prediction for one sample (the reference's
    single_prediction helper, test.py:72-89) — returns (pred_ids, gold_ids)."""
    import jax.numpy as jnp

    image, token_ids = test_set[index]
    pad, bos, eos = (
        model.config.pad_token, model.config.bos_token, model.config.eos_token
    )
    labels = np.asarray([[bos] + token_ids + [eos]], dtype=np.int32)
    logits, shifted = model.apply(
        params, jnp.asarray(image[None]), jnp.asarray(labels)
    )
    pred = np.asarray(jnp.argmax(logits, -1))[0]
    return pred.tolist(), np.asarray(shifted)[0].tolist()
