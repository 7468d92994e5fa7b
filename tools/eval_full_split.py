#!/usr/bin/env python
"""Resumable full-split evaluation driver.

The single-chip tunnel occasionally kills a long-lived process with a
spurious `INVALID_ARGUMENT: TPU backend error` (observed at compile time, at
output fetch, and inside unrelated device ops — same workload succeeds on
rerun). This driver makes full-split evals immune: it runs
``texocr_tpu.evaluation.cli`` with ``--metrics_out`` (one JSON line per
completed batch), and on a crash restarts it with ``--skip_batches`` set to
the number of batches already recorded. The loader order is deterministic
for a fixed config seed, and the persistent compile cache makes restarts
cheap. Retries are bounded and must make forward progress.

Usage:
  python tools/eval_full_split.py -d /tmp/data_real48k \
      --config /tmp/eval_beam_cfg.yml --checkpoint /tmp/stageF_ckpts/checkpoint_e39 \
      --decode beam --max_len 475 --metrics_out /tmp/beamF_metrics.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys


def n_done(path: str) -> int:
    if not os.path.exists(path):
        return 0
    with open(path) as f:
        return sum(1 for line in f if line.strip())


def aggregate(path: str) -> dict:
    rows, acc, em, sim = 0, 0.0, 0.0, 0.0
    batches = 0
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            rec = json.loads(line)
            r = rec["rows"]
            rows += r
            acc += rec["token_acc"] * r
            em += rec["exact_match"] * r
            sim += rec["edit_similarity"] * r
            batches += 1
    if rows == 0:
        return {"batches": 0, "rows": 0}
    return {
        "batches": batches, "rows": rows,
        "token_acc": acc / rows, "exact_match": em / rows,
        "edit_similarity": sim / rows,
    }


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("-d", "--data_dir", required=True)
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--decode", default="greedy", choices=("greedy", "beam"))
    p.add_argument("--beam_size", type=int, default=5)
    p.add_argument("--max_len", type=int, default=276)
    p.add_argument("--max_batches", type=int, default=None)
    p.add_argument("--metrics_out", required=True,
                   help="per-batch JSONL; also the resume state")
    p.add_argument("--pairs_out", default=None,
                   help="per-row pred/gold token-id JSONL for "
                        "tools/confusion_report.py (appended across resumes; "
                        "rows from a batch the dying process half-wrote are "
                        "possible but harmless for aggregate confusions)")
    p.add_argument("--kv_quant", default=None, choices=("none", "int8"),
                   help="override the config's cross-KV quantization "
                        "(passed through to evaluation.cli)")
    p.add_argument("--self_kv_quant", default=None,
                   choices=("none", "int8"),
                   help="override the config's self-KV prefix quantization")
    p.add_argument("--max_retries", type=int, default=8,
                   help="max restarts WITHOUT forward progress")
    args = p.parse_args()

    stalls = 0
    while True:
        done = n_done(args.metrics_out)
        cmd = [
            sys.executable, "-m", "texocr_tpu.evaluation.cli",
            "-d", args.data_dir, "--config", args.config,
            "--checkpoint", args.checkpoint,
            "--decode", args.decode, "--beam_size", str(args.beam_size),
            "--max_len", str(args.max_len),
            "--skip_batches", str(done),
            "--metrics_out", args.metrics_out,
        ]
        if args.max_batches is not None:
            cmd += ["--max_batches", str(args.max_batches)]
        if args.pairs_out:
            cmd += ["--pairs_out", args.pairs_out]
        if args.kv_quant:
            cmd += ["--kv_quant", args.kv_quant]
        if args.self_kv_quant:
            cmd += ["--self_kv_quant", args.self_kv_quant]
        print(f"[eval_full_split] starting at batch {done + 1} "
              f"(attempt with {stalls} stalls so far)", flush=True)
        rc = subprocess.call(cmd)
        if rc == 0:
            break
        made_progress = n_done(args.metrics_out) > done
        stalls = 0 if made_progress else stalls + 1
        if stalls > args.max_retries:
            print(f"[eval_full_split] no progress after {stalls} retries; "
                  f"giving up", file=sys.stderr, flush=True)
            return 1
        print(f"[eval_full_split] eval process died (rc={rc}); resuming",
              flush=True)

    final = aggregate(args.metrics_out)
    print("[eval_full_split] FINAL " + json.dumps(final), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
