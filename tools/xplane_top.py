#!/usr/bin/env python
"""Summarize a jax.profiler trace: top HLO ops / categories by device time.

The committed answer to "what is the device actually doing" — parses the
xplane protobuf a `texocr_tpu.telemetry.profile_trace` block wrote (e.g.
`tools/bench_beam.py --profile DIR`) through xprof's hlo_stats converter
and prints total device time, a per-category breakdown, and the top-N ops
by self time. One JSON line on stdout; tables on stderr.

Usage:
  python tools/xplane_top.py /tmp/beam_prof/b32 [--top 20]
"""
from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import sys


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def load_hlo_stats(logdir: str):
    paths = sorted(
        glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise SystemExit(f"no *.xplane.pb under {logdir}")
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([paths[-1]], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    table = json.loads(data)
    cols = [c["id"] for c in table["cols"]]
    rows = [
        {cols[i]: cell["v"] for i, cell in enumerate(r["c"])}
        for r in table["rows"]
    ]
    return paths[-1], rows


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("logdir")
    p.add_argument("--top", type=int, default=20)
    args = p.parse_args()

    path, rows = load_hlo_stats(args.logdir)
    log(f"trace: {path}  ({len(rows)} hlo rows)")

    total = sum(r.get("total_self_time", 0.0) for r in rows)
    by_cat = collections.Counter()
    for r in rows:
        by_cat[r.get("category", "?")] += r.get("total_self_time", 0.0)

    log(f"total device self time: {total/1e3:.2f} ms")
    log("| category | self ms | % |")
    log("|---|---|---|")
    cats = []
    for cat, t in by_cat.most_common():
        log(f"| {cat} | {t/1e3:.2f} | {100*t/max(total,1e-9):.1f}% |")
        cats.append({"category": cat, "self_ms": round(t / 1e3, 3),
                     "pct": round(100 * t / max(total, 1e-9), 2)})

    log(f"\ntop {args.top} ops by self time:")
    log("| op | category | #occ | self ms | % |")
    log("|---|---|---|---|---|")
    top = sorted(rows, key=lambda r: -r.get("total_self_time", 0.0))
    ops = []
    for r in top[: args.top]:
        t = r.get("total_self_time", 0.0)
        name = r.get("hlo_op_name", "?")
        fw = r.get("tf_op_name", "")
        log(f"| {name} ({fw}) | {r.get('category','?')} | "
            f"{r.get('occurrences', 0)} | {t/1e3:.2f} | "
            f"{100*t/max(total,1e-9):.1f}% |")
        ops.append({"op": name, "framework_op": fw,
                    "category": r.get("category", "?"),
                    "occurrences": r.get("occurrences", 0),
                    "self_ms": round(t / 1e3, 3),
                    "pct": round(100 * t / max(total, 1e-9), 2)})

    print(json.dumps({"trace": path, "total_device_ms": round(total / 1e3, 3),
                      "categories": cats[:10], "top_ops": ops}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
