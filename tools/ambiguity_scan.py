#!/usr/bin/env python
"""Measure the exact-match ceiling the typeset renderer itself imposes.

Two distinct label strings that typeset to identical pixels are
irreducible label noise: the best possible decoder maps that image to one
of them and is "wrong" on the rest. This scans a split's labels, renders
each at FIXED conditions (dpi 125, the deterministic wrap), hashes the
rendered bytes, and groups distinct labels by render hash. The implied
sequence exact-match ceiling is

    sum over hash-groups of (count of the group's most frequent label) / N

evaluated over label instances (a group whose labels are all identical
strings contributes fully).

``--raw`` bypasses render_data.compact_latex to reproduce the PRE-fix
renderer semantics (mathtext silently dropping ^/_ on digit bases —
RESULTS.md "Typeset accuracy"), so the fixed-vs-broken ceilings can be
compared on the same split.

Per-line hashing: equations are wrapped into lines exactly like
render_realistic_typeset (tools/make_demo_dataset.py); the hash covers the
concatenated per-line PNGs, which is equality-preserving for the pasted
canvas (fixed gap/margins given the same dpi).

Usage:
  python tools/ambiguity_scan.py --labels /tmp/curr/data_typeset48k_v2/test/labels.txt
  python tools/ambiguity_scan.py --labels ... --raw   # pre-fix semantics
"""
from __future__ import annotations

import argparse
import collections
import hashlib
import io
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _render_hash(eq: str, dpi: int, compact: bool) -> str:
    from matplotlib import mathtext

    from texocr_tpu.data.factory.render_data import compact_latex

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from make_demo_dataset import _wrap_top_level

    h = hashlib.sha1()
    for line in _wrap_top_level(eq, char_budget=int(88 * 125 / dpi)):
        buf = io.BytesIO()
        mathtext.math_to_image(
            f"${compact_latex(line) if compact else line}$", buf, dpi=dpi,
            format="png",
        )
        h.update(buf.getvalue())
    return h.hexdigest()


def _flip_one_digit_script(tokens: list[str]) -> list[str] | None:
    """Flip the FIRST digit-base ^/_ occurrence (the construct the pre-fix
    renderer collapsed); None if the label has none."""
    for i in range(1, len(tokens)):
        if tokens[i] in ("^", "_") and tokens[i - 1].isdigit():
            out = list(tokens)
            out[i] = "_" if tokens[i] == "^" else "^"
            return out
    return None


def run_fliptest(labels, dpi: int, compact: bool, limit: int | None):
    """Injectivity test: a dataset-collision scan can't see ambiguity
    against labels OUTSIDE the dataset, so perturb each label at the known
    ambiguity site (digit-base ^/_) and check the render changes. Under the
    pre-fix renderer every flip renders identically (the script operator is
    silently dropped); under the fixed renderer none should."""
    tested = collisions = skipped = 0
    for eq in labels:
        flipped = _flip_one_digit_script(eq.split(" "))
        if flipped is None:
            continue
        if limit and tested >= limit:
            break
        try:
            ha = _render_hash(eq, dpi, compact)
            hb = _render_hash(" ".join(flipped), dpi, compact)
        except Exception:
            skipped += 1
            continue
        tested += 1
        collisions += ha == hb
        if tested % 250 == 0:
            print(f"  fliptest {tested} tested, {collisions} collisions",
                  flush=True)
    print(json.dumps({
        "fliptest_labels": tested,
        "flip_renders_identical": collisions,
        "flip_collision_rate": round(collisions / max(tested, 1), 4),
        "failed": skipped,
        "mode": "raw (pre-fix)" if not compact else "compacted (fixed)",
        "dpi": dpi,
    }))
    return 0


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--labels", required=True,
                   help="labels.txt of the split to scan (one label/line)")
    p.add_argument("--dpi", type=int, default=125)
    p.add_argument("--raw", action="store_true",
                   help="bypass compact_latex (pre-fix renderer semantics)")
    p.add_argument("--fliptest", action="store_true",
                   help="instead of the dataset-collision scan, flip one "
                        "digit-base ^/_ per label and count identical "
                        "renders (injectivity against out-of-dataset "
                        "neighbors)")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--examples", type=int, default=8,
                   help="print up to N colliding label pairs")
    args = p.parse_args()

    with open(args.labels) as f:
        labels = [ln.rstrip("\n") for ln in f if ln.strip()]
    if args.fliptest:
        return run_fliptest(labels, args.dpi, compact=not args.raw,
                            limit=args.limit)
    if args.limit:
        labels = labels[: args.limit]

    groups: dict[str, collections.Counter] = collections.defaultdict(
        collections.Counter)
    failed = 0
    for i, eq in enumerate(labels):
        try:
            groups[_render_hash(eq, args.dpi, compact=not args.raw)][eq] += 1
        except Exception:
            failed += 1
        if (i + 1) % 500 == 0:
            print(f"  {i + 1}/{len(labels)} rendered", flush=True)

    n = sum(sum(c.values()) for c in groups.values())
    reachable = sum(max(c.values()) for c in groups.values())
    ambiguous_groups = {h: c for h, c in groups.items() if len(c) > 1}
    amb_instances = sum(
        sum(c.values()) - max(c.values()) for c in ambiguous_groups.values())

    shown = 0
    for c in ambiguous_groups.values():
        if shown >= args.examples:
            break
        a, b = list(c)[:2]
        print(f"COLLISION:\n  {a}\n  {b}")
        shown += 1

    print(json.dumps({
        "labels": len(labels),
        "rendered": n,
        "failed": failed,
        "distinct_renders": len(groups),
        "ambiguous_groups": len(ambiguous_groups),
        "unreachable_instances": amb_instances,
        "exact_match_ceiling": round(reachable / max(n, 1), 4),
        "mode": "raw (pre-fix)" if args.raw else "compacted (fixed)",
        "dpi": args.dpi,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
