#!/usr/bin/env python
"""Pickle a training-ready subset of an in-progress typeset dataset build.

The mathtext render pool (tools/make_demo_dataset.py --typeset) is the wall
clock long pole of the 100k typeset build (~3h on a 1-vCPU host), while the
TPU sits idle. This tool turns the images rendered SO FAR into a complete
dataset directory — labels/ids regenerated deterministically from the build
seed, images symlinked, pickles built — so a typeset warm-up stage can train
while the remaining renders finish (the published chain's stage-T role:
adapt the PIL-grounded model to typeset glyph shapes before the full-scale
stage W run; see RESULTS.md "Typeset accuracy").

The subset is carved from the FRONT of the parent build's train split, and
its monitoring val/test splits are later rows of that same train split —
disjoint from the warm-up's train rows but NOT from the parent dataset's
train split, which is fine: they gate nothing, and the parent's real
test/val splits (disjoint equations) remain untouched for reported numbers.

Usage:
  python tools/pickle_partial_typeset.py --src /tmp/data_typeset100k \
      --out /tmp/data_typesetT --n 100000 --seed 23 [--holdout 640]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from make_demo_dataset import realistic_equation  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--src", required=True,
                   help="in-progress build dir (make_demo_dataset --out)")
    p.add_argument("--out", required=True)
    p.add_argument("--n", type=int, default=100000,
                   help="the parent build's --n (drives label regeneration)")
    p.add_argument("--seed", type=int, default=23,
                   help="the parent build's --seed")
    p.add_argument("--take", type=int, default=None,
                   help="rows to use (default: all contiguously rendered)")
    p.add_argument("--holdout", type=int, default=640,
                   help="tail rows of the take reserved as val+test halves")
    args = p.parse_args()

    # Regenerate the label stream exactly as the parent build did: one
    # default_rng(seed) consumed by realistic_equation in order
    # (make_demo_dataset.py main()). The --realistic profile leaves
    # random_term unpatched, so the regeneration here matches only
    # --realistic (not --simple/--entropic) parent builds.
    rng = np.random.default_rng(args.seed)
    eqs = [realistic_equation(rng) for _ in range(args.n)]
    train_eqs = eqs[: int(args.n * 0.8)]

    src_images = os.path.join(args.src, "train", "images")
    # Contiguous prefix only: the render pool writes in order (imap), but
    # guard against a torn tail by stopping at the first missing id.
    avail = 0
    while avail < len(train_eqs) and os.path.exists(
        os.path.join(src_images, f"eq_{avail:05d}.png")
    ):
        avail += 1
    take = min(args.take or avail, avail)
    if take < 2 * args.holdout:
        raise SystemExit(f"only {take} rendered rows; need >= {2*args.holdout}")

    n_train = take - 2 * (args.holdout // 2)
    half = args.holdout // 2
    splits = {
        "train": (0, n_train),
        "val": (n_train, n_train + half),
        "test": (n_train + half, take),
    }
    for split, (lo, hi) in splits.items():
        root = os.path.join(args.out, split)
        os.makedirs(root, exist_ok=True)
        link = os.path.join(root, "images")
        if not os.path.exists(link):
            os.symlink(src_images, link)
        ids = [f"eq_{i:05d}.png" for i in range(lo, hi)]
        with open(os.path.join(root, "labels.txt"), "w") as f:
            f.write("\n".join(train_eqs[lo:hi]) + "\n")
        with open(os.path.join(root, "ids.txt"), "w") as f:
            f.write("\n".join(ids) + "\n")

    from texocr_tpu.data.dataset import ImageDataset
    from texocr_tpu.tokenizer import DEFAULT_VOCAB_PATH

    for split, (lo, hi) in splits.items():
        root = os.path.join(args.out, split)
        ds = ImageDataset(root, DEFAULT_VOCAB_PATH, dataset_size=hi - lo)
        ds.save(os.path.join(root, f"{split}set.pkl"))
        print(f"{split}: pickled {len(ds)} rows, {len(ds.sizes)} buckets, "
              f"max_seq_len {ds.max_seq_len}")
    print(f"partial typeset dataset at {args.out}: {take} of "
          f"{len(train_eqs)} train rows rendered so far")
    return 0


if __name__ == "__main__":
    sys.exit(main())
