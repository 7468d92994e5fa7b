"""Render LaTeX equations to PNGs with latex/dvipng/ImageMagick.

Reference-equivalent offline factory (reference data_wrangling/render_data.py):
each equation becomes a standalone ``$\\displaystyle eq$`` document, compiled
with ``latex``, rasterized by ``dvipng`` at a RANDOM dpi in [100, 150] (the
config dpi is effectively unused — same as the reference, render_data.py:62),
then center-padded by ImageMagick ``convert`` so the canvas is a multiple of
(patch_size) in height and (4*patch_size) in width — the shape-bucket rule the
TPU input pipeline relies on (render_data.py:81-92). Failures are logged to
failed.txt and pruned out of labels/ids (render_data.py:140-171).

The external binaries are probed up front and the CLI exits with a clear
message when absent (this image does not ship LaTeX).

CLI: ``python -m texocr_tpu.data.factory.render_data data/train -c config/data_config.yml``
"""

from __future__ import annotations

import argparse
import random
import shutil
import subprocess
import sys
from multiprocessing import Manager, Pool, cpu_count
from pathlib import Path
from typing import Optional

from texocr_tpu.config import load_config

REQUIRED_BINARIES = ("latex", "dvipng", "convert")

TEX_TEMPLATE = """
    \\documentclass[preview,border=1mm]{{standalone}}
    \\usepackage{{amsmath}}
    \\usepackage{{amsfonts}}
    \\usepackage{{amssymb}}
    \\usepackage[total={{16in, 8in}}]{{geometry}}
    \\begin{{document}}
    $\\displaystyle {equation}$
    \\end{{document}}
    """


def check_binaries() -> Optional[str]:
    missing = [b for b in REQUIRED_BINARIES if shutil.which(b) is None]
    if missing:
        return (
            f"missing external renderers: {', '.join(missing)} — install "
            "texlive (latex, dvipng) and ImageMagick (convert) to run the "
            "data factory."
        )
    return None


def _png_size(path: Path):
    """Read (w, h) from the PNG IHDR header (no imagesize dependency)."""
    import struct

    with open(path, "rb") as f:
        head = f.read(24)
    if len(head) < 24 or head[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError(f"not a PNG: {path}")
    w, h = struct.unpack(">II", head[16:24])
    return w, h


def render_one(task) -> None:
    equation, data_dir, image_id, patch_size, failed = task
    equation = equation.strip()
    if not equation:
        return

    image_dir = Path(data_dir) / "images"
    image_dir.mkdir(parents=True, exist_ok=True)
    base = image_id[:-4]  # strip .png
    paths = {ext: image_dir / f"{base}.{ext}" for ext in ("tex", "dvi", "png", "log", "aux")}

    paths["tex"].write_text(TEX_TEMPLATE.format(equation=equation), encoding="utf-8")
    try:
        subprocess.run(
            ["latex", "-interaction=nonstopmode", "-output-directory",
             str(image_dir), str(paths["tex"])],
            check=True, capture_output=True,
        )
        dpi = random.randint(100, 150)
        subprocess.run(
            ["dvipng", "-D", str(dpi), "-T", "tight", "-o", str(paths["png"]),
             str(paths["dvi"])],
            check=True, capture_output=True,
        )
    except subprocess.CalledProcessError as e:
        failed.append((base, equation))
    finally:
        for ext in ("tex", "dvi", "log", "aux"):
            paths[ext].unlink(missing_ok=True)

    if paths["png"].exists():
        w, h = _png_size(paths["png"])
        new_h = h + (patch_size - h % patch_size) % patch_size
        w_interval = 4 * patch_size
        new_w = w + (w_interval - w % w_interval) % w_interval
        subprocess.run(
            ["convert", str(paths["png"]), "-gravity", "center",
             "-extent", f"{new_w}x{new_h}", str(paths["png"])],
            check=True, capture_output=True,
        )


def render_images(data_dir: str, num_processes: Optional[int] = None,
                  patch_size: int = 16) -> None:
    root = Path(data_dir)
    equations = [l for l in (root / "labels.txt").read_text().splitlines() if l.strip()]
    ids = [l for l in (root / "ids.txt").read_text().splitlines() if l.strip()]

    with Manager() as manager:
        failed = manager.list()
        tasks = [
            (eq, data_dir, ids[i], patch_size, failed)
            for i, eq in enumerate(equations)
        ]
        with Pool(processes=num_processes or cpu_count()) as pool:
            for i, _ in enumerate(pool.imap(render_one, tasks)):
                if (i + 1) % 500 == 0:
                    print(f"rendered {i + 1}/{len(tasks)}")
        print(f"Rendered {len(tasks)} equations, {len(failed)} failures.")
        if failed:
            with open(root / "failed.txt", "w", encoding="utf-8") as f:
                for base, eq in failed:
                    f.write(f"{base}: {eq}\n")


def prune_equations(data_dir: str) -> None:
    """Drop failed renders from labels/ids -> labels_pruned.txt/ids_pruned.txt
    (the loader prefers pruned files; texocr_tpu/data/dataset.py)."""
    root = Path(data_dir)
    failed_file = root / "failed.txt"
    if not failed_file.exists():
        return
    failed_ids = {
        line.split(":")[0] + ".png" for line in failed_file.read_text().splitlines()
    }
    ids = root.joinpath("ids.txt").read_text().splitlines()
    labels = root.joinpath("labels.txt").read_text().splitlines()
    kept = [(i, l) for i, l in zip(ids, labels) if i not in failed_ids]
    (root / "ids_pruned.txt").write_text("\n".join(i for i, _ in kept))
    (root / "labels_pruned.txt").write_text("\n".join(l for _, l in kept))


def main() -> None:
    p = argparse.ArgumentParser(description="Render LaTeX equations to images.")
    p.add_argument("data_dir", type=str)
    p.add_argument("-c", "--config", type=str, default="config/data_config.yml")
    args = p.parse_args()

    err = check_binaries()
    if err:
        print(err, file=sys.stderr)
        sys.exit(2)

    config = load_config(args.config)
    render_images(
        args.data_dir,
        num_processes=config.get("num_processes"),
        patch_size=config.get("patch_size", 16),
    )
    prune_equations(args.data_dir)


if __name__ == "__main__":
    main()
