"""Render LaTeX equations to PNGs (latex/dvipng/ImageMagick or mathtext).

Reference-equivalent offline factory (reference data_wrangling/render_data.py):
each equation becomes a standalone ``$\\displaystyle eq$`` document, compiled
with ``latex``, rasterized by ``dvipng`` at a RANDOM dpi in [100, 150] (the
config dpi is effectively unused — same as the reference, render_data.py:62),
then center-padded by ImageMagick ``convert`` so the canvas is a multiple of
(patch_size) in height and (4*patch_size) in width — the shape-bucket rule the
TPU input pipeline relies on (render_data.py:81-92). Failures are logged to
failed.txt and pruned out of labels/ids (render_data.py:140-171).

Two interchangeable render backends:

- ``latex`` — the reference's subprocess chain (latex -> dvipng -> convert).
  Binaries are probed up front with a clear message when absent.
- ``mathtext`` — matplotlib's built-in TeX-subset typesetter: real math
  typesetting (fraction bars, radicals, kerning, Computer-Modern-style
  glyphs) with NO external binaries, so the factory executes end to end in
  environments without a TeX install. Same random-dpi draw, tight crop,
  center-pad-to-bucket rule, and failed.txt/prune failure path; equations
  using TeX commands outside the mathtext subset simply land in failed.txt,
  exactly like a latex compile error would.

``--renderer auto`` (default) uses latex when the binaries exist, else
mathtext.

CLI: ``python -m texocr_tpu.data.factory.render_data data/train -c config/data_config.yml``
"""

from __future__ import annotations

import argparse
import functools
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


def _pad_extents(w: int, h: int, patch_size: int):
    """The reference's convert -extent rule: height to the next multiple of
    patch_size, width to the next multiple of 4*patch_size
    (render_data.py:81-92)."""
    new_h = h + (patch_size - h % patch_size) % patch_size
    w_interval = 4 * patch_size
    new_w = w + (w_interval - w % w_interval) % w_interval
    return new_w, new_h


import re

# TeX ignores whitespace between math tokens, so the reference chain renders
# the space-separated label `2 ^ { b }` exactly like `2^{b}` (the .tex body
# is the verbatim label — reference render_data.py:38-47). matplotlib's
# mathtext parser does NOT: with a DIGIT base it parses `2 ^ { b }` as the
# number 2 followed by a bare group and silently drops the script operator,
# rendering sup and sub pixel-identically ("2 b" on the baseline). That
# destroys the ^-vs-_ visual cue for every scripted digit (21% of scripts,
# 84% of equations in the realistic grammar) — measured as the dominant
# error mode of curriculum stage U (RESULTS.md "Typeset accuracy").
# Compacting the token stream before handing it to mathtext restores the
# semantics real latex/dvipng would give the same label. A space is kept
# after alphabetic \commands so the command name can't absorb a following
# letter (`\sin x`, not `\sinx`).
_CMD_SPACE = re.compile(r"(\\[A-Za-z]+)\s+(?=[A-Za-z])")


def compact_latex(equation: str) -> str:
    """Collapse inter-token whitespace the way TeX itself would ignore it,
    keeping the one space that is load-bearing: between an alphabetic
    ``\\command`` and a following letter."""
    eq = _CMD_SPACE.sub("\\1\x00", equation)
    eq = re.sub(r"\s+", "", eq)
    return eq.replace("\x00", " ")


_MATHTEXT_CACHES_INSTALLED = False


def _install_shared_mathtext_caches() -> None:
    """Share matplotlib's glyph-metric caches process-wide (speed only).

    matplotlib builds a FRESH ``Fonts`` object for every ``math_to_image``
    call (mathtext.py ``_parse_cached``: ``fontset = fontset_class(...)``),
    so its metric caches — installed per *instance*
    (``self._get_info = functools.cache(...)`` in ``TruetypeFonts.__init__``,
    and the ``functools.cache`` on ``StixFonts.get_sized_alternatives_for_
    symbol`` whose key includes ``self``) — start cold on every render.
    Building a 100k-equation dataset therefore recomputes every glyph
    metric ~100k times; profiled at >40% of render time (RESULTS.md).

    Every cached value is a pure function of (fontset class, resolved
    default-font file, load_glyph_flags, call args): the backing FT2Font
    objects are already shared process-wide via ``font_manager.get_font``,
    so cross-instance reuse has the same semantics matplotlib's own
    intra-instance reuse assumes. Keys include the class qualname, the
    resolved default-font filename, and the load flags, so distinct
    fontsets / font configs never collide. Outputs are byte-identical
    (tests/test_factory.py regression). Best-effort: any structural
    mismatch with the installed matplotlib leaves the stock path in place.
    """
    global _MATHTEXT_CACHES_INSTALLED
    if _MATHTEXT_CACHES_INSTALLED:
        return
    _MATHTEXT_CACHES_INSTALLED = True
    try:
        import matplotlib as mpl
        from matplotlib import _mathtext as _mt

        metrics_cache: dict = {}
        xheight_cache: dict = {}
        sized_cache: dict = {}

        tt = _mt.TruetypeFonts
        raw_get_xheight = tt.get_xheight
        raw_get_metrics = tt.get_metrics

        # NOT cacheable across renders: the full FontInfo. Its ``glyph``
        # member is a live slot in the (globally shared) FT2Font that
        # ``font.clear()`` invalidates between draws — a stale one raises
        # "glyph num is out of range" at raster time. The per-instance
        # functools.cache matplotlib installs over _get_info stays as-is
        # for the draw path; only glyph-free float results are shared.

        def _fontset_key(self):
            default = self._fonts.get("default")
            fname = getattr(default, "fname", None)
            return (type(self).__qualname__, fname, self.load_glyph_flags)

        @functools.wraps(raw_get_metrics)
        def shared_get_metrics(self, font, font_class, sym, fontsize, dpi):
            key = (_fontset_key(self), font, font_class, sym, fontsize, dpi)
            hit = metrics_cache.get(key)
            if hit is None:
                hit = metrics_cache[key] = raw_get_metrics(
                    self, font, font_class, sym, fontsize, dpi)
            return hit

        @functools.wraps(raw_get_xheight)
        def shared_get_xheight(self, fontname, fontsize, dpi):
            key = (_fontset_key(self), fontname, fontsize, dpi,
                   mpl.rcParams["mathtext.default"])
            hit = xheight_cache.get(key)
            if hit is None:
                hit = xheight_cache[key] = raw_get_xheight(
                    self, fontname, fontsize, dpi)
            return hit

        # StixFonts decorates the method with functools.cache, keying on
        # ``self`` — useless across the per-render instances. Re-key on the
        # class. The body only reads class-fixed font files (safe to share).
        raw_sized = _mt.StixFonts.get_sized_alternatives_for_symbol.__wrapped__

        @functools.wraps(raw_sized)
        def shared_sized(self, fontname, sym):
            key = (type(self).__qualname__, fontname, sym)
            hit = sized_cache.get(key)
            if hit is None:
                hit = sized_cache[key] = raw_sized(self, fontname, sym)
            return hit

        tt.get_metrics = shared_get_metrics
        tt.get_xheight = shared_get_xheight
        _mt.StixFonts.get_sized_alternatives_for_symbol = shared_sized
    except Exception:  # pragma: no cover - stock path on any mismatch
        pass


def mathtext_png(equation: str, dpi: int):
    """Typeset ONE equation with matplotlib mathtext -> tight grayscale PIL
    image (the dvipng -T tight equivalent; no padding). Raises on TeX
    commands outside the mathtext subset — callers map that onto their
    failure path."""
    import io

    import matplotlib
    matplotlib.use("Agg", force=True)
    import numpy as np
    from matplotlib import mathtext
    from PIL import Image

    _install_shared_mathtext_caches()

    buf = io.BytesIO()
    # math_to_image sizes the figure to the typeset math. mathtext needs the
    # $...$ wrapper; \displaystyle sizing is the default for its
    # sums/integrals at this entry point. compact_latex first: see above —
    # spaced token streams mis-parse scripted digits.
    mathtext.math_to_image(f"${compact_latex(equation)}$", buf, dpi=dpi,
                           format="png")
    buf.seek(0)
    img = Image.open(buf).convert("L")
    arr = np.asarray(img)
    # Tight-crop any residual margin so the pad rule sees ink extents
    # (math_to_image keeps a small face border).
    ink = np.argwhere(arr < 250)
    if ink.size:
        (y0, x0), (y1, x1) = ink.min(0), ink.max(0) + 1
        img = img.crop((int(x0), int(y0), int(x1), int(y1)))
    return img


def render_one_mathtext(task) -> None:
    """Binary-free backend: matplotlib mathtext -> tight grayscale PNG at a
    random dpi in [100, 150] -> center-pad onto the bucket canvas (PIL stands
    in for ImageMagick convert). Parse errors (commands outside the mathtext
    TeX subset) take the same failed.txt path as a latex compile error."""
    equation, data_dir, image_id, patch_size, failed, seed = task
    equation = equation.strip()
    if not equation:
        return

    image_dir = Path(data_dir) / "images"
    image_dir.mkdir(parents=True, exist_ok=True)
    base = image_id[:-4]
    png = image_dir / f"{base}.png"

    try:
        from PIL import Image

        # Per-task RNG: fork-started Pool workers inherit the parent's
        # global `random` state, so a module-level draw would produce the
        # SAME dpi sequence in every worker.
        img = mathtext_png(equation, random.Random(seed).randint(100, 150))
        new_w, new_h = _pad_extents(img.width, img.height, patch_size)
        canvas = Image.new("L", (new_w, new_h), 255)
        canvas.paste(img, ((new_w - img.width) // 2, (new_h - img.height) // 2))
        canvas.save(png)
    except Exception:
        failed.append((base, equation))
        png.unlink(missing_ok=True)


def render_one(task) -> None:
    equation, data_dir, image_id, patch_size, failed, seed = task
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
        dpi = random.Random(seed).randint(100, 150)  # per-task (see above)
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
        new_w, new_h = _pad_extents(w, h, patch_size)
        subprocess.run(
            ["convert", str(paths["png"]), "-gravity", "center",
             "-extent", f"{new_w}x{new_h}", str(paths["png"])],
            check=True, capture_output=True,
        )


def render_images(data_dir: str, num_processes: Optional[int] = None,
                  patch_size: int = 16, renderer: str = "latex") -> None:
    root = Path(data_dir)
    equations = [l for l in (root / "labels.txt").read_text().splitlines() if l.strip()]
    ids = [l for l in (root / "ids.txt").read_text().splitlines() if l.strip()]
    render_fn = render_one_mathtext if renderer == "mathtext" else render_one

    with Manager() as manager:
        failed = manager.list()
        tasks = [
            (eq, data_dir, ids[i], patch_size, failed, i)
            for i, eq in enumerate(equations)
        ]
        with Pool(processes=num_processes or cpu_count()) as pool:
            for i, _ in enumerate(pool.imap(render_fn, tasks)):
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
    p.add_argument("--renderer", choices=["auto", "latex", "mathtext"],
                   default="auto",
                   help="latex = the reference's subprocess chain; mathtext "
                        "= matplotlib's TeX subset, no binaries needed; "
                        "auto = latex when installed, else mathtext")
    args = p.parse_args()

    renderer = args.renderer
    if renderer == "auto":
        missing = check_binaries()  # error string when binaries are absent
        renderer = "mathtext" if missing else "latex"
        print(f"renderer: {renderer} (auto-detected)")
    elif renderer == "latex":
        err = check_binaries()
        if err:
            print(err, file=sys.stderr)
            sys.exit(2)

    config = load_config(args.config)
    render_images(
        args.data_dir,
        num_processes=config.get("num_processes"),
        patch_size=config.get("patch_size", 16),
        renderer=renderer,
    )
    prune_equations(args.data_dir)


if __name__ == "__main__":
    main()
