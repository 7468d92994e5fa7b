"""Build a self-contained demo dataset without external LaTeX binaries.

The real data factory shells out to latex/dvipng/ImageMagick (not present in
this image). This demo factory renders equation strings with PIL's built-in
bitmap font instead — same artifact layout (data/{split}/{labels.txt, ids.txt,
images/} + pickles), same canvas rule (h mult 16, w mult 64), so the whole
training/eval/serving stack runs end to end on it. The OCR task is genuine:
map rendered glyphs back to the BPE token sequence.

Usage: python tools/make_demo_dataset.py [--out data_demo] [--n 2000]
"""

import argparse
import os
import random
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SYMBOLS = list("abcdefgxyznmpq") + ["0", "1", "2", "3", "4", "7", "9"]
GREEK = ["\\alpha", "\\beta", "\\gamma", "\\lambda", "\\mu", "\\pi",
         "\\sigma", "\\theta", "\\phi", "\\omega"]
OPS = ["+", "-", "=", "\\cdot", "\\times", "<", ">"]
FUNCS = ["\\sin", "\\cos", "\\log", "\\exp", "\\tan"]


def random_atom(rng):
    r = rng.random()
    if r < 0.5:
        return rng.choice(SYMBOLS)
    if r < 0.75:
        return rng.choice(GREEK)
    return f"{rng.choice(FUNCS)} {rng.choice(SYMBOLS)}"


def random_term(rng, depth=0):
    r = rng.random()
    a = random_atom(rng)
    if r < 0.25 and depth < 2:
        return f"\\frac {{ {random_term(rng, depth + 1)} }} {{ {random_term(rng, depth + 1)} }}"
    if r < 0.45:
        return f"{a} ^ {{ {rng.choice(SYMBOLS)} }}"
    if r < 0.6:
        return f"{a} _ {{ {rng.choice(SYMBOLS)} }}"
    if r < 0.7 and depth < 2:
        return f"\\sqrt {{ {random_term(rng, depth + 1)} }}"
    if r < 0.78 and depth < 1:
        return (f"\\int _ {{ {rng.choice(SYMBOLS)} }} ^ "
                f"{{ {rng.choice(SYMBOLS)} }} {random_term(rng, depth + 1)}")
    return a


def random_equation(rng, max_terms=5):
    n_terms = rng.integers(2, max(3, max_terms))
    parts = [random_term(rng)]
    for _ in range(n_terms - 1):
        parts.append(rng.choice(OPS))
        parts.append(random_term(rng))
    return " ".join(parts)


def render(eq: str, rng):
    """Render the equation string with PIL's default font onto a white canvas
    padded to the (16, 64)-multiple rule. Sub/superscripts and fraction bars
    are drawn positionally so the glyph layout carries structure."""
    from PIL import Image, ImageDraw, ImageFont

    font = ImageFont.load_default()
    # Strip the braces/backslashes for display but keep them in the label:
    # the model must recover the full LaTeX token sequence from the glyphs.
    display = eq.replace("\\", "").replace("{", "(").replace("}", ")")
    probe = Image.new("L", (8, 8), 255)
    bbox = ImageDraw.Draw(probe).textbbox((0, 0), display, font=font)
    w, h = bbox[2] - bbox[0] + 12, bbox[3] - bbox[1] + 12
    w, h = min(max(w, 32), 1008), min(max(h, 16), 160)
    img = Image.new("L", (w, h), 255)
    ImageDraw.Draw(img).text((6, 4), display, font=font, fill=0)

    # Coarser buckets than the real factory (width mult 192, fixed height 32)
    # keep the number of distinct compiled shapes tiny for the demo.
    new_h = 32
    new_w = min(-(-w // 192) * 192, 960)
    if h > new_h or w > new_w:
        scale = min(new_h / h, new_w / w)
        img = img.resize((max(1, int(w * scale)), max(1, int(h * scale))),
                         Image.BILINEAR)
        w, h = img.size
    canvas = Image.new("L", (new_w, new_h), 255)
    canvas.paste(img, ((new_w - w) // 2, (new_h - h) // 2))
    return canvas


# Realistic-regime mode (VERDICT round-1 #2): the reference's operating
# profile is long BPE label sequences (100-300 tokens) on canvases up to the
# (160, 1008) maximum. Equations get many terms; the display string wraps
# across lines so tall full-width buckets actually occur. Canvases quantize
# to a fixed profile set so every bucket accumulates full batches.
REALISTIC_PROFILES = [(32, 320), (32, 640), (48, 1008), (96, 1008), (160, 1008)]


def render_realistic(eq: str, rng):
    """Wrapped multi-line rendering onto the smallest fitting profile canvas
    (h mult 16, w mult 64, max (160, 1008) — the real render rule's shapes)."""
    from PIL import Image, ImageDraw, ImageFont

    font = ImageFont.load_default()
    display = eq.replace("\\", "").replace("{", "(").replace("}", ")")
    lines, cur = [], ""
    for word in display.split():
        if len(cur) + len(word) + 1 > 160 and cur:
            lines.append(cur)
            cur = word
        else:
            cur = f"{cur} {word}".strip()
    lines.append(cur)
    text = "\n".join(lines)

    probe = Image.new("L", (8, 8), 255)
    bbox = ImageDraw.Draw(probe).multiline_textbbox((0, 0), text, font=font)
    w, h = bbox[2] - bbox[0] + 12, bbox[3] - bbox[1] + 10
    img = Image.new("L", (max(w, 32), max(h, 16)), 255)
    ImageDraw.Draw(img).multiline_text((6, 4), text, font=font, fill=0)
    w, h = img.size

    for ph, pw in REALISTIC_PROFILES:
        if h <= ph and w <= pw:
            ch, cw = ph, pw
            break
    else:  # oversized: downscale into the max canvas
        ch, cw = REALISTIC_PROFILES[-1]
        scale = min(ch / h, cw / w)
        img = img.resize((max(1, int(w * scale)), max(1, int(h * scale))),
                         Image.BILINEAR)
        w, h = img.size
    canvas = Image.new("L", (cw, ch), 255)
    canvas.paste(img, ((cw - w) // 2, (ch - h) // 2))
    return canvas


def _wrap_top_level(eq: str, char_budget: int):
    """Split the token stream into lines at TOP-LEVEL operator boundaries
    (brace depth 0), so every line is independently valid LaTeX. Width is
    budgeted on the display length (backslashes/braces are not glyphs)."""
    def display_len(s):
        return len(s.replace("\\", "").replace("{", "").replace("}", ""))

    segs, cur, depth = [], [], 0
    for tok in eq.split():
        if tok in OPS and depth == 0 and cur:
            segs.append(" ".join(cur))
            cur = [tok]
        else:
            cur.append(tok)
        if tok == "{":
            depth += 1
        elif tok == "}":
            depth -= 1
    if cur:
        segs.append(" ".join(cur))

    lines, line = [], ""
    for seg in segs:
        cand = f"{line} {seg}".strip()
        if line and display_len(cand) > char_budget:
            lines.append(line)
            line = seg
        else:
            line = cand
    if line:
        lines.append(line)
    return lines


def render_realistic_typeset(eq: str, rng):
    """Real math typesetting (matplotlib mathtext — actual fraction bars,
    radicals, kerning, invisible grouping braces the model must infer from
    layout) wrapped onto the same profile canvases as render_realistic.
    Random dpi in [100, 150] like the reference render chain
    (reference render_data.py:62); oversized assemblies downscale into the
    max canvas like render_realistic."""
    from PIL import Image

    from texocr_tpu.data.factory.render_data import mathtext_png

    dpi = int(rng.integers(100, 151))
    # ~10 px/glyph at dpi 125; budget display chars for the 1008-wide canvas.
    lines = _wrap_top_level(eq, char_budget=int(88 * 125 / dpi))
    imgs = [mathtext_png(line, dpi) for line in lines]
    gap = max(2, dpi // 25)
    w = max(im.width for im in imgs) + 8
    h = sum(im.height for im in imgs) + gap * (len(imgs) - 1) + 8
    img = Image.new("L", (w, h), 255)
    y = 4
    for im in imgs:
        img.paste(im, (4, y))
        y += im.height + gap
    w, h = img.size

    for ph, pw in REALISTIC_PROFILES:
        if h <= ph and w <= pw:
            ch, cw = ph, pw
            break
    else:  # oversized: downscale into the max canvas
        ch, cw = REALISTIC_PROFILES[-1]
        scale = min(ch / h, cw / w)
        img = img.resize((max(1, int(w * scale)), max(1, int(h * scale))),
                         Image.BILINEAR)
        w, h = img.size
    canvas = Image.new("L", (cw, ch), 255)
    canvas.paste(img, ((cw - w) // 2, (ch - h) // 2))
    return canvas


def _typeset_task(task):
    """Pool worker: render one equation deterministically (per-item seed).

    Resume-safe: each item's output depends only on (eq, seed), so a file
    that already exists is identical to what this call would produce
    (renders are byte-deterministic) and is skipped — a killed 100k build
    restarts where it left off. The tmp+rename write keeps a kill from
    leaving a truncated png that a later resume would wrongly skip."""
    eq, path, seed = task
    if os.path.exists(path):
        return
    rng = np.random.default_rng(seed)
    img = render_realistic_typeset(eq, rng)
    tmp = path + ".tmp"
    img.save(tmp, format="PNG")
    os.replace(tmp, path)


def realistic_equation(rng, term_scale=1):
    """Mixture of lengths: ~30% short, ~40% medium, ~30% long (the long tail
    is what pushes BPE labels into the 100-300 token range). ``term_scale``
    compensates for flat atoms compressing ~4x better under BPE than nested
    terms (entropic mode below), keeping label lengths in the same band."""
    r = rng.random()
    if r < 0.3:
        n_terms = int(rng.integers(2, 7)) * term_scale
    elif r < 0.7:
        n_terms = int(rng.integers(8, 20)) * term_scale
    else:  # ~12 BPE tokens/term -> the 100-300-token long tail
        n_terms = int(rng.integers(20, 29)) * term_scale
    parts = [random_term(rng)]
    for _ in range(n_terms - 1):
        parts.append(rng.choice(OPS))
        parts.append(random_term(rng))
    return " ".join(parts)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default="data_demo")
    p.add_argument("--n", type=int, default=2000)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--simple", action="store_true",
                   help="short flat equations (easier image grounding demo)")
    p.add_argument("--realistic", action="store_true",
                   help="reference difficulty profile: long labels (100-300 "
                        "BPE tokens), buckets up to the (160, 1008) canvas")
    p.add_argument("--entropic", action="store_true",
                   help="grounding curriculum stage (RESULTS.md diagnosis): "
                        "realistic lengths/canvases/wrapping but near-uniform "
                        "flat atom sampling, so the LM floor sits near the "
                        "vocabulary entropy and loss can only drop by reading "
                        "glyphs")
    p.add_argument("--typeset", action="store_true",
                   help="render with real math typesetting (matplotlib "
                        "mathtext: fraction bars, radicals, kerning, "
                        "invisible grouping braces) instead of the PIL "
                        "bitmap font — the closest in-image stand-in for "
                        "the reference's latex/dvipng output")
    p.add_argument("--processes", type=int, default=None,
                   help="render pool size for --typeset (default: all CPUs)")
    args = p.parse_args()

    rng = np.random.default_rng(args.seed)
    global random_term
    if args.simple or args.entropic:
        # flat atoms only: every token must be read off the image
        random_term = lambda rng, depth=0: random_atom(rng)
    if args.entropic:
        eqs = [realistic_equation(rng, term_scale=3) for _ in range(args.n)]
    elif args.realistic:
        eqs = [realistic_equation(rng) for _ in range(args.n)]
    else:
        eqs = [random_equation(rng, max_terms=3 if args.simple else 5)
               for _ in range(args.n)]
    splits = {
        "train": eqs[: int(args.n * 0.8)],
        "test": eqs[int(args.n * 0.8) : int(args.n * 0.95)],
        "val": eqs[int(args.n * 0.95) :],
    }
    render_fn = (
        render_realistic if (args.realistic or args.entropic) else render
    )
    for split, labels in splits.items():
        root = os.path.join(args.out, split)
        os.makedirs(os.path.join(root, "images"), exist_ok=True)
        ids = [f"eq_{i:05d}.png" for i in range(len(labels))]
        if args.typeset:
            from multiprocessing import Pool, cpu_count

            tasks = [
                (eq, os.path.join(root, "images", name),
                 int(rng.integers(0, 2**31)))
                for eq, name in zip(labels, ids)
            ]
            with Pool(processes=args.processes or cpu_count()) as pool:
                for i, _ in enumerate(pool.imap(_typeset_task, tasks, 64)):
                    if (i + 1) % 5000 == 0:
                        print(f"  typeset {i + 1}/{len(tasks)}")
        else:
            for eq, name in zip(labels, ids):
                render_fn(eq, rng).save(os.path.join(root, "images", name))
        with open(os.path.join(root, "labels.txt"), "w") as f:
            f.write("\n".join(labels) + "\n")
        with open(os.path.join(root, "ids.txt"), "w") as f:
            f.write("\n".join(ids) + "\n")
        print(f"{split}: {len(labels)} rendered")

    # Pickles via the standard dataset builder.
    from texocr_tpu.data.dataset import ImageDataset
    from texocr_tpu.tokenizer import DEFAULT_VOCAB_PATH

    for split in splits:
        ds = ImageDataset(
            os.path.join(args.out, split), DEFAULT_VOCAB_PATH, dataset_size=args.n
        )
        ds.save(os.path.join(args.out, split, f"{split}set.pkl"))
        lens = sorted(len(t) for t in ds.token_ids)
        med = lens[len(lens) // 2] if lens else 0
        print(f"{split}: pickled ({len(ds)} items, max_seq_len {ds.max_seq_len}, "
              f"{len(ds.sizes)} shape buckets, BPE len p50={med} "
              f"max={lens[-1] if lens else 0})")
        if split == "train":
            from collections import Counter

            shapes = Counter()
            for (w, h), idxs in ds.sizes.items():
                shapes[(h, w)] = len(idxs)
            print(f"  bucket sizes (h, w): {dict(shapes)}")


if __name__ == "__main__":
    main()
