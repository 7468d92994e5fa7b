"""Offline data-factory host logic: splitting, rendering (against stub
latex/dvipng/convert binaries — texlive is not in this image) and failure
pruning."""

import os
import stat
import textwrap

from texocr_tpu.data.factory.render_data import prune_equations, render_images
from texocr_tpu.data.factory.split_data import split_data


def _write_stub(path, body):
    path.write_text("#!/usr/bin/env python3\n" + textwrap.dedent(body))
    path.chmod(path.stat().st_mode | stat.S_IXUSR | stat.S_IXGRP | stat.S_IXOTH)


def _install_render_stubs(bin_dir):
    """Deterministic fake latex/dvipng/convert with the real CLI surfaces
    render_one drives (reference render_data.py:55-92 call shapes)."""
    bin_dir.mkdir(exist_ok=True)
    # latex -interaction=nonstopmode -output-directory DIR FILE.tex -> FILE.dvi
    # Fails (like real latex on bad input) when the equation contains FAILME.
    _write_stub(bin_dir / "latex", r"""
        import pathlib, sys
        tex = pathlib.Path(sys.argv[-1])
        out_dir = pathlib.Path(sys.argv[sys.argv.index("-output-directory") + 1])
        src = tex.read_text()
        if "FAILME" in src:
            sys.exit(1)
        (out_dir / (tex.stem + ".dvi")).write_text(src)
    """)
    # dvipng -D DPI -T tight -o OUT.png IN.dvi -> PNG whose size depends on
    # the equation (odd sizes, so the convert padding step has work to do).
    _write_stub(bin_dir / "dvipng", r"""
        import pathlib, sys
        from PIL import Image
        out = pathlib.Path(sys.argv[sys.argv.index("-o") + 1])
        dvi = pathlib.Path(sys.argv[-1])
        n = len(dvi.read_text())
        Image.new("L", (37 + n, 23), 0).save(out)
    """)
    # convert IN -gravity center -extent WxH OUT -> center-pad with white.
    _write_stub(bin_dir / "convert", r"""
        import pathlib, sys
        from PIL import Image
        src, out = pathlib.Path(sys.argv[1]), pathlib.Path(sys.argv[-1])
        w, h = map(int, sys.argv[sys.argv.index("-extent") + 1].split("x"))
        im = Image.open(src)
        canvas = Image.new("L", (w, h), 255)
        canvas.paste(im, ((w - im.width) // 2, (h - im.height) // 2))
        canvas.save(out)
    """)


def test_render_factory_end_to_end_with_stub_binaries(tmp_path, monkeypatch):
    """L1 executes: render_images + prune_equations against stub binaries,
    including the failure path (reference render_data.py:55-92,140-171)."""
    _install_render_stubs(tmp_path / "bin")
    monkeypatch.setenv(
        "PATH", f"{tmp_path / 'bin'}{os.pathsep}{os.environ['PATH']}"
    )

    data = tmp_path / "train"
    data.mkdir()
    eqs = ["x + 1", "FAILME \\badmacro", "\\int_0^1 x^2 dx"]
    ids = ["eq_1.png", "eq_2.png", "eq_3.png"]
    (data / "labels.txt").write_text("\n".join(eqs) + "\n")
    (data / "ids.txt").write_text("\n".join(ids) + "\n")

    render_images(str(data), num_processes=2, patch_size=16)
    prune_equations(str(data))

    # Successes rendered to patch-multiple canvases (h mult 16, w mult 64).
    from PIL import Image

    for good in ("eq_1.png", "eq_3.png"):
        p = data / "images" / good
        assert p.exists(), good
        with Image.open(p) as im:
            w, h = im.size
        assert h % 16 == 0 and w % 64 == 0, (good, w, h)
    assert not (data / "images" / "eq_2.png").exists()

    # Failure logged and pruned; intermediates cleaned up.
    assert "eq_2" in (data / "failed.txt").read_text()
    assert (data / "ids_pruned.txt").read_text().splitlines() == [
        "eq_1.png", "eq_3.png"
    ]
    assert (data / "labels_pruned.txt").read_text().splitlines() == [
        "x + 1", "\\int_0^1 x^2 dx"
    ]
    leftovers = [
        p for p in (data / "images").iterdir() if p.suffix != ".png"
    ]
    assert leftovers == []

    # The loader picks up the pruned files (dataset.py prefers *_pruned).
    from texocr_tpu.data import ImageDataset
    from texocr_tpu.tokenizer import DEFAULT_VOCAB_PATH

    ds = ImageDataset(str(data), DEFAULT_VOCAB_PATH, dataset_size=10)
    assert len(ds) == 2


def test_split_data_layout(tmp_path):
    master = tmp_path / "master.txt"
    eqs = [f"x + {i}" for i in range(100)]
    master.write_text("\n".join(eqs) + "\n")
    split_data(str(master), (0.8, 0.15, 0.05), str(tmp_path / "out"), 100, seed=1)

    seen_labels, seen_ids = [], []
    sizes = {}
    for split in ("train", "test", "val"):
        d = tmp_path / "out" / split
        labels = (d / "labels.txt").read_text().splitlines()
        ids = (d / "ids.txt").read_text().splitlines()
        assert len(labels) == len(ids)
        sizes[split] = len(labels)
        seen_labels += labels
        seen_ids += ids
    assert sizes == {"train": 80, "test": 15, "val": 5}
    # Shuffle is a permutation: every equation lands in exactly one split,
    # and ids were assigned BEFORE the shuffle (reference split_data.py:28-35):
    # id eq_N corresponds to master line N-1.
    assert sorted(seen_labels) == sorted(eqs)
    assert len(set(seen_ids)) == 100
    for label, id_ in zip(seen_labels, seen_ids):
        n = int(id_[3:-4])
        assert eqs[n - 1] == label


def test_split_caps_at_num_equations(tmp_path):
    master = tmp_path / "master.txt"
    master.write_text("\n".join(f"eq {i}" for i in range(50)) + "\n")
    split_data(str(master), (0.8, 0.15, 0.05), str(tmp_path / "out"), 20,
               seed=1, verbose=False)
    total = sum(
        len((tmp_path / "out" / s / "labels.txt").read_text().splitlines())
        for s in ("train", "test", "val")
    )
    assert total == 20


def test_prune_equations(tmp_path):
    d = tmp_path
    (d / "ids.txt").write_text("eq_1.png\neq_2.png\neq_3.png")
    (d / "labels.txt").write_text("a\nb\nc")
    (d / "failed.txt").write_text("eq_2: b\n")
    prune_equations(str(d))
    assert (d / "ids_pruned.txt").read_text().splitlines() == [
        "eq_1.png", "eq_3.png"
    ]
    assert (d / "labels_pruned.txt").read_text().splitlines() == ["a", "c"]


def test_prune_noop_without_failures(tmp_path):
    (tmp_path / "ids.txt").write_text("eq_1.png")
    (tmp_path / "labels.txt").write_text("a")
    prune_equations(str(tmp_path))
    assert not (tmp_path / "ids_pruned.txt").exists()


def test_telemetry_metrics_logger(tmp_path, capsys):
    import json

    from texocr_tpu.telemetry import MetricsLogger, step_timer

    log = MetricsLogger(str(tmp_path / "m.jsonl"), echo=True)
    log.log("train_step", loss=1.5, step=3)
    log.close()
    line = json.loads((tmp_path / "m.jsonl").read_text().splitlines()[0])
    assert line["event"] == "train_step" and line["loss"] == 1.5
    assert json.loads(capsys.readouterr().out.splitlines()[0])["step"] == 3

    holder = {}
    with step_timer(holder):
        pass
    assert holder["seconds"] >= 0


def test_render_factory_mathtext_backend(tmp_path):
    """The binary-free mathtext backend executes the same contract for real:
    typeset PNGs on pad-rule canvases, parse failures -> failed.txt -> prune,
    and the loader consumes the output."""
    data = tmp_path / "train"
    data.mkdir()
    eqs = [
        r"\int _ { 0 } ^ { 1 } x ^ { 2 } d x",
        r"\notarealcommandxyz { q }",
        r"\frac { a + b } { c }",
    ]
    ids = ["eq_1.png", "eq_2.png", "eq_3.png"]
    (data / "labels.txt").write_text("\n".join(eqs) + "\n")
    (data / "ids.txt").write_text("\n".join(ids) + "\n")

    render_images(str(data), num_processes=2, patch_size=16,
                  renderer="mathtext")
    prune_equations(str(data))

    import numpy as np
    from PIL import Image

    for good in ("eq_1.png", "eq_3.png"):
        p = data / "images" / good
        assert p.exists(), good
        with Image.open(p) as im:
            assert im.mode == "L"
            w, h = im.size
            arr = np.asarray(im)
        assert h % 16 == 0 and w % 64 == 0, (good, w, h)
        assert (arr < 128).any(), f"{good} rendered blank"
    assert not (data / "images" / "eq_2.png").exists()
    assert "eq_2" in (data / "failed.txt").read_text()
    assert (data / "ids_pruned.txt").read_text().splitlines() == [
        "eq_1.png", "eq_3.png"
    ]

    from texocr_tpu.data import ImageDataset
    from texocr_tpu.tokenizer import DEFAULT_VOCAB_PATH

    ds = ImageDataset(str(data), DEFAULT_VOCAB_PATH, dataset_size=10)
    assert len(ds) == 2


def test_typeset_wrap_preserves_tokens_and_canvas_rule():
    """--typeset rendering: line wrapping splits only at top-level operators
    (recombining the lines restores the exact label) and the rendered canvas
    follows the realistic profile rule."""
    import os
    import sys
    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import numpy as np
    from make_demo_dataset import (
        REALISTIC_PROFILES, _wrap_top_level, render_realistic_typeset,
    )

    eq = (r"\frac { a + b } { c } + \sin x = \sqrt { \frac { 1 } { z } } "
          r"- \int _ { 0 } ^ { 1 } y ^ { 2 } d y")
    lines = _wrap_top_level(eq, char_budget=12)
    assert len(lines) > 1
    assert " ".join(lines) == eq  # no token lost or reordered
    for line in lines:  # every line is balanced (independently renderable)
        assert line.count("{") == line.count("}")

    img = render_realistic_typeset(eq, np.random.default_rng(0))
    assert (img.height, img.width) in [
        (h, w) for h, w in REALISTIC_PROFILES
    ]
    assert (np.asarray(img) < 128).any()


def test_mathtext_digit_base_scripts_render_distinctly():
    """Regression: matplotlib mathtext silently drops ^/_ when the script
    base is a digit and the tokens are space-separated (`2 ^ { b }` parses
    as the number 2 followed by a bare group), rendering sup and sub
    pixel-identically — real latex/dvipng ignores the spaces and renders
    them distinctly (reference render_data.py:38-47). mathtext_png must
    compact the token stream so scripted digits keep their visual cue."""
    import numpy as np

    from texocr_tpu.data.factory.render_data import compact_latex, mathtext_png

    assert compact_latex(r"\sin 2 ^ { b } + x _ { 1 }") == r"\sin2^{b}+x_{1}"
    # the load-bearing space survives: a command must not absorb a letter
    assert compact_latex(r"\sin x ^ { 2 }") == r"\sin x^{2}"

    for sup, sub in [
        ("2 ^ { b }", "2 _ { b }"),
        (r"\sin 2 ^ { b }", r"\sin 2 _ { b }"),
        (r"\tan 9 ^ { 1 }", r"\tan 9 _ { 1 }"),
        ("7 ^ { z }", "7 _ { z }"),
    ]:
        a = np.asarray(mathtext_png(sup, 125))
        b = np.asarray(mathtext_png(sub, 125))
        assert a.shape != b.shape or not np.array_equal(a, b), (
            f"{sup!r} and {sub!r} render identically")
