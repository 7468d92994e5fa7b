"""One-off inference CLI (the reference ocr_model.py __main__ surface):
``python -m texocr_tpu.serving.cli equation.png --config config/config.yml
[--checkpoint model.pth] [--mode greedy|beam|sample] [--max_len 350]``."""

from __future__ import annotations

import argparse

from texocr_tpu.utils import enable_compile_cache

# Honors JAX_PLATFORMS (some PJRT plugins force-override it) and reuses
# compiled executables across runs; must run before anything jits.
enable_compile_cache()

from texocr_tpu.config import load_config  # noqa: E402
from texocr_tpu.serving.wrapper import TexOCR  # noqa: E402


def main():
    p = argparse.ArgumentParser(description="Image -> LaTeX inference.")
    p.add_argument("image", type=str)
    p.add_argument("--config", type=str, default="config/config.yml")
    p.add_argument("--checkpoint", type=str, default=None,
                   help=".pth (reference) or orbax checkpoint dir")
    p.add_argument("--max_len", type=int, default=350)
    p.add_argument("--temp", type=float, default=0.3)
    p.add_argument("--mode", type=str, default="greedy",
                   choices=["greedy", "beam", "sample"])
    p.add_argument("--beam_size", type=int, default=5)
    args = p.parse_args()

    from PIL import Image

    config = load_config(args.config)
    if args.checkpoint:
        config["model_path"] = args.checkpoint
    engine = TexOCR(config)
    tokens, latex = engine(
        Image.open(args.image), max_len=args.max_len, temp=args.temp,
        mode=args.mode, beam_size=args.beam_size,
    )
    print(f"tokens: {tokens}")
    print(latex)


if __name__ == "__main__":
    main()
