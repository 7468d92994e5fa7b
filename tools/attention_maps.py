#!/usr/bin/env python
"""Cross-attention heatmaps: where the decoder looked for each output token.

The reference's Transformer collects per-layer attention intermediates
(reference attention.py:235-267, decoder.py:63-65) but nothing user-facing
surfaces them. This tool completes the loop: decode an image, then replay the
decoded sequence teacher-forced with ``return_attn=True`` and render each
output token's cross-attention distribution over the encoder's patch grid as
a red overlay on the input image.

Usage:
  python tools/attention_maps.py equation.png --config config/config.yml \
      --checkpoint ckpts/ --out /tmp/attn [--max_len 350] [--layer -1]

Outputs: ``<out>/token_XXX.png`` per decoded token (overlay), and
``<out>/summary.json`` (decoded ids/latex + each token's strongest patch).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from texocr_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()


def cross_attention_maps(engine, canvas_u8: np.ndarray, token_ids: list[int]):
    """Teacher-forced replay of [BOS] + tokens -> (layers, heads, T, N_enc)
    post-softmax cross-attention weights."""
    import jax.numpy as jnp

    from texocr_tpu.models.ocr_model import OCRModel

    model = engine.model
    cfg = model.config
    images = 1.0 - jnp.asarray(canvas_u8).astype(jnp.float32) / 255.0
    enc = model.apply(engine.params, images, method=OCRModel.encode)
    seq = jnp.asarray([[cfg.bos_token] + list(token_ids)], jnp.int32)

    def fwd(m, tokens, enc):
        return m.decoder(tokens, enc=enc, return_attn=True)

    _, maps = model.apply(engine.params, seq, enc, method=fwd)
    # Sub-layer order per decoder layer is (self, cross, mlp); the attention
    # intermediates alternate [self, cross] (models/attention.py). Without
    # cross-attention the [1::2] slice would mislabel self-attention maps.
    num_layers = cfg.decoder.num_layers
    if len(maps) != 2 * num_layers:
        raise ValueError(
            f"expected [self, cross] maps per layer ({2 * num_layers}), got "
            f"{len(maps)} — is the decoder configured with cross_attend?"
        )
    cross = maps[1::2]
    return np.stack([np.asarray(m[0]) for m in cross])  # (L, H, T, N)


def heat_to_overlay(base_l: np.ndarray, heat: np.ndarray) -> "object":
    """Grayscale canvas + per-patch heat (gh, gw) -> RGB overlay image."""
    from PIL import Image

    h, w = base_l.shape
    heat = heat / (heat.max() + 1e-9)
    heat_img = Image.fromarray((heat * 255).astype(np.uint8)).resize(
        (w, h), Image.BILINEAR
    )
    heat_arr = np.asarray(heat_img).astype(np.float32) / 255.0
    base = base_l.astype(np.float32)
    rgb = np.stack(
        [
            base + (255.0 - base) * heat_arr * 0.9,  # push red up in hot spots
            base * (1.0 - 0.6 * heat_arr),
            base * (1.0 - 0.6 * heat_arr),
        ],
        axis=-1,
    )
    return Image.fromarray(np.clip(rgb, 0, 255).astype(np.uint8), "RGB")


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("image", type=str)
    p.add_argument("--config", type=str, default="config/config.yml")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--out", type=str, default="attn_maps")
    p.add_argument("--max_len", type=int, default=350)
    p.add_argument("--layer", type=int, default=-1,
                   help="decoder layer to visualize (-1 = mean over layers)")
    p.add_argument("--max_tokens", type=int, default=64,
                   help="cap on per-token overlay PNGs written")
    args = p.parse_args()

    from PIL import Image

    from texocr_tpu.config import load_config
    from texocr_tpu.models.resnet import ResNetV2
    from texocr_tpu.serving.wrapper import TexOCR

    config = load_config(args.config)
    if args.checkpoint:
        config["model_path"] = args.checkpoint
    engine = TexOCR(config)

    img = Image.open(args.image)
    canvas = engine.preprocess(img)
    tokens = np.asarray(
        engine.generate_batch(canvas, max_len=args.max_len, mode="greedy")
    )[0]
    ids, latex = engine.postprocess(tokens)
    if not ids:
        print("decoded zero tokens before EOS; nothing to visualize")
        return 1

    attn = cross_attention_maps(engine, canvas, ids)  # (L, H, T, N)
    layer = attn.mean(axis=0) if args.layer == -1 else attn[args.layer]
    per_token = layer.mean(axis=0)  # (T, N) — mean over heads

    ch, cw = canvas.shape[1:3]
    enc_cfg = engine.model.config.encoder
    if getattr(enc_cfg, "embed_layer", "hybrid") == "hybrid":
        gh, gw = ResNetV2.feature_grid((ch, cw), len(enc_cfg.resnet_depths))
    else:  # pure patch embedding
        gh, gw = ch // enc_cfg.patch_size, cw // enc_cfg.patch_size
    assert per_token.shape[-1] == gh * gw + 1, (per_token.shape, gh, gw)

    os.makedirs(args.out, exist_ok=True)
    base = canvas[0, ..., 0]
    summary = {"latex": latex, "tokens": ids, "grid": [gh, gw], "per_token": []}
    # Row t of the teacher-forced replay predicts token t of ``ids``: the
    # attention row for ids[t] is position t (BOS occupies the first input).
    for t, tok in enumerate(ids[: args.max_tokens]):
        heat = per_token[t, 1:].reshape(gh, gw)  # drop CLS
        overlay = heat_to_overlay(base, heat)
        name = f"token_{t:03d}.png"
        overlay.save(os.path.join(args.out, name))
        peak = int(heat.argmax())
        summary["per_token"].append({
            "t": t, "id": int(tok),
            "text": engine.tokenizer.decode([int(tok)]),
            "peak_patch_yx": [peak // gw, peak % gw],
            "cls_weight": float(per_token[t, 0]),
        })
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(f"decoded: {latex!r}")
    print(f"{min(len(ids), args.max_tokens)} overlays -> {args.out}/")
    return 0


if __name__ == "__main__":
    sys.exit(main())
