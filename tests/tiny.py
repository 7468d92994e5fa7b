"""Shared tiny-model/test-dataset helpers."""

import numpy as np

from texocr_tpu.config import ModelConfig

TINY_CONFIG = {
    "img_size": (32, 64),
    "patch_size": 16,
    "vocab_size": 50,
    "max_length": 24,
    "glu": True,
    "bos_token": 48,
    "eos_token": 47,
    "trg_pad_idx": 49,
    "dtype": "float32",
    "encoder": {
        "n_channels": 1,
        "embed_dim": 32,
        "num_layers": 1,
        "heads": 2,
        "resnet_depths": (1, 1, 1),
        "resnet_channels": (128, 128, 128),
        "stem_channels": 32,
    },
    "decoder": {
        "embed_dim": 32,
        "num_layers": 1,
        "heads": 2,
        "cross_attend": True,
        "dropout": 0.0,
        "exp_factor": 4,
    },
}


def tiny_model_config(**overrides) -> ModelConfig:
    cfg = dict(TINY_CONFIG)
    cfg.update(overrides)
    return ModelConfig.from_dict(cfg)


def synthetic_dataset_dir(tmp_path, tokenizer, sizes=((64, 32), (128, 32)), per_size=6):
    """Write a synthetic rendered-equation dataset directory: white background
    PNGs (with some black 'ink') + labels/ids files."""
    from PIL import Image

    root = tmp_path / "train"
    (root / "images").mkdir(parents=True)
    rng = np.random.default_rng(0)
    labels, ids = [], []
    eqs = [r"\int x dx", r"\frac { a } { b }", r"x ^ 2 + y ^ 2", r"\alpha \beta"]
    n = 0
    for w, h in sizes:
        for _ in range(per_size):
            arr = np.full((h, w), 255, np.uint8)
            arr[
                rng.integers(0, h, 40), rng.integers(0, w, 40)
            ] = 0  # sprinkle ink
            name = f"eq_{n:04d}.png"
            Image.fromarray(arr).save(root / "images" / name)
            ids.append(name)
            labels.append(eqs[n % len(eqs)])
            n += 1
    (root / "labels.txt").write_text("\n".join(labels) + "\n")
    (root / "ids.txt").write_text("\n".join(ids) + "\n")
    return root
