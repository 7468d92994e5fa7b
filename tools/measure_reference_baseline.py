"""Measure the PyTorch reference's CPU decode throughput (milestone 0).

The reference publishes no numbers (BASELINE.md), so this anchors the
"images/sec/chip vs CPU baseline" ratio: batched greedy decode on the
reference model — full re-forward per step, no KV cache (reference
decoder.py:97-116) — at the production architecture and the (160, 1008)
canvas, on this host's CPU.

Writes bench_baseline.json at the repo root; bench.py reads it. Run once with
/root/reference mounted.
"""

import json
import os
import sys
import time
import types
from functools import partial

REF_PARENT = "/tmp/refpkg"
os.makedirs(REF_PARENT, exist_ok=True)
link = os.path.join(REF_PARENT, "TeXOCR")
if not os.path.exists(link):
    os.symlink("/root/reference", link)
sys.path.insert(0, REF_PARENT)

tv = types.ModuleType("torchvision")
tf = types.ModuleType("torchvision.transforms")


class _IM:
    BILINEAR = "bilinear"


tf.InterpolationMode = _IM
tf.Compose = lambda x: x
tf.RandomAffine = lambda **kw: None
tf.ToTensor = lambda: None
tf.Grayscale = lambda **kw: None
tv.transforms = tf
sys.modules["torchvision"] = tv
sys.modules["torchvision.transforms"] = tf

import numpy as np  # noqa: E402
import torch  # noqa: E402

from TeXOCR.model.ocr_model import create_model  # noqa: E402

BATCH = 8          # CPU throughput is ~batch-linear; extrapolates to 64
DECODE_STEPS = 256 # matches the TPU bench's fixed decode length
H, W = 160, 1008   # the reference's hard-coded max canvas (encoder.py:184)


def main():
    config = {
        "patch_size": 16,
        "glu": True,
        "bos_token": 998,
        "eos_token": 997,
        "trg_pad_idx": 999,
        "max_length": 512,
        "vocab_size": 1000,
        "device": "cpu",
        "encoder": {
            "n_channels": 1, "embed_dim": 256, "num_layers": 4, "heads": 8,
            "dropout": 0.1, "exp_factor": 4,
        },
        "decoder": {
            "embed_dim": 256, "num_layers": 4, "heads": 8,
            "cross_attend": True, "dropout": 0.1, "exp_factor": 4,
        },
    }
    torch.manual_seed(0)
    model = create_model(config)
    model.eval()

    images = torch.randn(BATCH, 1, H, W)

    with torch.no_grad():
        t0 = time.time()
        enc = model.encoder(images)
        t_enc = time.time() - t0
        print(f"encoder: {t_enc:.1f}s for batch {BATCH}", file=sys.stderr)

        # Greedy decode with the reference's own loop shape: full re-forward
        # over the whole prefix each step, argmax (sampling and argmax cost
        # the same; EOS early-exit disabled for a fixed-length measurement).
        out = torch.full((BATCH, 1), 998, dtype=torch.long)
        mask = torch.ones_like(out, dtype=torch.bool)
        t0 = time.time()
        for i in range(DECODE_STEPS):
            logits = model.decoder.net(out, mask=mask, enc=enc)[:, -1, :]
            nxt = logits.argmax(-1, keepdim=True)
            out = torch.cat([out, nxt], dim=-1)
            mask = torch.nn.functional.pad(mask, (0, 1), value=True)
            if i % 32 == 0:
                print(f"  step {i}: {time.time()-t0:.1f}s", file=sys.stderr)
        t_dec = time.time() - t0

    total = t_enc + t_dec
    ips = BATCH / total
    result = {
        "metric": "batch_greedy_decode_images_per_sec",
        "value": ips,
        "unit": "images/sec",
        "hardware": "host CPU (1 core), PyTorch reference",
        "batch": BATCH,
        "decode_steps": DECODE_STEPS,
        "image_hw": [H, W],
        "encoder_seconds": t_enc,
        "decode_seconds": t_dec,
        "notes": (
            "Reference decode loop: full re-forward per step, no KV cache. "
            "Measured at batch 8; CPU throughput is ~batch-linear."
        ),
    }
    out_path = os.path.join(os.path.dirname(__file__), "..", "bench_baseline.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
