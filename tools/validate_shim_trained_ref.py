#!/usr/bin/env python
"""Validate the .pth conversion shim against a GENUINELY TRAINED reference
checkpoint (not a synthetic/seeded state dict).

Closes the PARITY.md caveat that the shim had only ever converted
synthetically-initialized reference models: this script

1. imports the PyTorch reference from /root/reference (its own model code,
   its own training semantics: Adam lr 5e-4, loss computed inside the model
   with NO pad masking — reference train.py:42-99, decoder.py:132-140),
2. trains the production 23.7M-param architecture for a few dozen steps on
   real rendered images from a data-factory dataset (loss must drop),
3. saves the checkpoint in the reference's exact on-disk format
   ({epoch, model_state_dict, optimizer_state_dict}; reference utils.py:52-61),
4. loads that .pth through the serving wrapper's conversion path
   (texocr_tpu/checkpoint/torch_shim.py via TexOCR(model_path=...)), and
5. asserts decode parity (token-for-token greedy trace) and teacher-forced
   token-accuracy parity between the trained torch model and the converted
   JAX model on held-out images.

Run (CPU; the reference is torch-only):
  JAX_PLATFORMS=cpu python tools/validate_shim_trained_ref.py \
      --data /tmp/curr/data_typeset24k/train --steps 60 --out /tmp/ref_trained
Prints one JSON line with losses, parity results, and accuracy deltas.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tests.ref_loader import import_reference, reference_available  # noqa: E402

# The reference production config surface (reference config/config.yml) with
# the runtime-injected keys (reference train.py:33-34). max_length is set
# from the sampled labels below.
BASE_CONFIG = {
    "patch_size": 16,
    "glu": True,
    "bos_token": 998,
    "eos_token": 997,
    "trg_pad_idx": 999,
    "device": "cpu",
    "vocab_size": 1000,
    "dtype": "float32",
    "use_flash_attention": False,
    "encoder": {
        "n_channels": 1, "embed_dim": 256, "num_layers": 4, "heads": 8,
        "dropout": 0.1, "exp_factor": 4,
    },
    "decoder": {
        "embed_dim": 256, "num_layers": 4, "heads": 8, "cross_attend": True,
        "dropout": 0.0, "exp_factor": 4,
    },
}


def load_items(data_dir, canvas, tokenizer, max_items, max_tokens):
    """(images float32 inverted, uint8 canvases, padded targets) from a
    data-factory split dir, restricted to one (h, w) bucket."""
    from PIL import Image

    ids_f = os.path.join(data_dir, "ids.txt")
    labels_f = os.path.join(data_dir, "labels.txt")
    ids = [l for l in open(ids_f).read().splitlines() if l.strip()]
    labels = [l for l in open(labels_f).read().splitlines() if l.strip()]
    h, w = canvas
    imgs, u8s, toks = [], [], []
    for image_id, label in zip(ids, labels):
        path = os.path.join(data_dir, "images", image_id)
        if not os.path.exists(path):
            continue
        img = Image.open(path)
        if img.size != (w, h):
            continue
        enc = tokenizer.encode(label)
        if len(enc) + 2 > max_tokens:
            continue
        arr = np.asarray(img.convert("L"), np.uint8)
        u8s.append(arr[..., None])
        imgs.append(1.0 - arr.astype(np.float32) / 255.0)
        toks.append(enc)
        if len(imgs) >= max_items:
            break
    if len(imgs) < 32:
        raise SystemExit(
            f"only {len(imgs)} items at canvas {canvas} in {data_dir}; "
            "pick a more common bucket")
    max_len = max(len(t) for t in toks) + 2
    targets = np.full((len(toks), max_len), 999, np.int64)
    for i, t in enumerate(toks):
        targets[i, 0] = 998
        targets[i, 1:1 + len(t)] = t
        targets[i, 1 + len(t)] = 997
    return (np.stack(imgs)[:, None], np.stack(u8s), targets, max_len)


def cut_at_eos(row, eos=997):
    row = list(int(t) for t in row)
    return row[: row.index(eos) + 1] if eos in row else row


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--data", required=True,
                   help="data-factory split dir (labels.txt/ids.txt/images)")
    p.add_argument("--canvas", type=int, nargs=2, default=(32, 320))
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--max_items", type=int, default=144)
    p.add_argument("--holdout", type=int, default=16)
    p.add_argument("--decode_steps", type=int, default=24)
    p.add_argument("--max_tokens", type=int, default=96)
    p.add_argument("--out", default="/tmp/ref_trained")
    p.add_argument("--seed", type=int, default=20260818)
    args = p.parse_args()

    if not reference_available():
        raise SystemExit("/root/reference not mounted")

    import torch

    import_reference()
    from TeXOCR.model.ocr_model import create_model

    from texocr_tpu.tokenizer import DEFAULT_VOCAB_PATH, RegexBPETokenizer

    tokenizer = RegexBPETokenizer()
    tokenizer.load(DEFAULT_VOCAB_PATH)

    images, u8s, targets, max_len = load_items(
        args.data, tuple(args.canvas), tokenizer, args.max_items,
        args.max_tokens)
    config = dict(BASE_CONFIG, max_length=int(max_len))
    print(f"{images.shape[0]} items at canvas {tuple(args.canvas)}, "
          f"max_length {max_len}", flush=True)

    hold = args.holdout
    tr_img, tr_trg = images[hold:], targets[hold:]
    ho_img, ho_u8, ho_trg = images[:hold], u8s[:hold], targets[:hold]

    # -- 2. train the reference with its own semantics ----------------------
    torch.manual_seed(args.seed)
    model = create_model(dict(config))
    opt = torch.optim.Adam(model.parameters(), lr=5e-4)  # reference config.yml
    model.train()
    losses = []
    n = tr_img.shape[0]
    rng = np.random.default_rng(args.seed)
    for step in range(args.steps):
        idx = rng.choice(n, size=args.batch, replace=False)
        img_t = torch.from_numpy(tr_img[idx])
        trg_t = torch.from_numpy(tr_trg[idx])
        loss = model(img_t, trg_t)  # loss INSIDE the model (decoder.py:140)
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss.item()))
        if step % 10 == 0:
            print(f"step {step}: loss {losses[-1]:.4f}", flush=True)

    first5, last5 = float(np.mean(losses[:5])), float(np.mean(losses[-5:]))
    assert last5 < first5, f"reference training did not learn: {first5} -> {last5}"

    # -- 3. save in the reference's checkpoint format -----------------------
    os.makedirs(args.out, exist_ok=True)
    pth = os.path.join(args.out, "checkpoint_trained.pth")
    torch.save({
        "epoch": args.steps,
        "model_state_dict": model.state_dict(),
        "optimizer_state_dict": opt.state_dict(),
    }, pth)
    print(f"saved {pth}", flush=True)

    # -- torch side: teacher-forced logits + greedy trace on the holdout ----
    model.eval()
    with torch.no_grad():
        img_t = torch.from_numpy(ho_img)
        trg_t = torch.from_numpy(ho_trg)
        enc = model.encoder(img_t)
        trg_mask = model.make_trg_mask(trg_t)
        x_in, x_out = trg_t[:, :-1], trg_t[:, 1:]
        tf_logits = model.decoder.net(x_in, mask=trg_mask[:, :-1], enc=enc)
        pad = config["trg_pad_idx"]
        valid = (x_out != pad).numpy()
        tf_pred_ref = tf_logits.argmax(-1).numpy()
        ref_tf_acc = float(
            (tf_pred_ref == x_out.numpy())[valid].mean())

        out_tok = torch.full((hold, 1), config["bos_token"], dtype=torch.long)
        mask = torch.ones_like(out_tok, dtype=torch.bool)
        for _ in range(args.decode_steps):
            lg = model.decoder.net(out_tok, mask=mask, enc=enc)[:, -1, :]
            out_tok = torch.cat([out_tok, lg.argmax(-1, keepdim=True)], -1)
            mask = torch.nn.functional.pad(mask, (0, 1), value=True)
        ref_decode = out_tok.numpy()[:, 1:]  # generated suffix

    # -- 4./5. convert through the serving wrapper and compare --------------
    import jax

    from texocr_tpu.utils import enable_compile_cache

    # Re-asserts JAX_PLATFORMS=cpu (the axon plugin force-overrides it at
    # import) — this comparison must NOT grab the busy single-tenant chip.
    enable_compile_cache()
    # XLA:CPU's default matmul precision accumulates in reduced precision
    # (~1e-1 abs error on the ResNet stem) — force fp32 for argmax parity,
    # same as tests/conftest.py.
    jax.config.update("jax_default_matmul_precision", "highest")

    from texocr_tpu.serving.wrapper import TexOCR

    engine = TexOCR(dict(config, tokenizer_path=DEFAULT_VOCAB_PATH,
                         model_path=pth))
    assert engine.config["max_length"] == max_len  # pos-table adoption

    import jax.numpy as jnp

    jx_img = jnp.asarray(ho_img[:, 0, :, :, None])  # NCHW -> NHWC
    jx_trg = jnp.asarray(ho_trg.astype(np.int32))
    # OCRModel.__call__ returns the teacher-forced (logits, shifted labels)
    # pair — the same trace as the torch block above.
    jx_logits, _ = engine.model.apply(engine.params, jx_img, jx_trg)
    jx_pred = np.asarray(jnp.argmax(jx_logits, -1))
    jx_tf_acc = float((jx_pred == ho_trg[:, 1:])[valid].mean())
    tf_agree = float((jx_pred == tf_pred_ref)[valid].mean())

    jx_decode = np.asarray(engine.generate_batch(
        ho_u8, max_len=args.decode_steps, mode="greedy"))

    rows_match = 0
    mismatches = []
    for i in range(hold):
        a = cut_at_eos(ref_decode[i])[: args.decode_steps]
        b = cut_at_eos(jx_decode[i])[: args.decode_steps]
        if a == b:
            rows_match += 1
        else:
            mismatches.append({"row": i, "ref": a[:16], "jax": b[:16]})

    result = {
        "items": int(images.shape[0]),
        "steps": args.steps,
        "loss_first5": round(first5, 4),
        "loss_last5": round(last5, 4),
        "ref_tf_token_acc": round(ref_tf_acc, 4),
        "jax_tf_token_acc": round(jx_tf_acc, 4),
        "tf_argmax_agreement": round(tf_agree, 4),
        "greedy_rows_match": rows_match,
        "greedy_rows_total": hold,
        "pth": pth,
    }
    print("RESULT " + json.dumps(result), flush=True)
    if mismatches:
        print(json.dumps(mismatches[:4], default=int), flush=True)
    ok = (rows_match == hold and abs(ref_tf_acc - jx_tf_acc) < 0.005
          and tf_agree > 0.995)
    print("PARITY OK" if ok else "PARITY FAILED", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
