"""End-to-end demo: train the flagship model on the PIL-rendered demo dataset
(on whatever device JAX provides — the TPU under axon), then evaluate token
accuracy / exact match with the jitted greedy decoder.

Usage:
  python tools/make_demo_dataset.py --out /tmp/data_demo --n 1200
  python tools/demo_train_tpu.py --data /tmp/data_demo [--epochs 8]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from texocr_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402



def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", type=str, default="/tmp/data_demo")
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--save_dir", type=str, default="/tmp/demo_ckpts")
    p.add_argument("--eval_batches", type=int, default=4)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--init_from", type=str, default=None,
                   help="warm-start params from a checkpoint (or save_dir); "
                        "fresh optimizer state — the curriculum anneal knob")
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--seq_pad", type=int, default=128,
                   help="labels pad to a multiple of this (compile-cache knob)")
    p.add_argument("--eval_max_len", type=int, default=120)
    p.add_argument("--eval_batch_size", type=int, default=None)
    p.add_argument("--keep_small", action="store_true",
                   help="keep partial tail batches (small datasets)")
    p.add_argument("--device_data", action="store_true",
                   help="device-resident buckets + on-device batch selection "
                        "+ multi-step scan dispatch (training/device_data.py)")
    p.add_argument("--steps_per_call", type=int, default=16)
    p.add_argument("--save_freq", type=int, default=None)
    p.add_argument("--val_freq", type=int, default=None)
    p.add_argument("--augment", action="store_true",
                   help="on-device scale/translate/brightness augmentation "
                        "(device_data mode)")
    p.add_argument("--wd", type=float, default=0.0, help="Adam weight decay")
    p.add_argument("--grad_clip", type=float, default=0.0,
                   help="global-norm gradient clip (0 = off); bounds the "
                        "warm-start + fresh-cosine-schedule loss excursion "
                        "seen once at stage G epoch 7 (RESULTS.md)")
    p.add_argument("--warmup_steps", type=int, default=0,
                   help="linear lr warmup steps (with --decay_steps)")
    p.add_argument("--decay_steps", type=int, default=0,
                   help="cosine decay horizon in steps; 0 = constant lr")
    p.add_argument("--pack_bits", type=int, default=8, choices=(8, 4),
                   help="resident image storage depth: 4 packs two pixels "
                        "per byte (near-binary renders; unpacked on device) "
                        "— halves bucket HBM so full datasets stay resident")
    p.add_argument("--bucket_cap", type=int, default=None,
                   help="max resident rows per device bucket (seeded random "
                        "subset when a bucket exceeds it) — the HBM spill "
                        "knob for datasets too big to stage whole")
    p.add_argument("--max_canvas", type=int, nargs=2, default=None,
                   metavar=("H", "W"),
                   help="curriculum: train only on buckets within (H, W)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize sub-layer/bottleneck activations in "
                        "backward (fits large-bucket datasets alongside the "
                        "model in HBM; ~constant small step-time cost)")
    p.add_argument("--metrics_out", type=str, default=None,
                   help="also write the final metrics JSON to this file "
                        "(the curriculum driver points it at a committed "
                        "results/ artifact so a completed stage can't go "
                        "unreported)")
    p.add_argument("--host_val", action="store_true",
                   help="stream the val split from the host instead of "
                        "staging it in HBM (device_data mode spill knob)")
    args = p.parse_args()

    from texocr_tpu.config import ModelConfig
    from texocr_tpu.data.dataset import ImageDataset
    from texocr_tpu.evaluation.evaluate import test_model
    from texocr_tpu.models import OCRModel
    from texocr_tpu.tokenizer import DEFAULT_VOCAB_PATH
    from texocr_tpu.training.loop import train_model

    train_set = ImageDataset.load(os.path.join(args.data, "train", "trainset.pkl"))
    val_set = ImageDataset.load(os.path.join(args.data, "val", "valset.pkl"))
    test_set = ImageDataset.load(os.path.join(args.data, "test", "testset.pkl"))

    config = {
        "tokenizer_path": DEFAULT_VOCAB_PATH,
        "patch_size": 16,
        "glu": True,
        "bos_token": 998,
        "eos_token": 997,
        "trg_pad_idx": 999,
        "batch_size": args.batch_size,
        "n_epochs": args.epochs,
        "optimizer": "Adam",
        "optimizer_args": {
            "lr": args.lr,
            "weight_decay": args.wd,
            **({"grad_clip": args.grad_clip} if args.grad_clip else {}),
            **(
                {"lr_schedule": {"warmup_steps": args.warmup_steps,
                                 "decay_steps": args.decay_steps}}
                if args.decay_steps
                else {}
            ),
        },
        "seed": 42,
        "save_checkpoint": True,
        "save_dir": args.save_dir,
        "save_freq": args.save_freq or max(args.epochs // 2, 1),
        "val_freq": args.val_freq or max(args.epochs // 2, 1),
        "drop_last": True,
        "keep_small": args.keep_small,
        "batch_shuffle": True,
        "id_shuffle": True,
        "dtype": "bfloat16",
        "use_flash_attention": "auto",
        "mesh": {"data": -1},
        "mask_pad_loss": True,
        # Bounded compiled seq lens: labels pad to multiples of this.
        "seq_pad_multiple": args.seq_pad,
        "loss_fn": "CrossEntropyLoss",
        "resume": args.resume,
        "init_from": args.init_from,
        "remat": args.remat,
        "device_data_val": not args.host_val,
        "device_data": args.device_data,
        "device_data_steps_per_call": args.steps_per_call,
        "device_data_augment": args.augment,
        "device_data_max_canvas": (
            tuple(args.max_canvas) if args.max_canvas else None
        ),
        "device_data_bucket_cap": args.bucket_cap,
        "device_data_pack_bits": args.pack_bits,
        "encoder": {"n_channels": 1, "embed_dim": 256, "num_layers": 4,
                    "heads": 8},
        "decoder": {"embed_dim": 256, "num_layers": 4, "heads": 8,
                    "cross_attend": True, "dropout": 0.1, "exp_factor": 4},
    }

    model, state, history = train_model(train_set, val_set, config)

    # Greedy-decode evaluation on the test split. The eval model's positional
    # table must be exactly the TRAINED table: a bigger claimed max_length
    # would read NaN-filled embeddings past the real rows (jnp.take fill) and
    # silently corrupt the metrics. Clamp the decode budget to the table.
    from texocr_tpu.evaluation.evaluate import clamp_to_pos_table

    eval_config = dict(config)
    eval_config["vocab_size"] = test_set.tokenizer.vocab_size
    eval_max_len = clamp_to_pos_table(
        state.params, eval_config, args.eval_max_len
    )
    if args.eval_batch_size:
        eval_config["batch_size"] = args.eval_batch_size
    eval_model = OCRModel(ModelConfig.from_dict(eval_config))
    metrics = test_model(
        test_set,
        eval_model,
        {"params": state.params},
        eval_config,
        max_len=eval_max_len,
        verbose=True,
        max_batches=args.eval_batches,
    )
    final = {"history": history, **metrics}
    print(json.dumps(final))
    if args.metrics_out:
        record = {
            "args": vars(args),
            "final_train_loss": history[-1] if history else None,
            **metrics,
        }
        os.makedirs(os.path.dirname(args.metrics_out) or ".", exist_ok=True)
        with open(args.metrics_out, "w") as f:
            json.dump(record, f, indent=1)
        print(f"metrics written to {args.metrics_out}")


if __name__ == "__main__":
    main()
