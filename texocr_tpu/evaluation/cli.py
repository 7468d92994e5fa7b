"""Evaluation CLI (the reference test.py's job, working):
``python -m texocr_tpu.evaluation.cli -d data --config config/config.yml
[--checkpoint path] [--max_len 276]``."""

from __future__ import annotations

import argparse

import jax

from texocr_tpu.utils import enable_compile_cache

# Persistent compile cache: full-canvas decode executables take minutes to
# build through the single-chip tunnel; reruns (and resumed evals) reuse them.
enable_compile_cache()

from texocr_tpu.config import ModelConfig, load_config
from texocr_tpu.data.dataset import ImageDataset
from texocr_tpu.evaluation.evaluate import test_model
from texocr_tpu.models import OCRModel


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate the TexOCR model.")
    p.add_argument("-d", "--data_dir", type=str, default="data")
    p.add_argument("--config", type=str, default="config/config.yml")
    p.add_argument("--checkpoint", type=str, default=None,
                   help=".pth (reference) or orbax checkpoint dir")
    p.add_argument("--max_len", type=int, default=276)
    p.add_argument("--max_batches", type=int, default=None)
    p.add_argument("--decode", type=str, default="greedy",
                   choices=("greedy", "beam"),
                   help="decode mode (beam = BASELINE config #4)")
    p.add_argument("--beam_size", type=int, default=5)
    p.add_argument("--skip_batches", type=int, default=0,
                   help="skip the first N batches (resume a long eval; the "
                        "loader order is deterministic for a fixed seed)")
    p.add_argument("--pairs_out", type=str, default=None,
                   help="append one JSON line per row with pad-stripped "
                        "pred/gold token ids (tools/confusion_report.py)")
    p.add_argument("--metrics_out", type=str, default=None,
                   help="append per-batch metrics to this JSONL file")
    p.add_argument("--kv_quant", type=str, default=None,
                   choices=("none", "int8"),
                   help="override the config's cross-attention KV-cache "
                        "quantization (measure the accuracy cost of the "
                        "bench default on a trained checkpoint)")
    p.add_argument("--self_kv_quant", type=str, default=None,
                   choices=("none", "int8"),
                   help="override the config's decode self-attention "
                        "merged-prefix quantization")
    return p.parse_args()


def main(args):
    from texocr_tpu.utils import pad_to_multiple

    config = load_config(args.config)
    if args.kv_quant is not None:
        config["kv_quant"] = args.kv_quant
    if args.self_kv_quant is not None:
        config["self_kv_quant"] = args.self_kv_quant
    test_set = ImageDataset.load(f"{args.data_dir}/test/testset.pkl")
    # Positional table must cover both the collator's rounded label lengths
    # and the decode budget.
    config["max_length"] = max(
        pad_to_multiple(test_set.max_seq_len, config.get("seq_pad_multiple", 1)),
        args.max_len + 1,
    )
    config["vocab_size"] = test_set.tokenizer.vocab_size

    if args.checkpoint and args.checkpoint.endswith((".pth", ".pt")):
        from texocr_tpu.checkpoint import load_torch_checkpoint

        # Pass the architecture through from the config (same kwargs as
        # serving/wrapper.py) so non-default layer counts/depths convert.
        params = {
            "params": load_torch_checkpoint(
                args.checkpoint,
                num_encoder_layers=config["encoder"]["num_layers"],
                num_decoder_layers=config["decoder"]["num_layers"],
                resnet_depths=tuple(
                    config["encoder"].get("resnet_depths", (2, 4, 6))
                ),
                glu=config.get("glu", True),
            )
        }
        from texocr_tpu.evaluation.evaluate import clamp_to_pos_table

        args.max_len = clamp_to_pos_table(
            params["params"], config, args.max_len
        )
        model = OCRModel(ModelConfig.from_dict(config))
    elif args.checkpoint:
        from texocr_tpu.checkpoint.orbax_io import load_params_fast

        from texocr_tpu.evaluation.evaluate import clamp_to_pos_table

        restored = load_params_fast(args.checkpoint)
        # Sync max_length to the checkpoint's positional-table size (same as
        # the .pth branch) and clamp the decode budget: a model claiming more
        # positions than the restored table has would read NaN-filled
        # embeddings past the table and decode silently-wrong tokens.
        args.max_len = clamp_to_pos_table(restored, config, args.max_len)
        model = OCRModel(ModelConfig.from_dict(config))
        # device_put once: the cache path returns host numpy arrays, which
        # jit would otherwise re-upload on every batch.
        params = jax.device_put({"params": restored})
    else:
        print("WARNING: no checkpoint given; evaluating a random init.")
        model = OCRModel(ModelConfig.from_dict(config))
        import jax.numpy as jnp

        img = jnp.zeros((1, 32, 64, 1), jnp.float32)
        lbl = jnp.full((1, 8), config["trg_pad_idx"], jnp.int32)
        params = model.init(jax.random.PRNGKey(0), img, lbl)

    test_model(
        test_set, model, params, config,
        max_len=args.max_len, max_batches=args.max_batches,
        decode_mode=args.decode, beam_size=args.beam_size,
        skip_batches=args.skip_batches, metrics_out=args.metrics_out,
        pairs_out=args.pairs_out,
    )


if __name__ == "__main__":
    main(parse_args())
