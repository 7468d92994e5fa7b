"""Training CLI (reference train.py surface):
``python -m texocr_tpu.training.cli -d data --config config/config.yml``."""

from __future__ import annotations

import argparse

from texocr_tpu.utils import enable_compile_cache

# Honors JAX_PLATFORMS (some PJRT plugins force-override it) and reuses
# compiled executables across runs; must run before anything jits.
enable_compile_cache()

from texocr_tpu.config import load_config  # noqa: E402
from texocr_tpu.data.dataset import load_datasets  # noqa: E402
from texocr_tpu.training.loop import train_model  # noqa: E402


def parse_args() -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="Train the TexOCR model.")
    parser.add_argument(
        "-d", "--data_dir", type=str, default="data",
        help="Directory containing dataset pickle files.",
    )
    parser.add_argument(
        "--config", type=str, default="config/config.yml",
        help="Path to the configuration file.",
    )
    parser.add_argument(
        "--resume", action="store_true",
        help="Resume from the latest checkpoint in save_dir.",
    )
    parser.add_argument(
        "--metrics", type=str, default=None,
        help="Write JSON-lines training metrics to this file.",
    )
    parser.add_argument(
        "--multihost", action="store_true",
        help="Initialize jax.distributed before building the mesh (one "
             "process per host; auto-detects the coordinator on TPU pods).",
    )
    parser.add_argument("--coordinator", type=str, default=None,
                        help="host:port of process 0 (explicit multi-host).")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    return parser.parse_args()


def main(args: argparse.Namespace) -> None:
    from texocr_tpu.parallel.distributed import maybe_initialize_distributed

    if maybe_initialize_distributed(
        multihost=args.multihost,
        coordinator=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    ):
        import jax

        print(
            f"multi-host: process {jax.process_index()}/{jax.process_count()},"
            f" {jax.device_count()} global devices"
        )

    config = load_config(args.config)
    if args.resume:
        config["resume"] = True
    print("Loading datasets...")
    train_set, val_set, _ = load_datasets(args.data_dir)
    train_set.augment = True  # augmentation on the train split only
    print("Datasets loaded!")
    train_model(train_set, val_set, config, metrics_path=args.metrics)


if __name__ == "__main__":
    main(parse_args())
