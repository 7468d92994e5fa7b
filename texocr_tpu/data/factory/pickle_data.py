"""Build and pickle one dataset split (reference data_wrangling/pickle_data.py).

CLI: ``python -m texocr_tpu.data.factory.pickle_data -c config/data_config.yml
--split train -s data/train/trainset.pkl``
"""

from __future__ import annotations

import argparse
import time

from texocr_tpu.config import load_config
from texocr_tpu.data.dataset import ImageDataset


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description="Dataset build utilities.")
    p.add_argument("-c", "--config", type=str, default="config/data_config.yml")
    p.add_argument("--split", type=str, default="train",
                   choices=["train", "val", "test"])
    p.add_argument("-s", "--save", type=str, default="dataset.pkl")
    return p.parse_args()


def main(args: argparse.Namespace) -> None:
    start = time.time()
    config = load_config(args.config)
    root_dir = config[f"{args.split}_dir"]
    dataset = ImageDataset(
        root_dir=root_dir,
        tokenizer_path=config["tokenizer_path"],
        dataset_size=config["num_equations"],
    )
    dataset.save(args.save)
    print(
        f"Pickled {len(dataset)}-item {args.split} dataset to {args.save} "
        f"in {time.time() - start:.2f}s."
    )


if __name__ == "__main__":
    main(parse_args())
