"""Dataset, shape-bucket batching and collation.

Same capability surface as the reference (reference data_wrangling/dataset.py)
with a TPU-first twist: batches are formed ONLY within identical (w, h) image
size groups (the render rule bounds the set of sizes: h mult of 16, w mult of
64 — reference render_data.py:81-92), and label padding can be rounded up to a
``seq_pad_multiple`` so the set of compiled (image-shape, seq-len) pairs stays
small and the XLA compile cache bounded.

Differences from the reference, on purpose:
- Images are stored as uint8 numpy arrays (not live PIL objects) and labels
  are tokenized ONCE at construction, not per epoch per item (the reference
  re-encodes every __getitem__; dataset.py:255-256).
- Augmentation defaults to train-only (the reference augments val/test too;
  dataset.py:253).
- ``save``/``load`` pickle a plain dict payload, so loading never depends on
  this module's import path (the reference pickles the live object).
"""

from __future__ import annotations

import os
import pickle
import random
from collections import defaultdict
from pathlib import Path
from typing import Dict, Iterable, Iterator, List, Optional, Tuple

import numpy as np

from texocr_tpu.data.transforms import img_transform
from texocr_tpu.tokenizer import RegexBPETokenizer
from texocr_tpu.utils import pad_to_multiple

PAD_CHAR, BOS_CHAR, EOS_CHAR = "<PAD>", "<BOS>", "<EOS>"


class ImageDataset:
    """In-memory dataset of rendered-equation images + tokenized labels."""

    def __init__(
        self,
        root_dir: Optional[str] = None,
        tokenizer_path: Optional[str] = None,
        dataset_size: Optional[int] = None,
        augment: bool = False,
        lazy: bool = False,
    ):
        """``lazy=True`` keeps only file paths + sizes in memory and decodes
        PNGs on demand in ``__getitem__`` — the memory plan for the full
        100k x (160, 1008) reference scale, where eager uint8 arrays cost
        ~16 GB of RAM and multi-GB pickles (the reference eagerly loads LIVE
        PIL objects, reference dataset.py:216-236; eager here stays the
        default for parity and small-set speed). Lazy datasets pickle their
        paths, so .save() payloads stay small; the prefetch thread in the
        train loop hides the per-batch decode latency."""
        self.augment = augment
        self.lazy = lazy
        if not (root_dir and tokenizer_path and dataset_size):
            return  # bare instance for .load()

        self.tokenizer_path = tokenizer_path
        self.tokenizer = RegexBPETokenizer()
        self.tokenizer.load(tokenizer_path)

        root = Path(root_dir)
        self.root_dir = root
        # Prefer pruned files when render-time failures were dropped
        # (reference dataset.py:138-143).
        if (root / "labels_pruned.txt").exists():
            label_path, id_path = root / "labels_pruned.txt", root / "ids_pruned.txt"
        else:
            label_path, id_path = root / "labels.txt", root / "ids.txt"

        self.labels = label_path.read_text().splitlines()[:dataset_size]
        self.image_ids = id_path.read_text().splitlines()[:dataset_size]
        self.dataset_size = len(self.labels)

        from PIL import Image

        self.images: List[Optional[np.ndarray]] = []
        self.sizes: Dict[Tuple[int, int], List[int]] = defaultdict(list)
        heights, widths = [], []
        for i, image_id in enumerate(self.image_ids):
            with Image.open(root / "images" / image_id) as im:
                if lazy:
                    w, h = im.size  # header only; pixels are not decoded
                    self.images.append(None)
                else:
                    arr = np.asarray(im.convert("L"), dtype=np.uint8)
                    h, w = arr.shape
                    self.images.append(arr)
            heights.append(h)
            widths.append(w)
            self.sizes[(w, h)].append(i)

        # Tokenize every label ONCE, through the native batched encoder
        # (+2 for BOS/EOS; reference dataset.py:185-188 — which re-encodes
        # per item per epoch instead).
        self.token_ids = self.tokenizer.encode_batch(self.labels)
        self.max_seq_len = max((len(t) for t in self.token_ids), default=0) + 2
        self.max_height = max(heights, default=0)
        self.max_width = max(widths, default=0)

    # -- sample access -------------------------------------------------------

    def __len__(self) -> int:
        return self.dataset_size

    def _load_array(self, idx: int) -> np.ndarray:
        if self.images[idx] is not None:
            return self.images[idx]
        from PIL import Image

        with Image.open(Path(self.root_dir) / "images" / self.image_ids[idx]) as im:
            return np.asarray(im.convert("L"), dtype=np.uint8)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, List[int]]:
        """(float32 (H, W, 1) preprocessed image, token id list)."""
        arr = self._load_array(idx)
        if self.augment:
            from PIL import Image

            pil = Image.fromarray(arr)
            img = img_transform(pil, rng=self._rng(), augment=True)
        else:
            img = (1.0 - arr.astype(np.float32) / 255.0)[..., None]
        return img, self.token_ids[idx]

    _aug_rng: Optional[np.random.Generator] = None

    def _rng(self) -> np.random.Generator:
        if self._aug_rng is None:
            self._aug_rng = np.random.default_rng()
        return self._aug_rng

    # -- persistence ----------------------------------------------------------

    def save(self, path: str) -> None:
        payload = {
            "tokenizer_path": self.tokenizer_path,
            "labels": self.labels,
            "image_ids": self.image_ids,
            # Lazy datasets pickle paths + sizes, not pixels (memory plan for
            # the 100k x (160,1008) scale); eager ones embed the uint8 arrays.
            "images": None if self.lazy else self.images,
            "lazy": self.lazy,
            "root_dir": str(self.root_dir) if self.lazy else None,
            "sizes": dict(self.sizes) if self.lazy else None,
            "token_ids": self.token_ids,
            "max_seq_len": self.max_seq_len,
            "max_height": self.max_height,
            "max_width": self.max_width,
            "augment": self.augment,
        }
        with open(path, "wb") as f:
            pickle.dump(payload, f)

    @classmethod
    def load(cls, path: str) -> "ImageDataset":
        with open(path, "rb") as f:
            payload = pickle.load(f)
        ds = cls()
        ds.tokenizer_path = payload["tokenizer_path"]
        ds.tokenizer = RegexBPETokenizer()
        ds.tokenizer.load(ds.tokenizer_path)
        ds.labels = payload["labels"]
        ds.image_ids = payload["image_ids"]
        ds.lazy = payload.get("lazy", False)
        ds.token_ids = payload["token_ids"]
        ds.max_seq_len = payload["max_seq_len"]
        ds.max_height = payload["max_height"]
        ds.max_width = payload["max_width"]
        ds.augment = payload["augment"]
        ds.dataset_size = len(ds.labels)
        if ds.lazy:
            ds.root_dir = Path(payload["root_dir"])
            ds.images = [None] * ds.dataset_size
            ds.sizes = defaultdict(list, payload["sizes"])
        else:
            ds.images = payload["images"]
            ds.sizes = defaultdict(list)
            for i, arr in enumerate(ds.images):
                h, w = arr.shape
                ds.sizes[(w, h)].append(i)
        return ds

    def __repr__(self) -> str:
        return f"ImageDataset with {len(self)} samples."


class BucketBatchSampler:
    """Batches indices only within identical (w, h) size groups; drops
    remainders unless ``keep_small``; shuffles batch order with an
    incrementing seed per epoch (reference dataset.py:281-326)."""

    def __init__(
        self,
        sizes: Dict[Tuple[int, int], List[int]],
        batch_size: int,
        drop_last: bool = True,
        shuffle: bool = False,
        keep_small: bool = False,
        seed: int = 42,
    ):
        self.sizes = sizes
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.keep_small = keep_small
        self.shuffle = shuffle
        self.seed = seed

    def __iter__(self) -> Iterator[List[int]]:
        batches = []
        for _, ids in self.sizes.items():
            for i in range(0, len(ids), self.batch_size):
                batch = ids[i : i + self.batch_size]
                if len(batch) == self.batch_size or self.keep_small:
                    batches.append(batch)
        if self.shuffle:
            random.seed(self.seed)
            random.shuffle(batches)
            self.seed += 1
        yield from batches

    def __len__(self) -> int:
        full = sum(len(ids) // self.batch_size for ids in self.sizes.values())
        if self.keep_small:
            full += sum(
                1 for ids in self.sizes.values() if len(ids) % self.batch_size
            )
        return full


class BatchCollator:
    """Stack images; pad labels to batch-max + 2 with PAD, writing BOS at 0
    and EOS after the sequence (reference dataset.py:21-62). ``seq_pad_multiple``
    rounds the padded length up so XLA sees a bounded set of sequence lengths
    (1 = reference-exact batch-max padding)."""

    def __init__(
        self,
        pad_token: int,
        bos_token: int,
        eos_token: int,
        shuffle: bool = False,
        seed: int = 42,
        seq_pad_multiple: int = 1,
        pad_batch_to: Optional[int] = None,
    ):
        self.pad_token = pad_token
        self.bos_token = bos_token
        self.eos_token = eos_token
        self.shuffle = shuffle
        self.seed = seed
        self.seq_pad_multiple = seq_pad_multiple
        self.pad_batch_to = pad_batch_to

    def __call__(
        self, batch: List[Tuple[np.ndarray, List[int]]]
    ) -> Tuple[np.ndarray, np.ndarray]:
        if self.shuffle:
            random.seed(self.seed)
            indices = list(range(len(batch)))
            random.shuffle(indices)
            self.seed += 1
            batch = [batch[i] for i in indices]

        images = np.stack([im for im, _ in batch]).astype(np.float32)
        seqs = [ids for _, ids in batch]
        max_len = max(len(s) for s in seqs) + 2
        max_len = pad_to_multiple(max_len, self.seq_pad_multiple)
        labels = np.full((len(seqs), max_len), self.pad_token, dtype=np.int32)
        for i, s in enumerate(seqs):
            labels[i, 0] = self.bos_token
            labels[i, 1 : len(s) + 1] = s
            labels[i, len(s) + 1] = self.eos_token

        if self.pad_batch_to and len(seqs) < self.pad_batch_to:
            # Fixed batch dim for keep_small tails: repeat-pad rows; callers
            # get the true count via the returned weight row mask.
            reps = self.pad_batch_to - len(seqs)
            images = np.concatenate([images, np.zeros_like(images[:reps])])
            pad_rows = np.full((reps, max_len), self.pad_token, np.int32)
            labels = np.concatenate([labels, pad_rows])
        return images, labels


def create_dataloader(
    dataset: ImageDataset, config: dict, seed_offset: int = 0
) -> Iterable[Tuple[np.ndarray, np.ndarray]]:
    """Reference-format config dict -> re-iterable of (images, labels) numpy
    batches (reference dataset.py:339-362). Build ONCE and iterate once per
    epoch: the sampler/collator seeds increment across iterations, so batch
    composition varies per epoch (the reference persists one DataLoader the
    same way). ``seed_offset`` advances the seed schedule, e.g. when resuming
    at a later epoch."""
    pad, bos, eos = (
        dataset.tokenizer.special_tokens[PAD_CHAR],
        dataset.tokenizer.special_tokens[BOS_CHAR],
        dataset.tokenizer.special_tokens[EOS_CHAR],
    )
    collate = BatchCollator(
        pad,
        bos,
        eos,
        shuffle=config.get("id_shuffle", False),
        seed=config.get("seed", 42) + seed_offset,
        seq_pad_multiple=config.get("seq_pad_multiple", 1),
    )
    sampler = BucketBatchSampler(
        dataset.sizes,
        batch_size=config["batch_size"],
        drop_last=config.get("drop_last", True),
        shuffle=config.get("batch_shuffle", False),
        keep_small=config.get("keep_small", False),
        seed=config.get("seed", 42) + seed_offset,
    )

    class _Loader:
        def __init__(self):
            self.sampler = sampler
            self.collate = collate

        def __iter__(self):
            for batch_ids in self.sampler:
                yield self.collate([dataset[i] for i in batch_ids])

        def __len__(self):
            return len(self.sampler)

    return _Loader()


def load_datasets(data_dir: str):
    """(train, val, test) from the standard pickle layout (reference
    dataset.py:329-336)."""
    return (
        ImageDataset.load(os.path.join(data_dir, "train", "trainset.pkl")),
        ImageDataset.load(os.path.join(data_dir, "val", "valset.pkl")),
        ImageDataset.load(os.path.join(data_dir, "test", "testset.pkl")),
    )


def prefetch(iterable: Iterable, size: int = 2) -> Iterator:
    """Background-thread prefetch so host-side collation overlaps the async
    device step (the reference runs augmentation+tokenization synchronously on
    the training thread; SURVEY.md §3.1)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()

    def worker():
        try:
            for item in iterable:
                q.put(item)
        finally:
            q.put(sentinel)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        yield item
