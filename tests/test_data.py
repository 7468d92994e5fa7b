"""Input pipeline: dataset, bucketing, collation, transforms."""

import numpy as np
import pytest

from texocr_tpu.data import (
    BatchCollator,
    BucketBatchSampler,
    ImageDataset,
    create_dataloader,
)
from texocr_tpu.data.transforms import preprocess_jax, to_model_array
from texocr_tpu.tokenizer import DEFAULT_VOCAB_PATH, load_default_tokenizer

from tests.tiny import synthetic_dataset_dir


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tok = load_default_tokenizer()
    root = synthetic_dataset_dir(tmp_path_factory.mktemp("data"), tok)
    return ImageDataset(str(root), DEFAULT_VOCAB_PATH, dataset_size=100)


def test_dataset_basics(dataset):
    assert len(dataset) == 12
    assert set(dataset.sizes) == {(64, 32), (128, 32)}
    img, ids = dataset[0]
    assert img.shape == (32, 64, 1)
    assert img.dtype == np.float32
    # inverted: mostly background 0, some ink 1
    assert img.mean() < 0.5 and img.max() == 1.0
    assert ids == dataset.tokenizer.encode(dataset.labels[0])


def test_max_seq_len_includes_bos_eos(dataset):
    raw_max = max(len(t) for t in dataset.token_ids)
    assert dataset.max_seq_len == raw_max + 2


def test_bucket_sampler_groups_by_size(dataset):
    sampler = BucketBatchSampler(dataset.sizes, batch_size=4, drop_last=True)
    for batch in sampler:
        shapes = {dataset.images[i].shape for i in batch}
        assert len(shapes) == 1
        assert len(batch) == 4
    # 6 per size, batch 4, drop_last -> 1 batch per size group
    assert len(list(sampler)) == 2
    keep = BucketBatchSampler(dataset.sizes, batch_size=4, keep_small=True)
    assert len(list(keep)) == 4


def test_collator_layout(dataset):
    pad, bos, eos = 999, 998, 997
    coll = BatchCollator(pad, bos, eos)
    batch = [dataset[i] for i in [0, 1, 2]]
    images, labels = coll(batch)
    assert images.shape[0] == 3 and labels.dtype == np.int32
    longest = max(len(ids) for _, ids in batch)
    assert labels.shape[1] == longest + 2
    for row, (_, ids) in zip(labels, batch):
        assert row[0] == bos
        assert list(row[1 : len(ids) + 1]) == ids
        assert row[len(ids) + 1] == eos
        assert (row[len(ids) + 2 :] == pad).all()


def test_collator_seq_pad_multiple(dataset):
    coll = BatchCollator(999, 998, 997, seq_pad_multiple=32)
    _, labels = coll([dataset[i] for i in range(3)])
    assert labels.shape[1] % 32 == 0


def test_dataloader_end_to_end(dataset):
    config = {"batch_size": 4, "drop_last": True, "batch_shuffle": True,
              "id_shuffle": True, "keep_small": False, "seed": 42}
    loader = create_dataloader(dataset, config)
    batches = list(loader)
    assert len(batches) == len(loader) == 2
    for images, labels in batches:
        assert images.shape[0] == 4 and labels.shape[0] == 4


def test_save_load_round_trip(dataset, tmp_path):
    p = tmp_path / "ds.pkl"
    dataset.save(str(p))
    again = ImageDataset.load(str(p))
    assert len(again) == len(dataset)
    assert again.max_seq_len == dataset.max_seq_len
    np.testing.assert_array_equal(again.images[3], dataset.images[3])
    assert again.token_ids == dataset.token_ids


def test_lazy_dataset_matches_eager(dataset, tmp_path):
    """lazy=True (the 100k-scale memory plan: paths + sizes in RAM, pixels
    decoded on demand) is item-for-item identical to the eager dataset and
    survives save/load with a small pickle (no embedded arrays)."""
    lazy = ImageDataset(
        str(dataset.root_dir), DEFAULT_VOCAB_PATH, dataset_size=100, lazy=True
    )
    assert len(lazy) == len(dataset)
    assert lazy.sizes == dataset.sizes
    assert lazy.max_height == dataset.max_height
    assert lazy.max_width == dataset.max_width
    assert all(a is None for a in lazy.images)  # nothing decoded eagerly
    for i in (0, 5, 11):
        img_l, ids_l = lazy[i]
        img_e, ids_e = dataset[i]
        np.testing.assert_array_equal(img_l, img_e)
        assert ids_l == ids_e

    p_lazy, p_eager = tmp_path / "lazy.pkl", tmp_path / "eager.pkl"
    lazy.save(str(p_lazy))
    dataset.save(str(p_eager))
    assert p_lazy.stat().st_size < p_eager.stat().st_size / 5
    again = ImageDataset.load(str(p_lazy))
    img_a, ids_a = again[7]
    img_e, ids_e = dataset[7]
    np.testing.assert_array_equal(img_a, img_e)
    assert ids_a == ids_e


def test_preprocess_jax_matches_host():
    import jax.numpy as jnp
    from PIL import Image

    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, size=(30, 100), dtype=np.uint8)
    host = to_model_array(Image.fromarray(arr))
    dev = preprocess_jax(jnp.asarray(arr[None]), patch_size=16, width_multiple=64)
    assert dev.shape == (1, 32, 128, 1)  # padded to (16k, 64k)
    # center crop of the padded output equals the host transform
    crop = np.asarray(dev)[0, 1:31, 14:114, :]
    np.testing.assert_allclose(crop, host, atol=1e-6)
    # padding is background (0 = white after inversion)
    assert np.asarray(dev)[0, 0].max() == 0.0
