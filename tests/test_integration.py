"""End-to-end integration: synthetic dataset -> short training -> loss falls,
checkpoints write/restore, eval harness runs, serving wrapper round-trips."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from texocr_tpu.data import ImageDataset
from texocr_tpu.tokenizer import DEFAULT_VOCAB_PATH, load_default_tokenizer

from tests.tiny import TINY_CONFIG, synthetic_dataset_dir


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tok = load_default_tokenizer()
    root = synthetic_dataset_dir(tmp_path_factory.mktemp("data"), tok, per_size=4)
    return ImageDataset(str(root), DEFAULT_VOCAB_PATH, dataset_size=100)


def _train_config(tmp_path):
    cfg = dict(TINY_CONFIG)
    # Real tokenizer ids (vocab 1000, PAD/BOS/EOS 999/998/997).
    cfg.update(
        img_size=(32, 128),  # must cover the dataset's largest bucket
        vocab_size=1000,
        trg_pad_idx=999,
        bos_token=998,
        eos_token=997,
        batch_size=4,
        n_epochs=2,
        optimizer="Adam",
        optimizer_args={"lr": 1e-3, "weight_decay": 0.0},
        save_checkpoint=True,
        save_dir=str(tmp_path / "ckpts"),
        save_freq=2,
        val_freq=2,
        drop_last=True,
        keep_small=False,
        batch_shuffle=True,
        id_shuffle=True,
        seed=42,
        mesh={"data": 2, "model": 1},
        seq_pad_multiple=8,
        mask_pad_loss=True,
    )
    del cfg["max_length"]
    return cfg


def test_train_loop_end_to_end(dataset, tmp_path):
    from texocr_tpu.training.loop import train_model

    config = _train_config(tmp_path)
    model, state, history = train_model(dataset, dataset, config, verbose=False)
    assert len(history) == 2
    assert np.isfinite(history).all()
    assert history[-1] < history[0]  # memorizes the tiny set a bit

    # Checkpoint written at epoch 2 (save_freq=2).
    from texocr_tpu.checkpoint.orbax_io import latest_checkpoint, load_checkpoint

    path = latest_checkpoint(config["save_dir"])
    assert path is not None
    restored = load_checkpoint(path)
    assert restored["epoch"] == 1
    # Restored params numerically equal the live ones.
    live = jax.tree.leaves(state.params)
    back = jax.tree.leaves(restored["params"])
    assert len(live) == len(back)
    for a, b in zip(live, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Fast params-only restore: first call restores via orbax and writes the
    # msgpack side-cache; second call must read the cache and agree.
    import os

    from texocr_tpu.checkpoint.orbax_io import load_params_fast

    first = load_params_fast(path)
    cache = os.path.join(path, "params_cache.msgpack")
    assert os.path.exists(cache)
    second = load_params_fast(path)
    for a, b in zip(jax.tree.leaves(first), jax.tree.leaves(second)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(live, jax.tree.leaves(second)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eval_harness_runs(dataset, tmp_path):
    from texocr_tpu.config import ModelConfig
    from texocr_tpu.evaluation.evaluate import test_model
    from texocr_tpu.models import OCRModel

    config = _train_config(tmp_path)
    config["max_length"] = dataset.max_seq_len
    model = OCRModel(ModelConfig.from_dict(config))
    img = jnp.zeros((1, 32, 64, 1), jnp.float32)
    lbl = jnp.full((1, 8), 999, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), img, lbl)
    pairs_path = str(tmp_path / "pairs.jsonl")
    out = test_model(
        dataset, model, params, config, max_len=8, verbose=False,
        max_batches=1, pairs_out=pairs_path,
    )
    assert 0.0 <= out["token_acc"] <= 1.0
    assert out["batches"] == 1

    # pairs_out dump feeds the confusion tool: one line per row, pad-free.
    import json

    with open(pairs_path) as f:
        rows = [json.loads(line) for line in f]
    assert rows and all(set(r) == {"pred", "gold"} for r in rows)
    pad = config["trg_pad_idx"]
    assert all(pad not in r["pred"] and pad not in r["gold"] for r in rows)

    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from confusion_report import align_ops

    ops = align_ops(rows[0]["pred"], rows[0]["gold"])
    # edit count from the alignment bounds the row's error (sanity link)
    assert len(ops) >= abs(len(rows[0]["pred"]) - len(rows[0]["gold"]))


def test_serving_wrapper_round_trip(tmp_path):
    from PIL import Image

    from texocr_tpu.serving import TexOCR

    cfg = _train_config(tmp_path)
    cfg["tokenizer_path"] = DEFAULT_VOCAB_PATH
    cfg["max_length"] = 64
    engine = TexOCR(cfg)
    img = Image.fromarray(np.full((30, 100), 255, np.uint8))
    tokens, latex = engine(img, max_len=6)
    assert isinstance(tokens, list) and isinstance(latex, str)
    # Bucket canvas reuse: second call with a same-bucket image hits the
    # compiled function cache.
    img2 = Image.fromarray(np.full((28, 90), 255, np.uint8))
    engine(img2, max_len=6)
    assert len(engine._compiled) == 1


def test_serving_wrapper_beam_mode(tmp_path):
    """mode='beam' is first-class through the wrapper (BASELINE config #4
    decode mode) and compiles separately per beam width."""
    from PIL import Image

    from texocr_tpu.serving import TexOCR

    cfg = _train_config(tmp_path)
    cfg["tokenizer_path"] = DEFAULT_VOCAB_PATH
    cfg["max_length"] = 64
    engine = TexOCR(cfg)
    img = Image.fromarray(np.full((30, 100), 255, np.uint8))
    tokens, latex = engine(img, max_len=6, mode="beam", beam_size=3)
    assert isinstance(tokens, list) and isinstance(latex, str)


def test_eval_harness_beam_mode(dataset, tmp_path):
    from texocr_tpu.config import ModelConfig
    from texocr_tpu.evaluation.evaluate import test_model
    from texocr_tpu.models import OCRModel

    config = _train_config(tmp_path)
    config["max_length"] = dataset.max_seq_len
    model = OCRModel(ModelConfig.from_dict(config))
    img = jnp.zeros((1, 32, 64, 1), jnp.float32)
    lbl = jnp.full((1, 8), 999, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), img, lbl)
    out = test_model(
        dataset, model, params, config, max_len=8, verbose=False,
        max_batches=1, decode_mode="beam", beam_size=3,
    )
    assert 0.0 <= out["token_acc"] <= 1.0


def test_serving_batcher(tmp_path):
    from PIL import Image

    from texocr_tpu.serving import TexOCR
    from texocr_tpu.serving.batcher import ServingBatcher

    cfg = _train_config(tmp_path)
    cfg["tokenizer_path"] = DEFAULT_VOCAB_PATH
    cfg["max_length"] = 64
    engine = TexOCR(cfg)
    batcher = ServingBatcher(engine, max_batch=4, max_len=6)
    imgs = [
        Image.fromarray(np.full((30, 100), 255, np.uint8)) for _ in range(6)
    ]
    futures = [batcher.submit(im) for im in imgs]
    results = [f.result(timeout=300) for f in futures]
    batcher.shutdown()
    assert all(isinstance(r[1], str) for r in results)


def test_patch_embedding_encoder_variant():
    from texocr_tpu.config import ModelConfig
    from texocr_tpu.models import OCRModel

    cfg = dict(TINY_CONFIG)
    cfg["encoder"] = dict(cfg["encoder"], embed_layer="patch")
    model = OCRModel(ModelConfig.from_dict(cfg))
    img = jnp.zeros((2, 32, 64, 1), jnp.float32)
    lbl = jnp.full((2, 8), 49, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), img, lbl)
    enc = model.apply(params, img, method=OCRModel.encode)
    assert enc.shape == (2, 2 * 4 + 1, 32)  # (B, h*w + CLS, D)
    assert "patch_embed" in params["params"]["encoder"]
    assert "backbone" not in params["params"]["encoder"]


def test_warm_start_params_shape_adaptation():
    """warm_start_params: equal shapes copied, one-axis mismatch spliced
    (the decoder positional table across dataset max_length changes), other
    mismatches keep the target init."""
    from texocr_tpu.checkpoint.orbax_io import warm_start_params

    restored = {
        "same": np.full((3, 4), 7.0, np.float32),
        "pos": np.arange(12, dtype=np.float32).reshape(6, 2),   # 6 rows
        "other": np.ones((2, 2), np.float32),
    }
    target = {
        "same": jnp.zeros((3, 4), jnp.bfloat16),
        "pos": jnp.full((9, 2), -1.0, jnp.float32),             # grown to 9
        "other": jnp.zeros((3, 3, 3), jnp.float32),             # ndim mismatch
    }
    out = warm_start_params(restored, target)
    assert out["same"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(out["same"], np.float32), 7.0)
    np.testing.assert_array_equal(
        np.asarray(out["pos"][:6]), restored["pos"]
    )
    np.testing.assert_array_equal(np.asarray(out["pos"][6:]), -1.0)
    np.testing.assert_array_equal(np.asarray(out["other"]), 0.0)
    # Shrink direction: restored longer than target.
    out2 = warm_start_params(
        {"pos": np.arange(20, dtype=np.float32).reshape(10, 2)},
        {"pos": jnp.zeros((4, 2), jnp.float32)},
    )
    np.testing.assert_array_equal(
        np.asarray(out2["pos"]), np.arange(8, dtype=np.float32).reshape(4, 2)
    )


@pytest.mark.slow
def test_train_loop_warm_start(dataset, tmp_path):
    """init_from warm-starts a new run's params from a prior checkpoint."""
    from texocr_tpu.checkpoint.orbax_io import latest_checkpoint, load_checkpoint
    from texocr_tpu.training.loop import train_model

    config = _train_config(tmp_path)
    train_model(dataset, None, config, verbose=False)
    ckpt = latest_checkpoint(config["save_dir"])

    config2 = _train_config(tmp_path)
    config2["save_dir"] = str(tmp_path / "ckpts2")
    config2["init_from"] = ckpt
    config2["n_epochs"] = 1
    model2, state2, hist2 = train_model(dataset, None, config2, verbose=False)
    # Stage-2 epoch-1 loss starts well below a cold run's first epoch
    # (params carried over), and training still progresses.
    config3 = _train_config(tmp_path)
    config3["save_dir"] = str(tmp_path / "ckpts3")
    config3["n_epochs"] = 1
    _, _, hist3 = train_model(dataset, None, config3, verbose=False)
    assert hist2[0] < hist3[0]
