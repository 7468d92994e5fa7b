"""Training loop: epochs over the bucket-batched loader, jitted sharded step,
checkpoint/val cadence per config (reference train.py:42-99 semantics, fixed:
the reference's first validation call crashes on a signature mismatch,
train.py:95 vs test.py:19)."""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp

from texocr_tpu.config import ModelConfig, TrainConfig, with_defaults
from texocr_tpu.data.dataset import ImageDataset, create_dataloader, prefetch
from texocr_tpu.models import OCRModel
from texocr_tpu.parallel import create_mesh
from texocr_tpu.training.optimizers import get_optimizer
from texocr_tpu.training.train_step import (
    create_train_state,
    make_eval_step,
    make_train_step,
    put_batch,
)


def train_model(
    train_set: ImageDataset,
    val_set: Optional[ImageDataset],
    config: dict,
    verbose: bool = True,
    metrics_path: Optional[str] = None,
):
    """Returns (model, final TrainState). ``config`` is the reference-format
    dict; max_length/vocab_size are injected from the dataset if absent
    (reference train.py:33-34)."""
    config = with_defaults(dict(config))
    if "max_length" not in config:
        # The collator rounds label lengths up to seq_pad_multiple; the
        # positional table must cover the rounded length (past-the-table
        # positions would hit jnp.take's NaN fill).
        from texocr_tpu.utils import pad_to_multiple

        config["max_length"] = pad_to_multiple(
            train_set.max_seq_len, config.get("seq_pad_multiple", 1)
        )
    config.setdefault("vocab_size", train_set.tokenizer.vocab_size)

    from texocr_tpu.training.losses import get_loss_fn

    get_loss_fn(config.get("loss_fn", "CrossEntropyLoss"))  # validate name

    tcfg = TrainConfig.from_dict(config)
    model = OCRModel(ModelConfig.from_dict(config))
    mesh = create_mesh(config.get("mesh"))
    tx = get_optimizer(tcfg.optimizer, tcfg.optimizer_args)

    # Init from a synthetic batch on the SMALLEST canvas at the shortest
    # padded label length: params are shape-independent of the sample, and
    # the loader's first batch is shuffled — at full-canvas configs it can
    # pull the largest bucket and spend minutes compiling an init executable
    # that runs exactly once.
    import numpy as np

    from texocr_tpu.utils import pad_to_multiple as _ptm

    w0, h0 = min(train_set.sizes, key=lambda wh: wh[0] * wh[1])
    seq0 = _ptm(3, config.get("seq_pad_multiple", 1))
    sample_images = np.zeros((tcfg.batch_size, h0, w0, 1), np.float32)
    sample_labels = np.full(
        (tcfg.batch_size, seq0), int(config["trg_pad_idx"]), np.int32
    )
    state = create_train_state(
        model,
        tx,
        jax.random.PRNGKey(tcfg.seed),
        jnp.asarray(sample_images),
        jnp.asarray(sample_labels),
        mesh=mesh,
    )

    # Warm start (curriculum/fine-tune): load only params from a prior run's
    # checkpoint — fresh optimizer state, epoch 0. Shape-adapting, so a stage
    # trained at a shorter dataset max_length transfers onto a longer
    # positional table (overlap copied, tail keeps fresh init).
    if config.get("init_from"):
        from texocr_tpu.checkpoint.orbax_io import (
            latest_checkpoint,
            load_checkpoint,
            warm_start_params,
        )

        path = config["init_from"]
        resolved = latest_checkpoint(path)
        if resolved:  # a save_dir was given; pick its newest checkpoint
            path = resolved
        restored = load_checkpoint(path)
        state = state.replace(
            params=warm_start_params(restored["params"], state.params)
        )
        if verbose:
            print(f"Warm-started params from {path}.")

    # Resume from the latest checkpoint (process-restart recovery; the
    # reference can only restart from scratch or hand-load a .pth). The step
    # counter is restored too, so the fold_in(dropout_rng, step) mask sequence
    # continues instead of replaying from step 0.
    start_epoch = 0
    if config.get("resume"):
        from texocr_tpu.checkpoint.orbax_io import latest_checkpoint, load_checkpoint

        path = latest_checkpoint(tcfg.save_dir)
        if path:
            template = {
                "params": state.params,
                "opt_state": state.opt_state,
                "epoch": 0,
                "step": 0,
            }
            try:
                restored = load_checkpoint(path, template=template)
            except Exception:
                # Older checkpoints predate the step counter.
                del template["step"]
                restored = load_checkpoint(path, template=template)
            state = state.replace(
                params=restored["params"],
                opt_state=restored["opt_state"],
                step=jnp.asarray(int(restored.get("step") or 0), jnp.int32),
            )
            start_epoch = int(restored["epoch"]) + 1
            if verbose:
                print(f"Resumed from {path} (epoch {start_epoch}).")
    if verbose:
        n_params = sum(x.size for x in jax.tree.leaves(state.params))
        print(f"Devices: {mesh.devices.shape} {mesh.axis_names}")
        print(f"Model has {n_params} parameters.")

    from texocr_tpu.telemetry import MetricsLogger

    logger = MetricsLogger(metrics_path, echo=verbose)

    if config.get("device_data"):
        # Device-resident mode: the whole dataset lives on the chip; batches
        # are selected on device and many steps run per dispatch (see
        # training/device_data.py for the rationale).
        return _train_device_resident(
            model, tx, state, train_set, val_set, tcfg, config,
            mesh=mesh, start_epoch=start_epoch, logger=logger, verbose=verbose,
        )

    train_step = make_train_step(model, tx, mask_pad=tcfg.mask_pad_loss)
    eval_step = make_eval_step(model, mask_pad=tcfg.mask_pad_loss)

    history = []
    start = time.time()
    # ONE loader for the whole run: its sampler/collator seeds increment per
    # epoch so batch composition varies (recreating it per epoch would replay
    # identical batches every epoch). seed_offset keeps the schedule aligned
    # after a resume.
    train_loader = create_dataloader(train_set, config, seed_offset=start_epoch)
    val_loader = (
        create_dataloader(val_set, config) if val_set is not None else None
    )
    for epoch in range(start_epoch, tcfg.n_epochs):
        # Metrics accumulate as device scalars; the only host sync per epoch
        # is the float() conversion after the last step, so the hot loop stays
        # fully async-dispatched (no per-step blocking).
        epoch_loss = jnp.zeros((), jnp.float32)
        epoch_acc = jnp.zeros((), jnp.float32)
        n_batches, n_images = 0, 0
        t0 = time.time()
        for images, labels in prefetch(iter(train_loader)):
            images, labels = put_batch(mesh, images, labels)
            state, metrics = train_step(state, images, labels)
            epoch_loss = epoch_loss + metrics["loss"]
            epoch_acc = epoch_acc + metrics["token_acc"]
            n_batches += 1
            n_images += images.shape[0]
        # float() blocks until every dispatched step has executed; timing
        # after it keeps images_per_sec honest under async dispatch.
        mean_loss = float(epoch_loss) / max(n_batches, 1)
        dt = time.time() - t0
        history.append(mean_loss)
        logger.log(
            "train_epoch",
            epoch=epoch + 1,
            loss=mean_loss,
            token_acc=float(epoch_acc) / max(n_batches, 1),
            steps=n_batches,
            images_per_sec=n_images / max(dt, 1e-9),
            seconds=dt,
        )

        if tcfg.save_checkpoint and (epoch + 1) % tcfg.save_freq == 0:
            from texocr_tpu.checkpoint.orbax_io import save_checkpoint

            save_checkpoint(
                tcfg.save_dir, epoch, state.params, state.opt_state,
                extra={"step": int(state.step)},
            )

        if val_set is not None and (epoch + 1) % tcfg.val_freq == 0:
            val_loss = jnp.zeros((), jnp.float32)
            n = 0
            for images, labels in val_loader:
                images, labels = put_batch(mesh, images, labels)
                val_loss = val_loss + eval_step(state.params, images, labels)
                n += 1
            if n:
                logger.log("val", epoch=epoch + 1, loss=float(val_loss) / n)

    if verbose:
        print(f"Training took {time.time() - start:.2f} seconds.")
    logger.close()
    return model, state, history


def _train_device_resident(
    model, tx, state, train_set, val_set, tcfg, config,
    *, mesh, start_epoch, logger, verbose,
):
    """Epoch loop over on-chip shape buckets (training/device_data.py). One
    dispatch = up to ``device_data_steps_per_call`` optimizer steps; the host
    syncs once per epoch on the accumulated metric scalars."""
    from texocr_tpu.training.device_data import (
        DeviceResidentData,
        make_scan_eval_step,
        make_scan_train_step,
    )

    seq_pad = config.get("seq_pad_multiple", 1)
    steps_cap = config.get("device_data_steps_per_call", 16)
    batch_size = tcfg.batch_size
    size_round = config.get("device_data_size_round", 512)
    data = DeviceResidentData.from_dataset(
        train_set, seq_pad_multiple=seq_pad,
        min_bucket_items=(1 if tcfg.keep_small else batch_size),
        mesh=mesh,
        max_canvas=config.get("device_data_max_canvas"),
        size_round=size_round,
        bucket_cap=config.get("device_data_bucket_cap"),
        pack_bits=config.get("device_data_pack_bits", 8),
    )
    # device_data_val=False keeps the val split on the HOST (streamed per
    # batch through the plain eval step) instead of staging it in HBM — the
    # spill knob when train buckets + backward activations already fill the
    # chip (val runs once per val_freq epochs; its upload cost is off the
    # hot path by construction).
    val_resident = bool(config.get("device_data_val", True))
    val_data = (
        DeviceResidentData.from_dataset(
            val_set, seq_pad_multiple=seq_pad, mesh=mesh,
            # Same curriculum canvas bound as training: without it a
            # restricted stage still uploads and compiles full-canvas val
            # executables (minutes each through the tunnel) and the val loss
            # mixes in canvases the stage deliberately excluded.
            max_canvas=config.get("device_data_max_canvas"),
            size_round=size_round,
            pack_bits=config.get("device_data_pack_bits", 8),
        )
        if val_set is not None and val_resident
        else None
    )
    val_loader = None
    if val_set is not None and not val_resident:
        host_eval_step = make_eval_step(model, mask_pad=tcfg.mask_pad_loss)
        val_loader = create_dataloader(val_set, config)
    if verbose:
        for key, b in data.buckets.items():
            print(f"  bucket {key}: {b.n} images, seq_len {b.seq_len}, "
                  f"{b.images.nbytes / 1e6:.0f} MB on device")

    run_steps = make_scan_train_step(
        model, tx, batch_size, mask_pad=tcfg.mask_pad_loss, mesh=mesh,
        augment=bool(config.get("device_data_augment")),
        steps_cap=steps_cap,
    )
    eval_steps = make_scan_eval_step(
        model, batch_size, mask_pad=tcfg.mask_pad_loss, steps_cap=steps_cap
    )

    history = []
    start = time.time()
    plan = data.plan(batch_size, steps_cap=steps_cap)
    import random as _random

    plan_rng = _random.Random(tcfg.seed + start_epoch)
    for epoch in range(start_epoch, tcfg.n_epochs):
        # Interleave buckets call-by-call (BucketBatchSampler shuffles batch
        # order across buckets; this is the same idea at dispatch granularity
        # — pure host-side, no device traffic).
        if tcfg.batch_shuffle:
            plan_rng.shuffle(plan)
        epoch_loss = jnp.zeros((), jnp.float32)
        epoch_acc = jnp.zeros((), jnp.float32)
        n_calls, n_steps = 0, 0
        t0 = time.time()
        for key, steps, chunk_start in plan:
            b = data.buckets[key]
            # perm_seed = epoch and bucket_tag = the bucket's (h, w) packed
            # into one int: all calls of a bucket's epoch pass share one
            # on-device permutation (their disjoint `chunk_start` slices
            # cover the bucket exactly once) while distinct buckets/epochs
            # get decorrelated orders (device_data.make_scan_train_step).
            state, metrics = run_steps(
                state, b.images, b.labels, steps, b.n, chunk_start, epoch,
                key[0] * 4096 + key[1], b.true_w, b.true_len, b.pack_bits,
            )
            epoch_loss = epoch_loss + metrics["loss"] * steps
            epoch_acc = epoch_acc + metrics["token_acc"] * steps
            n_calls += 1
            n_steps += steps
        mean_loss = float(epoch_loss) / max(n_steps, 1)  # one host sync/epoch
        dt = time.time() - t0
        history.append(mean_loss)
        logger.log(
            "train_epoch",
            epoch=epoch + 1,
            loss=mean_loss,
            token_acc=float(epoch_acc) / max(n_steps, 1),
            steps=n_steps,
            images_per_sec=n_steps * tcfg.batch_size / max(dt, 1e-9),
            seconds=dt,
        )

        if tcfg.save_checkpoint and (epoch + 1) % tcfg.save_freq == 0:
            from texocr_tpu.checkpoint.orbax_io import save_checkpoint

            save_checkpoint(
                tcfg.save_dir, epoch, state.params, state.opt_state,
                extra={"step": int(state.step)},
            )

        if val_data is not None and (epoch + 1) % tcfg.val_freq == 0:
            val_loss, n = jnp.zeros((), jnp.float32), 0
            for b in val_data.buckets.values():
                total, off = max(b.n // tcfg.batch_size, 1), 0
                while total > 0:
                    take = min(total, steps_cap)
                    val_loss = val_loss + eval_steps(
                        state.params, b.images, b.labels, take, off, b.n,
                        b.true_w, b.true_len, b.pack_bits,
                    ) * take
                    total -= take
                    off += take
                    n += take
            if n:
                logger.log("val", epoch=epoch + 1, loss=float(val_loss) / n)
        elif val_loader is not None and (epoch + 1) % tcfg.val_freq == 0:
            val_loss, n = jnp.zeros((), jnp.float32), 0
            for images, labels in val_loader:
                images, labels = put_batch(mesh, images, labels)
                val_loss = val_loss + host_eval_step(
                    state.params, images, labels
                )
                n += 1
            if n:
                logger.log("val", epoch=epoch + 1, loss=float(val_loss) / n)

    if verbose:
        print(f"Training took {time.time() - start:.2f} seconds.")
    logger.close()
    return model, state, history
