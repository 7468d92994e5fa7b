"""Training-step throughput at the REFERENCE config: batch 128, (160, 1008)
canvas, flagship 23.7M-param model, Adam (reference config/config.yml:2-4,29).

Measures the jitted donated train step (forward + backward + Adam) on the
chip, images/sec, with and without the per-step host sync the round-1 loop
had (VERDICT weak #1 / next-round #3). Prints one JSON line.

Usage: python tools/bench_train.py [--batch 128] [--seq 160] [--steps 8]
       [--remat] [--flash]
"""

import argparse
import json
import os
import sys
import time

_plat = os.environ.get("JAX_PLATFORMS", "")
if _plat and "cpu" not in _plat.split(","):
    os.environ["JAX_PLATFORMS"] = _plat + ",cpu"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from texocr_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

from texocr_tpu.models import OCRModel  # noqa: E402
from texocr_tpu.training.optimizers import get_optimizer  # noqa: E402
from texocr_tpu.training.train_step import (  # noqa: E402
    create_train_state,
    make_train_step,
)
from __graft_entry__ import _flagship_config  # noqa: E402

H, W = 160, 1008


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import dataclasses

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--seq", type=int, default=160)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--flash", action="store_true")
    p.add_argument("--sync_every_step", action="store_true",
                   help="replicate the round-1 per-step float() host sync")
    p.add_argument("--scan", type=int, default=0, metavar="K",
                   help="device-resident mode: K optimizer steps per dispatch "
                        "via lax.scan over on-chip data (device_data.py)")
    args = p.parse_args()

    dev = jax.devices()[0]
    log(f"device: {dev}  batch={args.batch} seq={args.seq} flash={args.flash}")

    cfg = _flagship_config(max_length=max(512, args.seq), dtype="bfloat16")
    model = OCRModel(
        dataclasses.replace(cfg, use_flash_attention=args.flash)
    )
    init_model = OCRModel(cfg)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params_vars = init_model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 32, 64, 1), jnp.float32),
            jnp.full((1, 8), 999, jnp.int32),
        )
    tx = get_optimizer("Adam", {"lr": 5e-4})

    rng = np.random.default_rng(0)
    images = jax.device_put(
        jnp.asarray(rng.random((args.batch, H, W, 1), dtype=np.float32)), dev
    )
    labels_np = rng.integers(0, 900, size=(args.batch, args.seq)).astype(np.int32)
    labels_np[:, 0] = 998
    labels_np[:, -1] = 997
    labels = jax.device_put(jnp.asarray(labels_np), dev)

    # Build TrainState on-device (params transferred once from the CPU init).
    import optax
    from texocr_tpu.training.train_step import TrainState

    params = jax.device_put(params_vars["params"], dev)
    opt_state = jax.jit(tx.init)(params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=opt_state,
        dropout_rng=jax.random.PRNGKey(1),
    )
    if args.scan:
        # Device-resident data + K-step scan dispatch: the images live on the
        # chip as uint8, batches are gathered on device, and each call runs
        # args.scan optimizer steps (training/device_data.py).
        from texocr_tpu.training.device_data import LANE, make_scan_train_step

        n_pool = max(args.batch * 4, 256)
        # Lane-padded pool per the shipped resident-bucket contract
        # (device_data.LANE): zero-copy gathers; the step crops the batch
        # back to the logical (W, seq).
        WP = -(-W // LANE) * LANE
        LP = -(-args.seq // LANE) * LANE
        pool_np = np.full((n_pool, H, WP), 255, dtype=np.uint8)
        pool_np[:, :, :W] = rng.integers(0, 255, (n_pool, H, W), dtype=np.uint8)
        imgs_u8 = jax.device_put(jnp.asarray(pool_np), dev)
        labs_np = np.full((n_pool, LP), 999, dtype=np.int32)
        labs_np[:, : args.seq] = np.tile(
            labels_np, (n_pool // args.batch + 1, 1)
        )[:n_pool]
        labs_all = jax.device_put(jnp.asarray(labs_np), dev)
        run = make_scan_train_step(model, tx, args.batch, steps_cap=args.scan)
        t0 = time.time()
        state, metrics = run(
            state, imgs_u8, labs_all, args.scan, n_pool, 0, 0, 0, W, args.seq
        )
        first_loss = float(metrics["loss"])
        log(f"compile + first call: {time.time()-t0:.1f}s loss={first_loss:.3f}")
        t0 = time.time()
        calls = max(args.steps // args.scan, 1)
        for c in range(calls):
            state, metrics = run(
                state, imgs_u8, labs_all, args.scan, n_pool, 0, c + 1,
                0, W, args.seq
            )
        final = float(metrics["loss"])
        dt = time.time() - t0
        total_steps = calls * args.scan
        ips = args.batch * total_steps / dt
        log(f"{calls} calls x {args.scan} steps in {dt:.2f}s loss={final:.3f}")
        print(
            json.dumps(
                {
                    "metric": "train_step_images_per_sec",
                    "mode": f"device_resident_scan{args.scan}",
                    "batch": args.batch,
                    "canvas": [H, W],
                    "seq": args.seq,
                    "flash": args.flash,
                    "value": round(ips, 1),
                    "step_ms": round(1000 * dt / total_steps, 1),
                }
            )
        )
        return

    step_fn = make_train_step(model, tx)

    t0 = time.time()
    state, metrics = step_fn(state, images, labels)
    first_loss = float(metrics["loss"])
    log(f"compile + first step: {time.time()-t0:.1f}s loss={first_loss:.3f}")

    t0 = time.time()
    for _ in range(args.steps):
        state, metrics = step_fn(state, images, labels)
        if args.sync_every_step:
            float(metrics["loss"])
    final = float(metrics["loss"])  # blocks: full pipeline drained
    dt = time.time() - t0
    ips = args.batch * args.steps / dt
    log(f"{args.steps} steps in {dt:.2f}s loss={final:.3f}")
    print(
        json.dumps(
            {
                "metric": "train_step_images_per_sec",
                "batch": args.batch,
                "canvas": [H, W],
                "seq": args.seq,
                "flash": args.flash,
                "sync_every_step": args.sync_every_step,
                "value": round(ips, 1),
                "step_ms": round(1000 * dt / args.steps, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
