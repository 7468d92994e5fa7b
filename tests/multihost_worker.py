"""Worker process for the multi-host smoke test (tests/test_multihost.py).

Run as: python tests/multihost_worker.py <process_id> <num_processes> <port>
Joins a jax.distributed CPU cluster (gloo collectives), builds the global
'data' mesh, runs ONE sharded train step of the tiny model on a fixed global
batch and prints the loss. Every process must print the same value.
"""

import sys


def main():
    pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    import jax

    # The TPU plugin in this image overrides jax_platforms at import time;
    # force the CPU backend, which supports multi-process via gloo.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from texocr_tpu.parallel.distributed import maybe_initialize_distributed

    assert maybe_initialize_distributed(
        coordinator=f"127.0.0.1:{port}", num_processes=n, process_id=pid
    )
    assert jax.process_count() == n, jax.process_count()

    import numpy as np
    import jax.numpy as jnp

    from texocr_tpu.models import OCRModel
    from texocr_tpu.parallel import create_mesh
    from texocr_tpu.parallel.sharding import batch_sharding
    from texocr_tpu.training.optimizers import get_optimizer
    from texocr_tpu.training.train_step import create_train_state, make_train_step
    from tests.tiny import tiny_model_config

    mesh = create_mesh({"data": -1})  # all global devices
    model = OCRModel(tiny_model_config())
    rng = np.random.default_rng(0)
    batch = 4
    images_np = rng.normal(size=(batch, 32, 64, 1)).astype(np.float32)
    labels_np = rng.integers(0, 40, size=(batch, 12)).astype(np.int32)

    tx = get_optimizer("Adam", {"lr": 1e-3})
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0),
        jnp.asarray(images_np[:1]), jnp.asarray(labels_np[:1]), mesh=mesh,
    )
    sh = batch_sharding(mesh)

    def to_global(arr):
        # Each process contributes its shard of the global batch.
        return jax.make_array_from_callback(
            arr.shape, sh, lambda idx: jnp.asarray(arr[idx])
        )

    step = make_train_step(model, tx)
    state, metrics = step(state, to_global(images_np), to_global(labels_np))
    print(
        f"MULTIHOST_OK pid={pid} procs={jax.process_count()} "
        f"devices={jax.device_count()} loss={float(metrics['loss']):.6f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
