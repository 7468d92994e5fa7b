"""Multi-host (DCN) smoke test: the --multihost entry point is code, not prose.

Spawns TWO real OS processes that form a jax.distributed CPU cluster (gloo
collectives over localhost — the same wiring a TPU pod uses over DCN), build
the global 'data' mesh through texocr_tpu.parallel, and run one sharded train
step of the tiny model on a shared global batch. Both processes must report
the same loss, and it must match a single-process run of the identical batch.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


pytestmark = pytest.mark.slow


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_cluster_train_step():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # One CPU device per process (the session's fake-8-device XLA_FLAGS would
    # otherwise multiply the cluster to 16 devices — valid, just slower).
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)

    worker = os.path.join(REPO, "tests", "multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    losses = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("MULTIHOST_OK")]
        assert line, out[-3000:]
        fields = dict(kv.split("=") for kv in line[0].split()[1:])
        assert fields["procs"] == "2" and fields["devices"] == "2", line[0]
        losses.append(float(fields["loss"]))
    assert losses[0] == losses[1]

    # Cross-check against a single-process run of the same global batch.
    import jax
    import jax.numpy as jnp

    from texocr_tpu.models import OCRModel
    from texocr_tpu.parallel import create_mesh
    from texocr_tpu.training.optimizers import get_optimizer
    from texocr_tpu.training.train_step import (
        create_train_state,
        make_train_step,
        put_batch,
    )
    from tests.tiny import tiny_model_config

    mesh = create_mesh({"data": 1, "model": 1}, devices=jax.devices()[:1])
    model = OCRModel(tiny_model_config())
    rng = np.random.default_rng(0)
    images = rng.normal(size=(4, 32, 64, 1)).astype(np.float32)
    labels = rng.integers(0, 40, size=(4, 12)).astype(np.int32)
    tx = get_optimizer("Adam", {"lr": 1e-3})
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0),
        jnp.asarray(images[:1]), jnp.asarray(labels[:1]), mesh=mesh,
    )
    step = make_train_step(model, tx)
    _, metrics = step(state, *put_batch(mesh, images, labels))
    np.testing.assert_allclose(losses[0], float(metrics["loss"]), rtol=2e-4)
