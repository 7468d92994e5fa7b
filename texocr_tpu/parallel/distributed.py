"""Multi-host (DCN) initialization.

One JAX process per host: ``jax.distributed.initialize`` wires the processes
into one logical runtime, after which ``jax.devices()`` spans every host and
the existing mesh/sharding code (parallel/mesh.py, parallel/sharding.py) is
unchanged — GSPMD routes intra-host collectives over ICI and cross-host ones
over DCN.

Entry points:
- ``python -m texocr_tpu.training.cli --multihost`` (auto-detect: TPU pod
  metadata / cluster env vars), or with explicit
  ``--coordinator host:port --num_processes N --process_id I``.
- library: ``maybe_initialize_distributed(...)`` before building the mesh.

Smoke-tested by tests/test_multihost.py: two real OS processes on this
machine initialize a 2-process CPU cluster, build a global 'data' mesh and
psum across it.
"""

from __future__ import annotations

from typing import Optional

_initialized = False


def maybe_initialize_distributed(
    multihost: bool = False,
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Call ``jax.distributed.initialize`` when multi-host is requested.

    With only ``multihost=True``, auto-detection is used (works on TPU pods /
    GKE where the runtime publishes coordinator metadata). Explicit
    coordinator/num_processes/process_id override it (needed for CPU/GPU
    clusters or bare-metal TPU). Returns True when initialization happened.
    Idempotent: repeated calls are no-ops.
    """
    global _initialized
    if not (multihost or coordinator):
        return False
    if _initialized:
        return True

    import jax

    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    jax.distributed.initialize(**kwargs)
    _initialized = True
    return True
