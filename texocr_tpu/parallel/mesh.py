"""Named device mesh construction.

The reference has no parallelism of any kind (SURVEY.md §2.6); here data
parallelism is first-class (batch dim over a 'data' axis) and tensor
parallelism of the attention/FFN/vocab matrices is available over a 'model'
axis. A 'sequence' axis name is reserved for future context parallelism but
unimplemented — encoder/decoder sequences (631 patches / <=859 tokens) don't
need it.

XLA GSPMD inserts the collectives (psum for TP reductions, all-gathers for
replication) over ICI; multi-host extends over DCN via
``jax.distributed.initialize`` with no code changes here.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh

AXIS_ORDER = ("data", "model")


def create_mesh(
    spec: Optional[Dict[str, int]] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """Build a Mesh from an axis->size dict, e.g. {'data': 4, 'model': 2}.

    A size of -1 means "all remaining devices". Missing axes default to 1.
    With no spec, all devices go on the data axis (pure DP) — which on a
    single chip is a size-1 mesh, so the same code path runs everywhere.
    """
    devices = list(devices if devices is not None else jax.devices())
    spec = dict(spec or {"data": -1})
    sizes = {ax: int(spec.get(ax, 1)) for ax in AXIS_ORDER}

    n = len(devices)
    wildcard = [ax for ax, s in sizes.items() if s == -1]
    if len(wildcard) > 1:
        raise ValueError("at most one mesh axis may be -1")
    fixed = int(np.prod([s for s in sizes.values() if s != -1]))
    if wildcard:
        if n % fixed:
            raise ValueError(f"{n} devices not divisible by fixed axes {fixed}")
        sizes[wildcard[0]] = n // fixed
    total = int(np.prod(list(sizes.values())))
    if total > n:
        raise ValueError(f"mesh {sizes} wants {total} devices, have {n}")

    shape = tuple(sizes[ax] for ax in AXIS_ORDER)
    return Mesh(np.array(devices[:total]).reshape(shape), AXIS_ORDER)
