"""Parameter and batch sharding rules.

Tensor-parallel layout (Megatron-style column/row pairs, GSPMD inserts the
psum on the row-parallel output):

- attention q/k/v kernels (E, inner): COLUMN — shard inner over 'model'
  (heads split across devices; dim_head 64 stays intact per device).
- attention fc_out kernel (inner, 2E): ROW — shard the input dim.
- MLP fc_in kernel (E, 2H): COLUMN; MLP fc_out kernel (H, E): ROW.
- token embedding (V, E) and to_logits kernel (E, V): shard the vocab dim.
- conv/backbone params, norms, biases of row-parallel layers: replicated.

Everything falls back to replicated; batch arrays shard over 'data'.
"""

from __future__ import annotations

from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_partition_spec(path: Tuple[str, ...], value) -> P:
    """Path (tuple of tree keys, e.g. ('encoder','attn_layers','self_attns_0',
    'q','kernel')) -> PartitionSpec over ('data','model')."""
    names = [getattr(k, "key", str(k)) for k in path]
    leaf = names[-1]
    parent = names[-2] if len(names) >= 2 else ""

    if leaf == "kernel" and value.ndim == 2:
        if parent in ("q", "k", "v", "fc_in", "to_logits"):
            return P(None, "model")  # column parallel
        if parent == "fc_out":
            # Row parallel for both the attention out-proj (input = sharded
            # inner dim) and the MLP output (input = sharded hidden dim).
            return P("model", None)
    if leaf == "bias" and parent == "fc_in":
        return P("model")
    if leaf == "embedding" and parent == "token_embedding":
        return P("model", None)
    return P()


def shard_pytree(tree, mesh: Mesh):
    """Place a parameter pytree on the mesh per the partition rules."""

    def place(path, x):
        spec = param_partition_spec(path, x)
        # Drop axes that don't divide evenly — replicate instead (e.g. a
        # vocab of 1000 over a model axis of 3).
        axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
        ok = []
        for dim, ax in enumerate(spec):
            if ax is None:
                ok.append(None)
            elif x.shape[dim] % axis_sizes.get(ax, 1) == 0:
                ok.append(ax)
            else:
                ok.append(None)
        spec = P(*ok) if ok else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, tree)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays shard their leading dim over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
