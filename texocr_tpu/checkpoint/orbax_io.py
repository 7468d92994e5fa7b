"""Native checkpointing via orbax: (params, opt_state, step) with the same
cadence semantics as the reference (reference utils.py:52-71 writes
checkpoints/checkpoint_e{epoch}.pth gated by save_checkpoint/save_freq)."""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


def _path(save_dir: str, epoch: int) -> str:
    return os.path.abspath(os.path.join(save_dir, f"checkpoint_e{epoch}"))


def save_checkpoint(save_dir: str, epoch: int, params, opt_state=None, extra=None):
    """Write checkpoints/checkpoint_e{epoch}/ (orbax PyTree checkpoint)."""
    os.makedirs(save_dir, exist_ok=True)
    payload = {"params": params, "epoch": epoch}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    if extra:
        payload.update(extra)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(_path(save_dir, epoch), payload, force=True)


def load_checkpoint(path: str, template: Optional[Any] = None) -> dict:
    """Restore a checkpoint directory. ``template`` (matching pytree of
    ShapeDtypeStructs or arrays) restores with correct shardings/dtypes."""
    ckptr = ocp.PyTreeCheckpointer()
    if template is not None:
        return ckptr.restore(os.path.abspath(path), item=template)
    return ckptr.restore(os.path.abspath(path))


def load_params_fast(path: str) -> Any:
    """Restore just the ``params`` of a checkpoint, with a msgpack side-cache.

    A template-free orbax restore reads sharding metadata from file and takes
    minutes for the 23.7M-param model through the single-chip device tunnel;
    resumable long evals (tools/eval_full_split.py) restart the process after
    spurious tunnel errors and would pay that on every restart. The first call
    restores via orbax and writes ``<path>/params_cache.msgpack`` (params
    only — no opt_state); later calls load the cache in under a second. The
    cache write is crash-safe (temp file + atomic rename).
    """
    import numpy as np
    from flax import serialization as fser

    cache = os.path.join(os.path.abspath(path), "params_cache.msgpack")
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            return fser.msgpack_restore(f.read())
    params = load_checkpoint(path)["params"]
    host = __import__("jax").tree.map(np.asarray, params)
    tmp = cache + ".tmp"
    with open(tmp, "wb") as f:
        f.write(fser.msgpack_serialize(host))
    os.replace(tmp, cache)
    return host


def latest_checkpoint(save_dir: str) -> Optional[str]:
    """Highest-epoch checkpoint_e* directory, or None."""
    if not os.path.isdir(save_dir):
        return None
    best, best_epoch = None, -1
    for name in os.listdir(save_dir):
        if name.startswith("checkpoint_e"):
            try:
                epoch = int(name[len("checkpoint_e"):])
            except ValueError:
                continue
            if epoch > best_epoch:
                best, best_epoch = os.path.join(save_dir, name), epoch
    return best


def warm_start_params(restored, target):
    """Adapt ``restored`` params onto the ``target`` pytree for fine-tuning.

    Leaves with matching shapes are taken from ``restored`` (cast to the
    target dtype). A leaf whose shape differs along exactly one axis — in
    practice the decoder's positional table, whose row count follows the
    dataset's max_length — keeps the target's initialization and has the
    overlapping slice overwritten by the restored values, mirroring the
    reference wrapper's pos-embed length adaptation (ocr_model.py:84-88) but
    in the grow direction too. Any other mismatch keeps the target leaf.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    def place(arr, t):
        arr = jnp.asarray(arr, dtype=t.dtype)
        sharding = getattr(t, "sharding", None)
        return jax.device_put(arr, sharding) if sharding is not None else arr

    def adapt(r, t):
        r = np.asarray(r)
        tshape = t.shape
        if r.shape == tshape:
            return place(r, t)
        diff = [i for i in range(r.ndim) if r.ndim == len(tshape)
                and r.shape[i] != tshape[i]]
        if r.ndim == len(tshape) and len(diff) == 1:
            axis = diff[0]
            n = min(r.shape[axis], tshape[axis])
            out = np.array(t)
            sl = tuple(slice(None) if i != axis else slice(0, n)
                       for i in range(r.ndim))
            out[sl] = r[sl]
            return place(out, t)
        return t

    return jax.tree.map(adapt, restored, target)
