"""Checkpointing: orbax-backed native checkpoints + PyTorch .pth conversion."""

from texocr_tpu.checkpoint.torch_shim import (  # noqa: F401
    convert_torch_state_dict,
    load_torch_checkpoint,
)
