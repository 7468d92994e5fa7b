"""Device mesh + sharding rules (data parallel first-class, tensor parallel
available on a 'model' axis)."""

from texocr_tpu.parallel.mesh import create_mesh  # noqa: F401
from texocr_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    param_partition_spec,
    shard_pytree,
)
