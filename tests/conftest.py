"""Test configuration: force an 8-device virtual CPU mesh.

Must run before any jax import, so this sits at the top of conftest. All
tests (including sharding/pjit tests) run on fake CPU devices; the real-TPU
path is exercised by bench.py and the driver's compile checks.
"""

import os

# Force CPU even when the environment points JAX at a TPU (e.g.
# JAX_PLATFORMS=axon): unit tests must not grab the chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# The environment's TPU plugin ("axon") force-sets jax_platforms at import
# time, ignoring JAX_PLATFORMS and XLA_FLAGS device forcing — override it
# back: unit tests run on 8 fake CPU devices, never on the chip.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Numeric parity tests compare float32 against the PyTorch reference; XLA:CPU's
# "default" matmul/conv precision accumulates in reduced precision (~1e-1
# absolute error on the ResNet stem), so force full fp32 in tests. Production
# TPU runs keep the default (bf16 MXU passes) for speed.
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.default_rng(0)
