"""Test configuration: force an 8-device virtual CPU mesh.

Must run before any jax import, so this sits at the top of conftest. All
tests (including sharding/pjit tests) run on fake CPU devices; the real-TPU
path is exercised by bench.py and the driver's compile checks.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.default_rng(0)
