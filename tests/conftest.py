"""Test configuration: force an 8-virtual-device CPU backend.

Multi-chip sharding paths are validated on a virtual CPU mesh (real multi-chip
TPU hardware isn't available in CI); numerical golden tests don't need TPU.
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
