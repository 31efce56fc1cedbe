"""Test configuration: force an 8-virtual-device CPU backend.

Multi-chip sharding paths are validated on a virtual CPU mesh (real multi-chip
TPU hardware isn't available in CI); numerical golden tests don't need TPU.

Note: this environment's sitecustomize imports jax at interpreter startup and
registers a remote-TPU ("axon") backend, so env vars alone are too late —
jax.config.update is required to actually select the CPU backend.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

from ground_plane_polling_tpu._cachedir import cpu_cache_dir  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache for the CPU lane: this box has ONE CPU and the
# lane is compile-bound (~700 s cold), so repeat runs hitting the cache
# cut most of that. Code changes alter the HLO and miss cleanly. The dir
# is keyed by host CPU features (restarts land on different machine
# types; foreign AOT entries risk SIGILL — see _cachedir.py).
jax.config.update("jax_compilation_cache_dir", cpu_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
