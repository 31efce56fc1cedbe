"""Device mesh + sharding helpers for data-parallel training.

The reference's only parallelism is single-host multi-GPU batch splitting via
keras.utils.multi_gpu_model (/root/reference/keras_retinanet_3D/bin/
train.py:100-104): weights pinned to the CPU, batch scattered, gradients
reduced by TF. The TPU-native equivalent is SPMD: a 1-D 'data' mesh, batch
sharded over it, parameters replicated; jit emits the gradient all-reduce as
an XLA psum over ICI — no communication code to write.

Multi-host scale-out uses the same program: jax.distributed.initialize()
extends jax.devices() across hosts and the psum rides ICI within a pod
and DCN across pods. A 2-D ('data', 'model') mesh slot is reserved for
future tensor sharding, but this model (a ~40M-param CNN) has no need
for it — see SURVEY.md §5.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["data_parallel_mesh", "batch_sharding", "replicated_sharding",
           "shard_batch"]


def data_parallel_mesh(n_devices: Optional[int] = None,
                       devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the first `n_devices` devices (default: all)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over the 'data' mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place every array in `batch` with its leading axis split over 'data'."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)
