"""Multi-host initialization for data-parallel training.

The reference tops out at single-host multi-GPU (keras multi_gpu_model,
bin/train.py:100-104). The TPU-native scale-out path is SPMD over all hosts'
devices: call `initialize()` once per host process before any jax use, and
the same mesh/jit code from parallel.mesh spans the full slice — XLA routes
the gradient all-reduce over ICI within a pod and DCN across pods.

On a single host this is a no-op, so training code can call it
unconditionally.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

__all__ = ["initialize", "is_multi_host", "local_batch_slice",
           "make_global_batch", "make_replicated", "make_global_raw_batch"]


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env-var fallbacks
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID); no-op when unset
    or single-process."""
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return  # single host
    num_processes = num_processes or int(os.environ.get("NUM_PROCESSES", 1))
    process_id = process_id if process_id is not None else int(
        os.environ.get("PROCESS_ID", 0))
    if num_processes <= 1:
        if process_id:
            # coordinator + nonzero rank but num_processes<=1 is a broken
            # launch (NUM_PROCESSES forgotten): silently proceeding would
            # train N independent copies clobbering each other's output
            raise ValueError(
                f"COORDINATOR_ADDRESS={coordinator_address} and "
                f"PROCESS_ID={process_id} are set but num_processes is "
                f"{num_processes} — set NUM_PROCESSES on every host")
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        # jax's default coordinator-connect timeout is 300 s; on a loaded
        # single-CPU box (the 2-process CI test) worker starts can be
        # minutes apart, which flakes the barrier. Env-overridable.
        initialization_timeout=int(
            os.environ.get("GPP_DIST_INIT_TIMEOUT", 900)),
    )


def is_multi_host() -> bool:
    return jax.process_count() > 1


def local_batch_slice(global_batch: int):
    """(start, size) of this host's shard of a globally-sharded batch."""
    per_host = global_batch // jax.process_count()
    return jax.process_index() * per_host, per_host


def make_global_batch(mesh, batch):
    """Assemble per-host numpy batches into global, batch-sharded jax.Arrays.

    Each host passes the FULL global batch pytree (e.g. produced from a
    shared seed or a shared filesystem); this host contributes only its
    local_batch_slice rows. Single-process: plain sharded device_put.
    Multi-host jit requires global jax.Arrays — numpy inputs only work when
    every shard is process-addressable.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))

    def place(x):
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        start, size = local_batch_slice(x.shape[0])
        return jax.make_array_from_process_local_data(
            sharding, x[start:start + size], x.shape)

    return jax.tree_util.tree_map(place, batch)


def make_replicated(mesh, x):
    """Place one array replicated over every device of `mesh`, multi-host
    correct (every process passes the same full array)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    import numpy as np

    x = np.asarray(x)
    return jax.make_array_from_process_local_data(sharding, x, x.shape)


def make_global_raw_batch(mesh, raw):
    """Global placement for a fused-prepare raw batch
    (KittiLoader(raw_batches=True) layout): every array leaf is
    batch-sharded over 'data' except the PRNG `key`, which is replicated
    — matching make_fused_train_step(mesh=...)'s in_shardings."""
    key = raw["key"]
    placed = make_global_batch(mesh, {k: v for k, v in raw.items()
                                      if k != "key"})
    placed["key"] = make_replicated(mesh, key)
    return placed
