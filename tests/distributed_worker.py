"""Worker process for the 2-process multi-host DP test.

Launched twice by tests/test_distributed.py with
  COORDINATOR_ADDRESS=localhost:<port> NUM_PROCESSES=2 PROCESS_ID={0,1}
  XLA_FLAGS=--xla_force_host_platform_device_count=4 (4 devices per process)

Runs jax.distributed.initialize through our parallel.distributed wrapper,
builds the SAME deterministic tiny-model state + batch as the in-process
test, takes GPP_DIST_STEPS sharded train steps over the global 8-device
mesh, and (process 0) writes the resulting params to GPP_DIST_OUT.

This is the TPU-native analog of multi-host DCN training (SURVEY.md §5):
identical SPMD program, jax.distributed extends the device set across
processes, XLA routes the gradient all-reduce between them.
"""

import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ground_plane_polling_tpu._cachedir import cpu_cache_dir  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", cpu_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _barrier(name, timeout_ms=300_000):
    """Coordination-service barrier (pure KV store — no Gloo involved).

    XLA:CPU's Gloo collective-context rendezvous has a hardcoded ~30 s
    deadline, while on this 1-CPU box the two workers' compile times can
    skew by minutes under slow-lane contention. Dispatching the first
    collective without alignment flakes (observed round-5 gate run:
    'Gloo context initialization failed: DEADLINE_EXCEEDED:
    GetKeyValue() timed out ... 29.99s' on worker 0 while worker 1 was
    still compiling). The worker therefore AOT-compiles each collective
    program, passes this barrier, and only then dispatches — first-
    collective skew drops from compile-time difference to milliseconds.

    The timeout is 300 s, NOT the test's full 1500 s budget: the wait
    here is only the workers' compile-time DIFFERENCE (both compile the
    same program concurrently), and a dead peer should surface as a
    bounded barrier error, not eat the slow lane's wall time."""
    from jax._src import distributed

    client = distributed.global_state.client
    if client is not None:
        client.wait_at_barrier(name, timeout_ms)


def main():
    import numpy as np
    import optax

    from ground_plane_polling_tpu.models import build_detector
    from ground_plane_polling_tpu.parallel import (
        data_parallel_mesh, initialize, is_multi_host, make_global_batch)
    from ground_plane_polling_tpu.training.train import (
        create_train_state, make_sharded_train_step)
    from tests.test_train_step import IMG, _tiny_batch

    initialize()  # picks up COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID
    assert is_multi_host(), "worker must run under 2 processes"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4, jax.local_device_count()

    import jax.numpy as jnp

    model = build_detector("tiny")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *IMG, 3), jnp.float32))
    tx = optax.identity()
    state = create_train_state(variables, tx, learning_rate=1e-3)

    mesh = data_parallel_mesh()  # all 8 global devices
    step = make_sharded_train_step(model, tx, mesh)
    batch = make_global_batch(mesh, _tiny_batch(batch=8))
    step_c = step.lower(state, batch).compile()  # no collective yet
    _barrier("gpp_step_compiled")

    n_steps = int(os.environ.get("GPP_DIST_STEPS", "2"))
    for _ in range(n_steps):
        state, metrics = step_c(state, batch)

    loss = float(metrics["loss"])  # replicated -> addressable on every host
    print(f"process {jax.process_index()}: step {int(state.step)} "
          f"loss {loss:.6f}", flush=True)

    # fused prepare+train across both hosts (gpp-tpu-train's default):
    # raw uint8 batch globally sharded, PRNG key replicated
    from ground_plane_polling_tpu.parallel import make_global_raw_batch
    from ground_plane_polling_tpu.training.train import make_fused_train_step
    from tests.test_train_step import _tiny_raw_batch

    fused = make_fused_train_step(model, tx, num_classes=1, augment=True,
                                  mesh=mesh)
    fused_state = create_train_state(
        model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, *IMG, 3), jnp.float32)),
        tx, learning_rate=1e-3)
    raw = make_global_raw_batch(mesh, _tiny_raw_batch(batch=8))
    fused_c = fused.lower(fused_state, raw).compile()
    _barrier("gpp_fused_compiled")
    fused_state, fm = fused_c(fused_state, raw)
    fused_loss = float(fm["loss"])
    print(f"process {jax.process_index()}: fused loss {fused_loss:.6f}",
          flush=True)

    if jax.process_index() == 0:
        out = os.environ["GPP_DIST_OUT"]
        flat = {}
        for path, leaf in jax.tree_util.tree_flatten_with_path(
                state.params)[0]:
            key = jax.tree_util.keystr(path)
            flat[key] = np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(
                fused_state.params)[0]:
            flat["fused::" + jax.tree_util.keystr(path)] = np.asarray(leaf)
        flat["__loss__"] = np.float32(loss)
        flat["__fused_loss__"] = np.float32(fused_loss)
        np.savez(out, **flat)
        print(f"process 0: wrote {out}", flush=True)


if __name__ == "__main__":
    main()
