"""Multi-host (2-process) data-parallel training, run for real on CPU.

The reference's ceiling is single-host multi-GPU (multi_gpu_model,
bin/train.py:100-104). Our multi-host path (parallel/distributed.py) is the
TPU-native DCN equivalent: jax.distributed.initialize + the SAME sharded
train step spanning all processes' devices. This test launches two real
processes with 4 virtual CPU devices each (global mesh = 8), trains the
tiny model 2 steps, and asserts the resulting params match the
single-process 8-device mesh step bit-for-near (f32 reduction-order noise
only).

Slow lane: two fresh interpreter starts + distributed init + jit.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "distributed_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_dp_matches_single_process(tmp_path):
    out = str(tmp_path / "dist_params.npz")
    port = _free_port()

    env_base = dict(os.environ)
    env_base.pop("JAX_PLATFORMS", None)  # worker sets platform via config
    env_base.update({
        "PALLAS_AXON_POOL_IPS": "",  # never dial the TPU relay from workers
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "COORDINATOR_ADDRESS": f"localhost:{port}",
        "NUM_PROCESSES": "2",
        "GPP_DIST_OUT": out,
        "GPP_DIST_STEPS": "2",
    })

    procs = []
    for pid in range(2):
        env = dict(env_base, PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, WORKER], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outputs = []
    for p in procs:
        try:
            # generous: on this 1-CPU box the two workers contend with
            # whatever else the lane is running (observed 209 s alone,
            # >600 s under full slow-lane contention)
            stdout, _ = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(stdout)
    for pid, (p, stdout) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, (
            f"worker {pid} failed:\n{stdout[-4000:]}")
    assert os.path.exists(out), outputs[0][-2000:]

    dist = np.load(out)

    # same program, single process, 8 in-process devices (conftest)
    import jax
    import jax.numpy as jnp
    import optax

    from ground_plane_polling_tpu.models import build_detector
    from ground_plane_polling_tpu.parallel import (
        data_parallel_mesh, make_global_batch)
    from ground_plane_polling_tpu.training.train import (
        create_train_state, make_sharded_train_step)
    from tests.test_train_step import IMG, _tiny_batch

    model = build_detector("tiny")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *IMG, 3), jnp.float32))
    tx = optax.identity()
    state = create_train_state(variables, tx, learning_rate=1e-3)
    mesh = data_parallel_mesh(8)
    step = make_sharded_train_step(model, tx, mesh)
    batch = make_global_batch(mesh, _tiny_batch(batch=8))
    for _ in range(2):
        state, metrics = step(state, batch)

    np.testing.assert_allclose(float(metrics["loss"]),
                               float(dist["__loss__"]), rtol=1e-5)
    leaves = jax.tree_util.tree_flatten_with_path(state.params)[0]
    special = [k for k in dist.files
               if k.startswith("fused::") or k.startswith("__")]
    assert len(leaves) == len(dist.files) - len(special)
    for path, leaf in leaves:
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(leaf), dist[key], rtol=1e-5, atol=5e-7,
            err_msg=f"param {key} diverged between 1-proc and 2-proc runs")

    # fused prepare+train (the train CLI default): single-process 8-device
    # mesh must match the 2-process run on the same raw batch + key
    from ground_plane_polling_tpu.parallel import make_global_raw_batch
    from ground_plane_polling_tpu.training.train import make_fused_train_step
    from tests.test_train_step import _tiny_raw_batch

    fused = make_fused_train_step(model, tx, num_classes=1, augment=True,
                                  mesh=mesh)
    fused_state = create_train_state(
        model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, *IMG, 3), jnp.float32)),
        tx, learning_rate=1e-3)
    fused_state, fm = fused(
        fused_state, make_global_raw_batch(mesh, _tiny_raw_batch(batch=8)))
    np.testing.assert_allclose(float(fm["loss"]),
                               float(dist["__fused_loss__"]), rtol=1e-5)
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            fused_state.params)[0]:
        key = "fused::" + jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(leaf), dist[key], rtol=1e-5, atol=5e-7,
            err_msg=f"fused param {key} diverged between 1-proc and "
                    f"2-proc runs")

