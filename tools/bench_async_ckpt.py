"""Measure the async-checkpoint overlap on the real chip.

Protocol (one process):
  1. build the full-res train state (resnet50, 416x1344, batch 2)
  2. repeat GPP_ACKPT_REPEATS (default 3) measurement cycles, each:
       t_sync      = wall time of a synchronous save_checkpoint
       t_steps_ref = wall time of N train steps alone
       t_save      = AsyncCheckpointSaver.save() call (on-device copy
                     + thread start — should be near-zero)
       t_steps     = wall time of N steps while the pull runs
       t_wait      = saver.wait()
     and keep the cycle with the SMALLEST total — the clear-path
     envelope. The relay is phase-bimodal (docs/PERFORMANCE.md session
     I): a single window can inflate ~1.9x, and a phase flip BETWEEN
     the reference and async windows fakes (or hides) step inflation,
     so cycles are kept atomic and the min is taken across cycles.
  3. effective async stall = t_save + t_wait + (t_steps - t_steps_ref),
     i.e. everything the snapshot still costs the training loop
     (including steps slowed by sharing the wire with the pull; a
     negative delta from residual noise is clipped at 0 and the raw
     value printed). "% hidden" = 1 - stall_async / t_sync.

Usage: tools/tpu_run.sh python tools/bench_async_ckpt.py [n_steps]
"""

import os
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N_STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 100
IMAGE_SHAPE = tuple(int(x) for x in
                    os.environ.get("GPP_ACKPT_SHAPE", "416,1344").split(","))
BACKBONE = os.environ.get("GPP_ACKPT_BACKBONE", "resnet50")
BATCH = 2


def main():
    from ground_plane_polling_tpu.models import build_detector
    from ground_plane_polling_tpu.ops import anchors as anchor_ops
    from ground_plane_polling_tpu.training.checkpoint import (
        AsyncCheckpointSaver, save_checkpoint)
    from ground_plane_polling_tpu.training.train import (
        create_train_state, make_optimizer, make_train_step)

    rng = np.random.RandomState(0)
    model = build_detector(BACKBONE, num_classes=1, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *IMAGE_SHAPE, 3), jnp.float32))
    tx = make_optimizer()
    state = create_train_state(variables, tx, learning_rate=1e-5)

    n = anchor_ops.num_anchors_for_shape(IMAGE_SHAPE)
    batch = {
        "image": jnp.asarray(
            rng.uniform(-128, 128, (BATCH, *IMAGE_SHAPE, 3)), jnp.float32),
        "labels": jnp.zeros((BATCH, n, 8), jnp.float32),
        "regression": jnp.zeros((BATCH, n, 13), jnp.float32),
        "regression_dim": jnp.zeros((BATCH, n, 4), jnp.float32),
    }
    step_fn = make_train_step(model, tx)

    def run_steps(s, n):
        m = None
        for _ in range(n):
            s, m = step_fn(s, batch)
        float(m["loss"])  # force completion
        return s

    state = run_steps(state, 3)  # compile + warm

    repeats = int(os.environ.get("GPP_ACKPT_REPEATS", 3))
    cycles = []
    with tempfile.TemporaryDirectory() as d:
        for r in range(repeats):
            t0 = time.perf_counter()
            save_checkpoint(os.path.join(d, f"sync{r}"), state)
            t_sync = time.perf_counter() - t0

            # steps-only reference window (same cycle as its async twin
            # so a relay phase flip cannot land between them unnoticed)
            t0 = time.perf_counter()
            state = run_steps(state, N_STEPS)
            t_steps_ref = time.perf_counter() - t0

            saver = AsyncCheckpointSaver()
            t0 = time.perf_counter()
            saver.save(os.path.join(d, f"async{r}"), state)
            t_save = time.perf_counter() - t0
            t0 = time.perf_counter()
            state = run_steps(state, N_STEPS)
            t_steps = time.perf_counter() - t0
            t0 = time.perf_counter()
            saver.wait()
            t_wait = time.perf_counter() - t0
            cycles.append((t_sync, t_steps_ref, t_save, t_steps, t_wait))
            print(f"[cycle {r}] sync {t_sync:.1f}s ref {t_steps_ref:.1f}s "
                  f"save {t_save:.1f}s steps {t_steps:.1f}s "
                  f"wait {t_wait:.1f}s", flush=True)

    # clear-path envelope: the cycle with the least total relay time
    t_sync, t_steps_ref, t_save, t_steps, t_wait = min(
        cycles, key=lambda c: sum(c))
    delta = t_steps - t_steps_ref
    stall_async = t_save + t_wait + max(0.0, delta)
    print(f"sync save:            {t_sync:8.2f} s")
    print(f"async save() call:    {t_save:8.2f} s")
    print(f"{N_STEPS} steps alone:   {t_steps_ref:8.2f} s")
    print(f"{N_STEPS} steps w/ pull: {t_steps:8.2f} s (delta {delta:+.2f})")
    print(f"async wait():         {t_wait:8.2f} s")
    print(f"effective stall sync {t_sync:.2f} s -> async {stall_async:.2f} s "
          f"({100 * (1 - stall_async / max(t_sync, 1e-9)):.0f}% hidden)")


if __name__ == "__main__":
    main()
