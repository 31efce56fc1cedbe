"""Training-step throughput on the real chip (BASELINE config 4: batch 2,
random-transform augmentation, focal + box/keypoint + dim losses)."""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import time

import jax
import jax.numpy as jnp
import numpy as np

from ground_plane_polling_tpu.models import build_detector
from ground_plane_polling_tpu.ops import anchors as anchor_ops
from ground_plane_polling_tpu.training.train import (
    create_train_state, make_optimizer, make_train_step)

IMAGE_SHAPE = (416, 1344)  # pipeline bucket at pad_multiple=32 (was 512x1408 through round 2)
BATCH = int(os.environ.get("GPP_BENCH_BATCH", 2))
STEPS = int(os.environ.get("GPP_BENCH_STEPS", 10))


def main():
    rng = np.random.RandomState(0)
    n = anchor_ops.num_anchors_for_shape(IMAGE_SHAPE)
    model = build_detector("resnet50", num_classes=1, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *IMAGE_SHAPE, 3), jnp.float32))
    tx = make_optimizer()
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx)

    batch = {
        "image": jnp.asarray(
            rng.uniform(-128, 128, (BATCH, *IMAGE_SHAPE, 3)), jnp.float32),
        "labels": jnp.zeros((BATCH, n, 8), jnp.float32),
        "regression": jnp.zeros((BATCH, n, 13), jnp.float32),
        "regression_dim": jnp.zeros((BATCH, n, 4), jnp.float32),
    }

    state, m = step(state, batch)  # compile
    float(m["loss"])  # host fetch (block_until_ready lies on this relay)

    # XLA's own FLOP count for the whole compiled fwd+bwd+update program.
    # AFTER the warm call: the AOT lower().compile() here then deserializes
    # from the persistent cache instead of doing a second cold remote
    # compile (the jit cache and AOT path don't share executables).
    step_flops = None
    try:
        compiled = step.lower(state, batch).compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        step_flops = float(analysis["flops"])
    except Exception:
        pass
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = step(state, batch)
    final = float(m["loss"])  # forces the whole donated-state chain
    assert np.isfinite(final)
    dt = (time.perf_counter() - t0) / STEPS
    line = (f"train step: {dt*1e3:.1f} ms -> {BATCH/dt:.2f} images/sec "
            f"(batch {BATCH}, {IMAGE_SHAPE})")
    if step_flops:
        tflops = step_flops / dt / 1e12
        # 184 TFLOP/s = the calibrated bf16 matmul ceiling on this chip
        # (docs/PERFORMANCE.md "device calibration")
        line += f"  | {tflops:.1f} TFLOP/s, MFU {100*tflops/184.0:.1f}%"
    print(line)


if __name__ == "__main__":
    main()
