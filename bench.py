"""End-to-end GPP inference benchmark (driver contract).

Measures the north-star metric from BASELINE.md: KITTI-resolution single
image end-to-end inference (ResNet-50 backbone, bfloat16 compute, decode +
NMS + 1k-plane polling + pose) on one TPU chip, in images/sec.

Timing protocol (important on this remote-relay setup, where
block_until_ready returns before device completion): iterations are CHAINED
— each call's input depends on the previous call's output — and completion
is forced by fetching a scalar of the final output to the host. The fixed
relay round-trip is removed by differencing two run lengths:
  rate = (N2 - N1) / (t(N2) - t(N1))
and the whole differenced measurement is repeated REPEATS times, reporting
the fastest (relay load varies minute-to-minute by up to ~1.5x — see
docs/PERFORMANCE.md "measurement noise" — and the minimum tracks the
device's actual throughput).

The reference publishes no numbers; its per-image frame-rate print
(run_network.py:108-111) on the Keras/TF-1.9 stack runs a ~5 fps-class
pipeline on a contemporary GPU. vs_baseline is reported against 10 img/s —
a deliberately generous estimate — so vs_baseline = measured / 10.0.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Env overrides: GPP_BENCH_PLANES, GPP_BENCH_BATCH, GPP_BENCH_FUSE
(=1 runs the cls+dim heads as one block-diagonal tower — exact same
outputs, see models.heads.FusedClsDimHead).
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_FPS_ESTIMATE = 10.0

# KITTI 375x1242 resized to min-side 800 / max-side 1333 => 403x1333;
# padded up to conv-friendly multiples of 128
IMAGE_SHAPE = (512, 1408)
N_PLANES = int(os.environ.get("GPP_BENCH_PLANES", 1024))
BATCH = int(os.environ.get("GPP_BENCH_BATCH", 1))
N1, N2 = 5, 25
REPEATS = int(os.environ.get("GPP_BENCH_REPEATS", 3))
FUSE = os.environ.get("GPP_BENCH_FUSE", "0") == "1"
TOP_K = int(os.environ.get("GPP_BENCH_TOPK", 1024))


def chained_run(fn, variables, images, P_inv, planes, iters):
    """Run `iters` dependent inference calls; returns elapsed wall time
    including one final host fetch that forces the whole chain."""
    carry = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(variables, images + carry, P_inv, planes)
        carry = out.scores[0, 0] * 0.0  # tiny dependency, keeps shapes fixed
    np.asarray(carry)  # host fetch = real completion of every iteration
    return time.perf_counter() - t0


def _retry_on_dead_relay(exc: BaseException) -> None:
    """The axon relay registers per-process at interpreter startup and
    fails transiently; a failed registration cannot be repaired in-process.
    Re-exec the interpreter (bounded by GPP_BENCH_EXEC_RETRIES) so the
    round's headline measurement survives a relay blip."""
    import sys

    if "axon" not in str(exc):
        raise exc
    tries = int(os.environ.get("GPP_BENCH_EXEC_RETRIES", "5"))
    if tries <= 0:
        raise exc
    os.environ["GPP_BENCH_EXEC_RETRIES"] = str(tries - 1)
    print(f"relay registration failed ({exc}); retrying in 60s "
          f"({tries} attempts left)", file=sys.stderr, flush=True)
    time.sleep(60)
    os.execv(sys.executable, [sys.executable] + sys.argv)


def main():
    from ground_plane_polling_tpu.inference import make_detect_fn
    from ground_plane_polling_tpu.models import build_detector

    rng = np.random.RandomState(0)
    model = build_detector("resnet50", num_classes=1, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *IMAGE_SHAPE, 3), jnp.float32))
    if FUSE:
        from ground_plane_polling_tpu.models import fuse_detector_params

        model = build_detector("resnet50", num_classes=1, dtype=jnp.bfloat16,
                               fuse_cls_dim=True)
        variables = fuse_detector_params(variables)
    fn = make_detect_fn(model, IMAGE_SHAPE, num_classes=1, with_pose=True,
                        pre_nms_top_k=TOP_K)

    images = jnp.asarray(
        rng.uniform(-128, 128, (BATCH, *IMAGE_SHAPE, 3)), jnp.float32)
    P = np.array([[721.5, 0.0, 609.6, 44.9],
                  [0.0, 721.5, 172.9, 0.2],
                  [0.0, 0.0, 1.0, 0.003]])
    P_inv = jnp.asarray(
        np.tile(np.linalg.pinv(P)[None], (BATCH, 1, 1)), jnp.float32)
    planes = np.stack([
        rng.uniform(-0.05, 0.05, N_PLANES),
        np.ones(N_PLANES),
        rng.uniform(-0.05, 0.05, N_PLANES),
        rng.uniform(-2.5, -1.0, N_PLANES),
    ], axis=1)
    planes = jnp.asarray(np.tile(planes[None], (BATCH, 1, 1)), jnp.float32)

    chained_run(fn, variables, images, P_inv, planes, 2)  # compile + warm
    estimates = []
    for _ in range(REPEATS):
        t1 = chained_run(fn, variables, images, P_inv, planes, N1)
        t2 = chained_run(fn, variables, images, P_inv, planes, N2)
        estimates.append((t2 - t1) / (N2 - N1))
    per_iter = min(estimates)
    images_per_sec = BATCH / per_iter
    print(json.dumps({
        "metric": "gpp_resnet50_e2e_inference",
        "value": round(images_per_sec, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / REFERENCE_FPS_ESTIMATE, 3),
    }))


if __name__ == "__main__":
    try:
        main()
    except RuntimeError as e:  # axon registration is per-process; re-exec
        _retry_on_dead_relay(e)
