"""Filter/polling variant sweep at the headline config (one TPU process).

Informed by bench_packed.py: 21634-plane polling (Pallas) measured FASTER
than 1024-plane (XLA-fused) — test Pallas at 1024, pre-NMS top-k 512, and
batch scaling with the best combination.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import time

import jax
import jax.numpy as jnp
import numpy as np

from ground_plane_polling_tpu.inference import make_detect_fn
from ground_plane_polling_tpu.models import build_detector

IMAGE_SHAPE = (416, 1344)  # pipeline bucket at pad_multiple=32 (was 512x1408 through round 2)
N1, N2 = 5, 25


def chained(fn, args, label, batch=1):
    variables, images, P_inv, planes = args

    def run(iters):
        carry = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(variables, images + carry, P_inv, planes)
            carry = out.scores[0, 0] * 0.0
        np.asarray(carry)
        return time.perf_counter() - t0

    run(2)
    dt = (run(N2) - run(N1)) / (N2 - N1)
    print(f"{label:40s}: {dt*1e3:8.2f} ms/iter -> {batch/dt:7.1f} img/s",
          flush=True)
    return dt


def inputs(batch, n_planes):
    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.uniform(-128, 128, (batch, *IMAGE_SHAPE, 3)), jnp.float32)
    P = np.array([[721.5, 0.0, 609.6, 44.9],
                  [0.0, 721.5, 172.9, 0.2], [0.0, 0.0, 1.0, 0.003]])
    P_inv = jnp.asarray(np.tile(np.linalg.pinv(P)[None], (batch, 1, 1)),
                        jnp.float32)
    planes = np.stack([
        rng.uniform(-0.05, 0.05, n_planes), np.ones(n_planes),
        rng.uniform(-0.05, 0.05, n_planes),
        rng.uniform(-2.5, -1.0, n_planes)], axis=1)
    planes = jnp.asarray(np.tile(planes[None], (batch, 1, 1)), jnp.float32)
    return images, P_inv, planes


def main():
    model = build_detector("resnet50", num_classes=1, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *IMAGE_SHAPE, 3), jnp.float32))

    cases = [
        ("baseline (auto=XLA poll, topk1024) b1", 1024, 1, {}),
        ("pallas poll @1024 b1", 1024, 1, dict(use_pallas_polling=True)),
        ("topk512 b1", 1024, 1, dict(pre_nms_top_k=512)),
        ("pallas + topk512 b1", 1024, 1,
         dict(use_pallas_polling=True, pre_nms_top_k=512)),
        ("pallas poll @1024 b4", 1024, 4, dict(use_pallas_polling=True)),
        ("pallas poll @1024 b8", 1024, 8, dict(use_pallas_polling=True)),
        ("baseline b4", 1024, 4, {}),
    ]
    for label, n_planes, batch, kw in cases:
        fn = make_detect_fn(model, IMAGE_SHAPE, num_classes=1,
                            with_pose=True, **kw)
        chained(fn, (variables, *inputs(batch, n_planes)), label, batch=batch)


if __name__ == "__main__":
    main()
