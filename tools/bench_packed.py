"""Measure pack_levels + e2e configs on the real chip (one process).

Covers: packed vs unpacked full forward, packed e2e at 1k planes,
BASELINE config 3 (21,634 planes) for both, and batch-8 aggregate.
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

    t_c0 = time.perf_counter()
    run(2)
    dt = (run(N2) - run(N1)) / (N2 - N1)
    print(f"{label:36s}: {dt*1e3:8.2f} ms/iter -> {batch/dt:7.1f} img/s "
          f"(first-call {time.perf_counter()-t_c0- (N1+N2)*dt:.0f}s)",
          flush=True)
    return dt


def chained_fwd(fn, images, label):
    def run(iters):
        carry = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(images + carry)
            carry = out["regression"][0, 0, 0] * 0.0
        np.asarray(carry)
        return time.perf_counter() - t0

    run(2)
    dt = (run(N2) - run(N1)) / (N2 - N1)
    print(f"{label:36s}: {dt*1e3:8.2f} ms/iter", flush=True)
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
    var_cache = {}

    def model_and_vars(pack):
        if pack not in var_cache:
            m = build_detector("resnet50", num_classes=1, dtype=jnp.bfloat16,
                               pack_levels=pack)
            v = m.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, *IMAGE_SHAPE, 3), jnp.float32))
            var_cache[pack] = (m, v)
        return var_cache[pack]

    # forward-only comparison
    for pack in (False, True):
        m, v = model_and_vars(pack)
        fwd = jax.jit(lambda im, _m=m, _v=v: _m.apply(_v, im))
        chained_fwd(fwd, inputs(1, 16)[0], f"forward pack={pack}")

    # e2e comparisons
    cases = [
        ("e2e pack=F p1024 b1", False, 1024, 1),
        ("e2e pack=T p1024 b1", True, 1024, 1),
        ("e2e pack=F p21634 b1", False, 21634, 1),
        ("e2e pack=T p21634 b1", True, 21634, 1),
        ("e2e pack=T p1024 b8", True, 1024, 8),
    ]
    for label, pack, n_planes, batch in cases:
        m, v = model_and_vars(pack)
        fn = make_detect_fn(m, IMAGE_SHAPE, num_classes=1, with_pose=True)
        images, P_inv, planes = inputs(batch, n_planes)
        chained(fn, (v, images, P_inv, planes), label, batch=batch)


if __name__ == "__main__":
    main()
