"""Variant sweep on the real chip: pre-NMS top-k, Pallas polling at 22k
planes, batched inference. One process, pipelined timing."""

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


def timed(fn, args, iters=30, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


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
        ("baseline b1 p1024", dict(batch=1, planes=1024), {}),
        ("pre_nms_512 b1", dict(batch=1, planes=1024),
         dict(pre_nms_top_k=512)),
        ("pre_nms_256 b1", dict(batch=1, planes=1024),
         dict(pre_nms_top_k=256)),
        ("batch8 p1024", dict(batch=8, planes=1024), {}),
    ]
    for name, cfg, kw in cases:
        fn = make_detect_fn(model, IMAGE_SHAPE, num_classes=1,
                            with_pose=True, **kw)
        args = (variables, *inputs(cfg["batch"], cfg["planes"]))
        dt = timed(fn, args)
        print(f"{name:24s}: {dt*1e3:8.2f} ms/iter -> "
              f"{cfg['batch']/dt:7.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
