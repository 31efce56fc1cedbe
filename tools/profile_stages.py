"""Stage-by-stage timing of the inference pipeline on the real chip."""

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import time

import jax
import jax.numpy as jnp
import numpy as np

from ground_plane_polling_tpu.inference import decode_predictions, make_detect_fn
from ground_plane_polling_tpu.models import build_detector
from ground_plane_polling_tpu.ops import anchors as anchor_ops
from ground_plane_polling_tpu.ops.filtering import filter_detections_batch
from ground_plane_polling_tpu.ops.polling import fit_road_planes

IMAGE_SHAPE = (512, 1408)
N_PLANES = 1024
ITERS = 10


def bench(fn, *args, iters=ITERS, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.RandomState(0)
    model = build_detector("resnet50", num_classes=1, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *IMAGE_SHAPE, 3), jnp.float32))
    images = jnp.asarray(rng.uniform(-128, 128, (1, *IMAGE_SHAPE, 3)),
                         jnp.float32)
    anchors = jnp.asarray(anchor_ops.anchors_for_shape(IMAGE_SHAPE))
    P = np.array([[721.5, 0.0, 609.6, 44.9],
                  [0.0, 721.5, 172.9, 0.2], [0.0, 0.0, 1.0, 0.003]])
    P_inv = jnp.asarray(np.linalg.pinv(P)[None], jnp.float32)
    planes = np.stack([rng.uniform(-0.05, 0.05, N_PLANES), np.ones(N_PLANES),
                       rng.uniform(-0.05, 0.05, N_PLANES),
                       rng.uniform(-2.5, -1.0, N_PLANES)], axis=1)[None]
    planes = jnp.asarray(planes, jnp.float32)

    fwd = jax.jit(model.apply)
    t_fwd = bench(fwd, variables, images)
    print(f"model forward:           {t_fwd*1e3:8.2f} ms")

    @jax.jit
    def fwd_filter(v, im):
        raw = model.apply(v, im)
        boxes, dims = decode_predictions(raw, anchors, 1)
        return filter_detections_batch(boxes, dims, raw["classification"],
                                       num_classes=1)

    t_fil = bench(fwd_filter, variables, images)
    print(f"+ decode + filter/NMS:   {t_fil*1e3:8.2f} ms")

    full = make_detect_fn(model, IMAGE_SHAPE, num_classes=1, with_pose=True)
    t_full = bench(full, variables, images, P_inv, planes)
    print(f"full (+polling +pose):   {t_full*1e3:8.2f} ms")
    print(f"=> decode+filter/NMS cost: {(t_fil-t_fwd)*1e3:.2f} ms; "
          f"polling+pose cost: {(t_full-t_fil)*1e3:.2f} ms; "
          f"throughput {1.0/t_full:.1f} img/s")


if __name__ == "__main__":
    main()
