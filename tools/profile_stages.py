"""Stage-by-stage timing of the inference pipeline on the real chip.

Uses the chained + host-fetch protocol (see docs/PERFORMANCE.md): each
iteration depends on the previous one's output and a final scalar fetch
forces completion; two run lengths are differenced to cancel the fixed
relay round trip.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import time

import jax
import jax.numpy as jnp
import numpy as np

from ground_plane_polling_tpu.inference import (decode_predictions,
                                                make_detect_fn)
from ground_plane_polling_tpu.models import build_detector
from ground_plane_polling_tpu.ops import anchors as anchor_ops
from ground_plane_polling_tpu.ops.filtering import filter_detections_batch

IMAGE_SHAPE = (416, 1344)  # pipeline bucket at pad_multiple=32 (was 512x1408 through round 2)
N_PLANES = 1024
N1, N2 = 4, 16


def chained_time(fn, images, scalar_of):
    """fn(images) -> out; scalar_of(out) -> () array feeding the chain."""
    def run(iters):
        carry = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(images + carry)
            carry = scalar_of(out) * 0.0
        np.asarray(carry)
        return time.perf_counter() - t0

    run(2)  # compile + warm
    return (run(N2) - run(N1)) / (N2 - N1)


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

    fwd = jax.jit(lambda im: model.apply(variables, im))
    t_fwd = chained_time(fwd, images, lambda o: o["regression"][0, 0, 0])
    print(f"model forward:           {t_fwd*1e3:8.2f} ms", flush=True)

    @jax.jit
    def fwd_filter(im):
        raw = model.apply(variables, im)
        boxes, dims = decode_predictions(raw, anchors, 1)
        return filter_detections_batch(boxes, dims, raw["classification"],
                                       num_classes=1)

    t_fil = chained_time(fwd_filter, images, lambda o: o.scores[0, 0])
    print(f"+ decode + filter/NMS:   {t_fil*1e3:8.2f} ms", flush=True)

    full = make_detect_fn(model, IMAGE_SHAPE, num_classes=1, with_pose=True)
    t_full = chained_time(
        lambda im: full(variables, im, P_inv, planes), images,
        lambda o: o.scores[0, 0])
    print(f"full (+polling +pose):   {t_full*1e3:8.2f} ms", flush=True)
    print(f"=> decode+filter/NMS: {(t_fil-t_fwd)*1e3:.2f} ms; "
          f"polling+pose: {(t_full-t_fil)*1e3:.2f} ms; "
          f"throughput {1.0/t_full:.1f} img/s")


if __name__ == "__main__":
    main()
