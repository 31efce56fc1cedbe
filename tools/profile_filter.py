"""Sub-stage timing of the filter/NMS pipeline on the real chip.

Separates: sign-collapse+orientation select, pre-NMS top-k over all
anchors, candidate decode, IoU matrix + fixpoint NMS, final top-k — to
decide where a fused Pallas kernel would actually pay (VERDICT item 9).
All programs run on raw head outputs from one real forward pass, chained.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import time

import jax
import jax.numpy as jnp
import numpy as np

from ground_plane_polling_tpu.models import build_detector
from ground_plane_polling_tpu.ops import anchors as anchor_ops
from ground_plane_polling_tpu.ops import box_coder
from ground_plane_polling_tpu.ops.filtering import _greedy_nms
from ground_plane_polling_tpu.ops.overlap import iou_matrix

IMAGE_SHAPE = (416, 1344)  # pipeline bucket at pad_multiple=32 (was 512x1408 through round 2)
N1, N2 = 5, 25
TOP_K = 1024


def chained(fn, x, scalar_of, label):
    def run(iters):
        carry = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(x + carry)
            carry = scalar_of(out) * 0.0
        np.asarray(carry)
        return time.perf_counter() - t0

    run(2)
    dt = (run(N2) - run(N1)) / (N2 - N1)
    print(f"{label:44s}: {dt*1e3:8.3f} ms", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    model = build_detector("resnet50", num_classes=1, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *IMAGE_SHAPE, 3), jnp.float32))
    images = jnp.asarray(rng.uniform(-128, 128, (1, *IMAGE_SHAPE, 3)),
                         jnp.float32)
    anchors = jnp.asarray(anchor_ops.anchors_for_shape(IMAGE_SHAPE))

    fwd = jax.jit(lambda im: model.apply(variables, im))
    t0 = chained(fwd, images, lambda o: o["regression"][0, 0, 0],
                 "forward only")

    def collapse(im):
        raw = fwd(im)
        cls = raw["classification"][0]
        n = cls.shape[0]
        c4 = cls.reshape(n, 2, 1, 4).max(axis=1)
        return raw, c4.max(axis=(1, 2)), c4.argmax(axis=2)

    t1 = chained(jax.jit(lambda im: collapse(im)[1]), images,
                 lambda o: o[0], "+ sign-collapse / orient select")

    def topk(im):
        raw, best, _ = collapse(im)
        masked = jnp.where(best > 0.05, best, -jnp.inf)
        return jax.lax.top_k(masked, TOP_K)

    t2 = chained(jax.jit(lambda im: topk(im)[0]), images,
                 lambda o: o[0], f"+ top_k({TOP_K}) over all anchors")

    def decode(im):
        raw, best, _ = collapse(im)
        masked = jnp.where(best > 0.05, best, -jnp.inf)
        sc, idx = jax.lax.top_k(masked, TOP_K)
        cls_rows = raw["classification"][0][idx]
        sign = jnp.where(jnp.argmax(cls_rows, axis=-1) < 4, -1.0, 1.0)
        return box_coder.decode_boxes(anchors[idx],
                                      raw["regression"][0][idx], sign), sc

    t3 = chained(jax.jit(lambda im: decode(im)[0]), images,
                 lambda o: o[0, 0], "+ candidate decode")

    def nms(im):
        boxes, sc = decode(im)
        sel, valid, score = _greedy_nms(boxes[:, :4], sc, 100, 0.5)
        return score

    t4 = chained(jax.jit(nms), images, lambda o: o[0],
                 "+ IoU matrix + fixpoint NMS + select")

    print(f"\ndeltas: collapse {1e3*(t1-t0):.3f} | topk {1e3*(t2-t1):.3f} | "
          f"decode {1e3*(t3-t2):.3f} | nms {1e3*(t4-t3):.3f} ms", flush=True)


if __name__ == "__main__":
    main()
