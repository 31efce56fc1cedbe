"""Where does the training-step WALL time go on the relay-attached chip?

tools/bench_train.py measures the pure device step (~53 ms at batch 2).
Real training (bin/train.py) measures ~235 ms/step wall. This tool splits
the residual into its parts on the real loader + real chip:

  A. host decode+resize+pad per batch (producer-thread work, numpy/PIL/C++)
  B. _device_prepare dispatch + completion (uint8 upload, device-side
     augmentation + anchor-target assignment) on pre-decoded host arrays
  C. pure train_step on a prepared device batch (bench_train's number)
  D. the real pipelined loop: loader.epoch() + train_step, wall per step
  E. PROTOTYPE: prepare+train fused into ONE jitted call (single relay
     dispatch per step) on pre-decoded host arrays

If B+C >> C and E ~= C, the two-dispatch structure (one RPC for prepare in
the producer thread, one for the step) is the bottleneck and fusing them
into the train step is the fix. If A dominates, the host decode is.

Usage:  python tools/profile_train_wall.py /tmp/full_res_kitti  [steps]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from ground_plane_polling_tpu.data.pipeline import (KittiLoader,
                                                    _device_prepare)
from ground_plane_polling_tpu.data.kitti import KittiDataset
from ground_plane_polling_tpu.models import build_detector
from ground_plane_polling_tpu.training.train import (create_train_state,
                                                     make_optimizer,
                                                     make_train_step)

BATCH = int(os.environ.get("GPP_BENCH_BATCH", 2))
BACKBONE = os.environ.get("GPP_PROFILE_BACKBONE", "resnet50")
MIN_SIDE = int(os.environ.get("GPP_PROFILE_MIN_SIDE", 800))
MAX_SIDE = int(os.environ.get("GPP_PROFILE_MAX_SIDE", 1333))


def sync(tree):
    # block_until_ready is unreliable on the relay; a tiny host fetch of a
    # freshly-computed scalar is the honest barrier
    leaves = jax.tree_util.tree_leaves(tree)
    float(jnp.sum(leaves[0][(0,) * leaves[0].ndim]))


def timed(label, fn, steps, per_batch=1):
    fn()  # warm (compile)
    t0 = time.perf_counter()
    for _ in range(steps):
        fn()
    dt = (time.perf_counter() - t0) / steps
    print(f"{label:58s} {dt * 1e3 / per_batch:8.1f} ms/step")
    return dt / per_batch


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/full_res_kitti"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 15

    ds = KittiDataset(root, "train")
    loader = KittiLoader(ds, batch_size=BATCH, augment=True, shuffle=False,
                         image_min_side=MIN_SIDE, image_max_side=MAX_SIDE)
    shape = loader.image_shape
    print(f"dataset {len(ds)} images, bucket {shape}, batch {BATCH}")

    # ---- host-side raw items for one group of each batch ----------------
    groups = [g for g in loader._groups
              if tuple(loader._bucket_shape[g[0][0]]) == tuple(shape)]
    group = groups[0]
    items = [loader._load_padded(i) for i in group[0]]
    images, ga, gm, ia, im_, _, sizes = map(np.stack, zip(*items))
    # the group's real padding mask — all-True would make B/C/E measure a
    # different program than the real loops decompose
    valid = np.arange(len(group[0])) < group[1]
    key = jax.random.PRNGKey(0)

    prep_kwargs = dict(num_classes=ds.num_classes, do_augment=True,
                       config=loader.augment_config,
                       image_shape=tuple(images.shape[1:3]))

    # ---- model/step -----------------------------------------------------
    model = build_detector(BACKBONE, num_classes=ds.num_classes,
                           dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *shape, 3), jnp.float32))
    tx = make_optimizer()
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx)

    # A. host decode (per batch) — call the underlying loader path
    timed("A  host decode+resize+pad (batch)",
          lambda: [loader._load_padded(i) for i in group[0]], steps)

    # B. _device_prepare round trip on host arrays
    def run_prepare():
        out = _device_prepare(key, images, ga, gm, ia, im_, valid,
                              sizes, **prep_kwargs)
        sync(out["labels"])
    timed("B  _device_prepare dispatch+sync", run_prepare, steps)

    # C. pure device train step on a prepared batch
    prepared = _device_prepare(key, images, ga, gm, ia, im_, valid,
                               sizes, **prep_kwargs)
    prepared = jax.tree_util.tree_map(jnp.asarray, prepared)
    st = [state]

    def run_step():
        st[0], m = step(st[0], prepared)
        float(m["loss"])
    timed("C  train_step dispatch+sync (prepared batch)", run_step, steps)

    # D. the real pipelined loop
    st2 = [st[0]]

    def real_loop(mk_loader, step_fn, state0):
        it = iter(mk_loader.epoch())
        state0, m = step_fn(state0, next(it))  # producer + compile warm
        float(m["loss"])
        t0 = time.perf_counter()
        n = 0
        for batch in it:
            state0, m = step_fn(state0, batch)
            n += 1
            if n >= steps:
                break
        float(m["loss"])
        if n == 0:
            raise SystemExit(
                "dataset's dominant bucket yields a single batch per "
                "epoch — nothing left to time after warm-up; use a "
                "larger dataset or smaller GPP_BENCH_BATCH")
        if n < steps:
            print(f"   (real-loop average over {n} steps, epoch exhausted)")
        return (time.perf_counter() - t0) / n, state0

    dt, st2[0] = real_loop(loader, step, st2[0])
    print(f"{'D  REAL loop (loader.epoch + train_step)':58s} "
          f"{dt * 1e3:8.1f} ms/step")

    # E. fused prepare+train in ONE jitted dispatch
    @jax.jit
    def fused(key, state, images, ga, gm, ia, im_, valid, sizes):
        batch = _device_prepare(key, images, ga, gm, ia, im_, valid,
                                sizes, **prep_kwargs)
        return step(state, batch)

    st3 = [st2[0]]

    def run_fused():
        st3[0], m = fused(key, st3[0], images, ga, gm, ia, im_, valid,
                          sizes)
        float(m["loss"])
    timed("E  FUSED prepare+train one dispatch (sync/step)", run_fused,
          steps)

    # F. fused in the REAL loop shape: raw-batch loader (host decode on
    # the producer thread), fused dispatches chained by state donation,
    # one sync at the end — directly comparable to D
    raw_loader = KittiLoader(ds, batch_size=BATCH, augment=True,
                             shuffle=False, raw_batches=True,
                             image_min_side=MIN_SIDE,
                             image_max_side=MAX_SIDE)
    from ground_plane_polling_tpu.training.train import make_fused_train_step
    fused_step = make_fused_train_step(model, tx, ds.num_classes,
                                       augment=True)
    st4 = [st3[0]]
    dt, st4[0] = real_loop(raw_loader, fused_step, st4[0])
    print(f"{'F  REAL loop FUSED (raw loader + fused step)':58s} "
          f"{dt * 1e3:8.1f} ms/step")

    # phase-fair A/B: alternate D and F a few more times (relay throughput
    # is bimodal on minute scales; back-to-back singles can lie)
    for r in range(3):
        dt_d, st2[0] = real_loop(loader, step, st2[0])
        dt_f, st4[0] = real_loop(raw_loader, fused_step, st4[0])
        print(f"{'   A/B round %d: two-stage vs fused' % r:58s} "
              f"{dt_d * 1e3:8.1f} vs {dt_f * 1e3:.1f} ms/step")


if __name__ == "__main__":
    main()
