"""Decompose bin/run_network's per-image wall time on the real chip.

The r4d directory-throughput run measured ~0.3 img/s at every batch size
(3.5 s/image, cost scaling per-image not per-dispatch) while the knee
profiler got 184-243 img/s on device-resident inputs minutes earlier.
This probe times each candidate stage of the CLI's dispatch in isolation:

  host   prepare_network_frame (decode+resize+pad+calib)
  upload device_put of the uint8 canvas batch, blocked
  device detect fn with device-resident inputs (serialized)
  e2e    detect fn called with numpy inputs (upload + compute)
  pull   full DetectionOutput._asdict() -> np.asarray of every field
  write  .mat + KITTI txt for one frame's rows

Usage: tools/tpu_run.sh python tools/probe_run_network_wall.py \
    /tmp/full_res_long/model.npz /tmp/full_res_kitti40
Env: GPP_PROBE_BATCHES (default "1,4"), GPP_PROBE_ITERS (default 10).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

BATCHES = [int(b) for b in
           os.environ.get("GPP_PROBE_BATCHES", "1,4").split(",")]
ITERS = int(os.environ.get("GPP_PROBE_ITERS", 10))


def timed(label, fn, iters=ITERS):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    dt = (time.perf_counter() - t0) / iters
    print(f"  {label:<44} {dt * 1e3:9.1f} ms", flush=True)
    return dt


def main():
    model_path, data_root = sys.argv[1], sys.argv[2]

    from ground_plane_polling_tpu.data.pipeline import prepare_network_frame
    from ground_plane_polling_tpu.data.planes import load_plane_database
    from ground_plane_polling_tpu.inference import make_detect_fn
    from ground_plane_polling_tpu.models import build_detector
    from ground_plane_polling_tpu.training.checkpoint import (
        device_resident, import_params)

    img_dir = os.path.join(data_root, "val", "images")
    calib_dir = os.path.join(data_root, "val", "calibs")
    stems = sorted(f.rsplit(".", 1)[0] for f in os.listdir(img_dir))
    image_fp = os.path.join(img_dir, stems[0] + ".png")
    calib_fp = os.path.join(calib_dir, stems[0] + ".txt")

    variables = device_resident(import_params(model_path))
    model = build_detector("resnet50", num_classes=1, dtype=jnp.bfloat16)
    planes = load_plane_database(
        os.path.join(data_root, "road_planes_database.mat"))

    print(f"probe: {image_fp}, planes {planes.shape}", flush=True)
    fr = prepare_network_frame(image_fp, calib_fp, 800, 1333)
    shape = fr["shape"]
    print(f"canvas {shape}, upload {np.prod(fr['image'].shape)/2**20:.2f} "
          f"MiB/frame", flush=True)

    timed("host: prepare_network_frame",
          lambda: prepare_network_frame(image_fp, calib_fp, 800, 1333))

    for b in BATCHES:
        print(f"-- batch {b}", flush=True)
        canvas_np = np.stack([fr["image"]] * b)
        pinv_np = np.stack([fr["P_inv"]] * b)
        planes_np = np.tile(planes[None], (b, 1, 1)).astype(np.float32)

        timed(f"upload: device_put uint8 canvas ({b},{shape})",
              lambda: jax.block_until_ready(jax.device_put(canvas_np)))

        fn = make_detect_fn(model, shape, num_classes=1, with_pose=True,
                            device_preprocess=True)
        canvas_dev = jax.device_put(canvas_np)
        pinv_dev = jax.device_put(pinv_np)
        planes_dev = jax.device_put(planes_np)

        timed("device: detect, device-resident inputs",
              lambda: jax.block_until_ready(
                  fn(variables, canvas_dev, pinv_dev, planes_dev)))

        timed("e2e: detect, numpy inputs (upload+compute)",
              lambda: jax.block_until_ready(
                  fn(variables, canvas_np, pinv_np, planes_dev)))

        out_hold = fn(variables, canvas_np, pinv_np, planes_dev)

        def pull():
            return {k: np.asarray(v) for k, v in out_hold._asdict().items()}

        # NOTE: pulling `out_hold` twice reads a cached host copy — a
        # fresh output must be dispatched per iteration to measure real
        # transfer cost, hence the two `full:` variants below. The fresh
        # serial pull costs full_serial - e2e (~270-280 ms on the relay:
        # 11 blocking round-trips); device_get overlaps them.
        out_np = pull()

        def dispatch_and_pull():
            o = fn(variables, canvas_np, pinv_np, planes_dev)
            return {k: np.asarray(v) for k, v in o._asdict().items()}

        timed("full: dispatch + serial np.asarray pull",
              dispatch_and_pull)

        def dispatch_and_device_get():
            o = fn(variables, canvas_np, pinv_np, planes_dev)
            return jax.device_get(o._asdict())

        timed("full: dispatch + jax.device_get pull (the CLI path)",
              dispatch_and_device_get)

    import scipy.io

    from ground_plane_polling_tpu.utils.kitti_writer import write_kitti_file

    keep = out_np["scores"][0] > 0.05
    os.makedirs("/tmp/probe_out", exist_ok=True)

    def write_one():
        scipy.io.savemat("/tmp/probe_out/x.mat",
                         {k: v[0][keep] for k, v in out_np.items()
                          if v.ndim >= 2})
        write_kitti_file(
            "/tmp/probe_out/x.txt", out_np["boxes"][0][keep][:, :4],
            out_np["scores"][0][keep], out_np["locations"][0][keep],
            out_np["angles"][0][keep], out_np["pose_dims"][0][keep],
            fr["raw"].shape[:2])

    timed("write: savemat + kitti txt (one frame)", write_one)


if __name__ == "__main__":
    main()
