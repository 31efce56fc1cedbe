"""Inference CLI — the reference's retinanet-3D-run-network
(/root/reference/keras_retinanet_3D/bin/run_network.py): run the detector on
a directory of images + calibrations, recover 6-DoF poses, and write .mat
dumps, KITTI-format labels, and composite visualizations.

The entire per-image pipeline (network, decode, NMS, polling, pose) runs as
one jitted device program; the host only does file IO, resizing, and
formatting.

  python -m ground_plane_polling_tpu.bin.run_network model.npz \
      images/ calibs/ planes.mat out/ --kitti --save-images
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def parse_args(argv):
    p = argparse.ArgumentParser(
        description="Run the network on a directory of images.")
    p.add_argument("model_path", help=".npz weights (with .json sidecar)")
    p.add_argument("image_dir")
    p.add_argument("calib_dir")
    p.add_argument("plane_params_path", help=".mat road-plane database")
    p.add_argument("output_dir")
    p.add_argument("--kitti", action="store_true",
                   help="Write KITTI-format result txts.")
    p.add_argument("--batch", type=int, default=1,
                   help="detect N images per device dispatch (grouped by "
                        "padded shape, short groups padded by repeating "
                        "the last frame; per-image outputs match --batch 1 "
                        "to reduction-order ulp — last-digit wobble in the "
                        "txt fields on TPU bf16). Batching amortizes the "
                        "dispatch "
                        "overhead: b4 with --int8 --fuse-towers is the "
                        "measured serving sweet spot "
                        "(docs/PERFORMANCE.md).")
    p.add_argument("--prep-threads", type=int,
                   default=max(1, min(4, (os.cpu_count() or 1) - 1)),
                   help="host decode/resize threads feeding the device "
                        "(bounded prefetch, outputs identical to serial; "
                        "the directory loop is host-decode-bound on small "
                        "hosts — docs/PERFORMANCE.md)")
    p.add_argument("--save-images", action="store_true",
                   help="Write composite 2D/3D visualization images.")
    p.add_argument("--backbone", default=None,
                   help="Override the sidecar's backbone name.")
    p.add_argument("--score-threshold", type=float, default=0.05)
    p.add_argument("--class-names", nargs="+", default=["Car"],
                   help="KITTI type string per class id for the txt "
                        "output (multi-class models; default Car)")
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--no-bf16", dest="bf16", action="store_false")
    p.add_argument("--int8", type=int, nargs="?", const=8, default=0,
                   metavar="N",
                   help="run the conv trunk int8 (PTQ, ~2x MXU rate), "
                        "calibrating on the first N images (default 8)")
    p.add_argument("--int8-percentile", type=float, default=100.0,
                   help="clip calibrated ranges to this percentile of |x| "
                        "(100 = absmax; 99.9-99.99 typically recovers "
                        "accuracy, docs/PERFORMANCE.md)")
    p.add_argument("--fuse-towers", action="store_true",
                   help="run the cls+dim heads as one block-diagonal tower "
                        "(identical outputs, faster on TPU)")
    p.add_argument("--image-min-side", type=int, default=800,
                   help="resize so the short side is this (reference "
                        "utils/image.py:174 hardcodes 800)")
    p.add_argument("--image-max-side", type=int, default=1333)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv if argv is not None else sys.argv[1:])

    import jax
    import jax.numpy as jnp
    import scipy.io

    from ..data.pipeline import prepare_network_frame
    from ..data.planes import load_plane_database
    from ..inference import make_detect_fn
    from ..models import build_detector
    from ..training.checkpoint import device_resident, import_params
    from ..utils.kitti_writer import write_kitti_file
    from ..utils.visualization import (draw_3d_detections_from_pose,
                                       draw_detections_with_keypoints)

    cfg = {}
    if os.path.exists(args.model_path + ".json"):
        with open(args.model_path + ".json") as f:
            cfg = json.load(f)
    backbone = args.backbone or cfg.get("backbone", "resnet50")
    num_classes = cfg.get("num_classes", 1)

    if args.model_path.endswith((".h5", ".hdf5")):
        # reference Keras checkpoint: map weights directly (models/h5_import)
        from ..models.h5_import import load_reference_h5

        variables = load_reference_h5(args.model_path, backbone=backbone)
        # no .json sidecar for a direct h5: infer the anchor count from
        # the box-regression out-conv (A * 12 channels), then num_classes
        # from the classification out-conv (A * 8 * C channels)
        box_out_ch = variables["params"]["regression"]["box_out"][
            "bias"].shape[0]
        cls_out_ch = variables["params"]["classification"]["cls_out"][
            "bias"].shape[0]
        num_anchors = box_out_ch // 12
        if (box_out_ch % 12 or num_anchors != 12
                or cls_out_ch % (num_anchors * 8)):
            # load_reference_h5 itself only maps the default 12-anchor
            # layout, so anything else must fail loudly here rather than
            # as an opaque reshape error downstream
            raise ValueError(
                f"cannot infer num_classes from h5 head shapes "
                f"(box_out={box_out_ch}, cls_out={cls_out_ch}); the h5 "
                f"import path supports the reference's 12-anchor layout "
                f"(box 12*12=144, cls 12*8*C channels) only")
        num_classes = cls_out_ch // (num_anchors * 8)
    else:
        variables = import_params(args.model_path)
    model = build_detector(
        backbone, num_classes=num_classes,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        fuse_cls_dim=args.fuse_towers)
    if args.fuse_towers:
        from ..models import fuse_detector_params

        variables = fuse_detector_params(variables)
    # one upload instead of one per dispatch (see device_resident docstring)
    variables = device_resident(variables)
    planes = load_plane_database(args.plane_params_path)

    out_root = os.path.join(
        args.output_dir,
        os.path.basename(args.model_path).rsplit(".", 1)[0])
    os.makedirs(os.path.join(out_root, "outputs", "full"), exist_ok=True)
    if args.kitti:
        os.makedirs(os.path.join(out_root, "outputs", "kitti"), exist_ok=True)
    if args.save_images:
        os.makedirs(os.path.join(out_root, "images", "composite"),
                    exist_ok=True)

    detect_fns = {}
    quant_scales = None

    def get_fn(shape):
        if shape not in detect_fns:
            detect_fns[shape] = make_detect_fn(
                model, shape, num_classes=num_classes, with_pose=True,
                nms=cfg.get("nms", True),
                class_specific=cfg.get("class_specific_filter", True),
                orientation_specific=cfg.get("orientation_specific_filter",
                                             False),
                # the COMPILED filter must honour the CLI threshold —
                # otherwise --score-threshold below the 0.05 default is
                # silently ineffective (candidates are masked on device)
                score_threshold=args.score_threshold,
                quant_scales=quant_scales,
                device_preprocess=True)
        return detect_fns[shape]

    def prepare(fn_txt):
        """One frame via the shared host-side contract
        (data.pipeline.prepare_network_frame — same path as serve)."""
        image_fp = None
        for ext in (".png", ".jpg"):
            cand = os.path.join(args.image_dir, fn_txt.replace(".txt", ext))
            if os.path.exists(cand):
                image_fp = cand
                break
        if image_fp is None:
            return None
        fr = prepare_network_frame(
            image_fp, os.path.join(args.calib_dir, fn_txt),
            args.image_min_side, args.image_max_side)
        # start this frame's host->device copy NOW (device_put is async):
        # uploads stream from the prep threads while earlier batches
        # compute, instead of one blocking batch-sized transfer at
        # dispatch (227 ms per b4 dispatch on the relay — the post-fix
        # wall's biggest slice, tools/probe_run_network_wall.py)
        return (image_fp, fr["raw"], fr["scale"], fr["image"], fr["P"],
                fr["P_inv"], jax.device_put(fr["image"]))

    calib_files = sorted(f for f in os.listdir(args.calib_dir)
                         if f.endswith(".txt"))

    prepared = {}  # int8-calibration frames, reused by the main loop
    if args.int8:
        from ..models.quantize import collect_scales_uint8

        canvases = []
        for fn_txt in calib_files:
            prep = prepare(fn_txt)
            prepared[fn_txt] = prep
            if prep is not None:
                canvases.append(prep[3])
            if len(canvases) >= args.int8:
                break
        if canvases:
            quant_scales = collect_scales_uint8(
                model, variables, canvases,
                percentile=args.int8_percentile)

    def write_outputs(prep, out, j):
        """Write one image's .mat / KITTI txt / composite from row j of a
        (possibly batched) detect output already fetched to the host."""
        image_fp, raw, scale, image, P, P_inv, _ = prep
        keep = out["scores"][j] > args.score_threshold
        boxes = out["boxes"][j][keep] / scale
        scores = out["scores"][j][keep]
        labels = out["labels"][j][keep]
        orientations = out["orientations"][j][keep]
        keypoints = out["keypoints"][j][keep].reshape(-1, 12)
        keyplanes = out["keyplanes"][j][keep].reshape(-1, 4)
        residuals = out["residuals"][j][keep]
        locations = out["locations"][j][keep]
        angles = out["angles"][j][keep]
        dims = out["pose_dims"][j][keep]

        stem = os.path.basename(image_fp).rsplit(".", 1)[0]
        scipy.io.savemat(
            os.path.join(out_root, "outputs", "full", stem + ".mat"),
            {"boxes": boxes[:, :4], "keypoints": boxes[:, 4:],
             "labels": labels, "scores": scores, "locations": locations,
             "angles": angles, "dimensions": dims, "residuals": residuals,
             "keyplanes": keyplanes, "keypoints3d": keypoints})

        if args.kitti:
            names = [args.class_names[int(l)]
                     if 0 <= int(l) < len(args.class_names) else "Car"
                     for l in labels]
            write_kitti_file(
                os.path.join(out_root, "outputs", "kitti", stem + ".txt"),
                boxes, scores, locations, angles, dims, raw.shape[:2],
                class_name=names)

        if args.save_images:
            from PIL import Image

            top = draw_detections_with_keypoints(
                raw.copy(), boxes, scores, labels, orientations,
                score_threshold=0.4)
            bottom = draw_3d_detections_from_pose(
                raw.copy(), boxes[:, :4], orientations, residuals, scores,
                labels, locations, angles, dims, P, score_threshold=0.4)
            comp = np.vstack([top, bottom])
            Image.fromarray(comp[:, :, ::-1]).save(
                os.path.join(out_root, "images", "composite",
                             stem + ".png"))

    # Batched directory loop (reference analog: the strictly per-image loop
    # at /root/reference/keras_retinanet_3D/bin/run_network.py:90-135).
    # Frames are bucketed by padded canvas shape as they stream in; a bucket
    # dispatches as soon as it holds a full batch, remainders are padded by
    # repeating the last frame (padding rows discarded). One batch stays in
    # flight so host decode + file writes overlap device compute — the same
    # pipeline shape as serve.py, with bounded memory (<= batch frames per
    # distinct canvas shape held at once).
    batch = max(1, args.batch)
    # the plane DB is shared by every frame: upload the tiled copy once
    # (the real KITTI DB is ~21k planes — re-uploading it per dispatch
    # costs megabytes through the relay for a constant input)
    planes_dev = jnp.asarray(np.tile(planes[None], (batch, 1, 1)),
                             jnp.float32)
    n_done = 0
    t_start = time.time()
    pending = None  # (chunk, device out, dispatch time)

    def dispatch(chunk):
        fn_detect = get_fn(chunk[0][3].shape[:2])
        padded = chunk + [chunk[-1]] * (batch - len(chunk))
        # canvases were device_put as they decoded (prepare); stacking on
        # device makes the dispatch wire-free except tiny P_inv rows
        out = fn_detect(
            variables,
            jnp.stack([p[6] for p in padded]),
            jnp.asarray(np.stack([p[5] for p in padded]), jnp.float32),
            planes_dev)
        return chunk, out, time.time()

    def finalize(pend):
        nonlocal n_done
        chunk, out, t0 = pend
        # jax.device_get starts copy_to_host_async on every field before
        # blocking, so the 11 small output pulls share one relay round-trip
        # window instead of paying 11 serial ones (per-field np.asarray
        # cost ~0.3 s/dispatch — tools/probe_run_network_wall.py)
        out = jax.device_get(out._asdict())
        for j, prep in enumerate(chunk):
            write_outputs(prep, out, j)
        dt = max(time.time() - t0, 1e-9)
        first = n_done
        n_done += len(chunk)
        label = (f"Image {first}" if len(chunk) == 1 else
                 f"Images {first}-{n_done - 1}")
        print(f"{label}: frame rate: {len(chunk) / dt:.2f}")

    def prepared_frames():
        """Yield (calib filename, prepared frame) in calib_files order.

        With --prep-threads > 1, frames decode on a bounded thread pool
        (PIL/cv2 release the GIL during decode) so host prep runs ahead of
        the device; order and per-frame results are identical to the
        serial path. Frames already decoded for int8 calibration are
        reused either way."""
        if args.prep_threads <= 1:
            for fn in calib_files:
                yield fn, (prepared.pop(fn) if fn in prepared
                           else prepare(fn))
            return
        import collections
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(args.prep_threads) as pool:
            q = collections.deque()
            it = iter(calib_files)

            def submit_next():
                fn = next(it, None)
                if fn is None:
                    return
                if fn in prepared:
                    q.append((fn, None, prepared.pop(fn)))
                else:
                    q.append((fn, pool.submit(prepare, fn), None))

            for _ in range(2 * args.prep_threads):
                submit_next()
            while q:
                fn, fut, val = q.popleft()
                submit_next()
                yield fn, (val if fut is None else fut.result())

    buckets = {}
    for fn, prep in prepared_frames():
        if prep is None:
            continue
        shape = prep[3].shape[:2]
        buckets.setdefault(shape, []).append(prep)
        if len(buckets[shape]) == batch:
            dispatched = dispatch(buckets.pop(shape))
            if pending is not None:
                finalize(pending)
            pending = dispatched
    for chunk in buckets.values():  # padded remainders
        dispatched = dispatch(chunk)
        if pending is not None:
            finalize(pending)
        pending = dispatched
    if pending is not None:
        finalize(pending)
    if n_done:
        dt = time.time() - t_start
        print(f"done: {n_done} images in {dt:.2f}s "
              f"({n_done / max(dt, 1e-9):.1f} img/s)")


if __name__ == "__main__":
    main()
