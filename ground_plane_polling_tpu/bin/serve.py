"""Batched micro-serving CLI: watch a directory, detect in fixed-size
batches, write KITTI-format results as images arrive.

The reference's deployment story is run_network's one-image-at-a-time loop
(/root/reference/keras_retinanet_3D/bin/run_network.py:90-135). On TPU,
batching amortizes the per-dispatch overhead (round-3 sweep at the
416x1344 bucket: 221 img/s aggregate at batch 2, saturating ~215-220 from
there — docs/PERFORMANCE.md), so this service micro-batches: new images are grouped by padded shape into
fixed-size batches (short groups padded by repeating the last image — the
padding rows are discarded), run through ONE compiled program per shape,
and written out per image.

  python -m ground_plane_polling_tpu.bin.serve model.npz \
      incoming_images/ calibs/ planes.mat out/ --batch-size 8 [--once]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def parse_args(argv):
    p = argparse.ArgumentParser(
        description="Micro-batching detection service over a directory.")
    p.add_argument("model_path", help=".npz weights (with .json sidecar)")
    p.add_argument("image_dir", help="directory to watch for images")
    p.add_argument("calib_dir")
    p.add_argument("plane_params_path")
    p.add_argument("output_dir")
    p.add_argument("--batch-size", type=int, default=2,
               help="round-3 sweep: batch 2 is the aggregate-throughput\n"
                    "sweet spot (221 img/s vs 215 at b8) at the lowest\n"
                    "latency; see docs/PERFORMANCE.md")
    p.add_argument("--poll-interval", type=float, default=0.5)
    p.add_argument("--class-names", nargs="+", default=["Car"],
                   help="KITTI type string per class id for the txt "
                        "output (multi-class models; default Car)")
    p.add_argument("--once", action="store_true",
                   help="process what's there, then exit (no watching)")
    p.add_argument("--score-threshold", type=float, default=0.05)
    p.add_argument("--backbone", default=None)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--no-bf16", dest="bf16", action="store_false")
    p.add_argument("--fuse-towers", action="store_true",
                   help="run the cls+dim heads as one block-diagonal tower "
                        "(identical outputs, faster on TPU)")
    p.add_argument("--int8", type=int, nargs="?", const=8, default=0,
                   metavar="N",
                   help="run the conv trunk int8 (PTQ, ~2x MXU rate), "
                        "calibrating activation scales on the first N "
                        "served images (default 8)")
    p.add_argument("--int8-percentile", type=float, default=100.0,
                   help="clip calibrated ranges to this percentile of |x| "
                        "(100 = absmax; 99.9-99.99 typically recovers "
                        "accuracy, docs/PERFORMANCE.md)")
    p.add_argument("--image-min-side", type=int, default=800,
                   help="resize so the short side is this (reference "
                        "utils/image.py:174 hardcodes 800)")
    p.add_argument("--image-max-side", type=int, default=1333)
    return p.parse_args(argv)


def _intake_cap(batch_size, int8_n):
    """Max images decoded (and device_put) per poll round: a few batches'
    worth keeps the upload/compute overlap fed without staging an
    unbounded backlog in HBM; int8 calibration needs its full sample in
    the first round (scales are collected before the first dispatch)."""
    return max(4 * batch_size, int(int8_n or 0))


def main(argv=None):
    args = parse_args(argv if argv is not None else sys.argv[1:])

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..data.pipeline import prepare_network_frame
    from ..data.planes import load_plane_database
    from ..inference import make_detect_fn
    from ..models import build_detector
    from ..training.checkpoint import device_resident, import_params
    from ..utils.kitti_writer import write_kitti_file

    cfg = {}
    if os.path.exists(args.model_path + ".json"):
        with open(args.model_path + ".json") as f:
            cfg = json.load(f)
    backbone = args.backbone or cfg.get("backbone", "resnet50")
    num_classes = cfg.get("num_classes", 1)

    variables = import_params(args.model_path)
    model = build_detector(
        backbone, num_classes=num_classes,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        fuse_cls_dim=args.fuse_towers)
    if args.fuse_towers:
        from ..models import fuse_detector_params

        variables = fuse_detector_params(variables)
    # one upload instead of one per micro-batch (see device_resident docstring)
    variables = device_resident(variables)
    planes = load_plane_database(args.plane_params_path)
    # shared constant input: upload the tiled plane DB once, not per batch
    planes_dev = jnp.asarray(
        np.tile(planes[None].astype(np.float32), (args.batch_size, 1, 1)))
    os.makedirs(args.output_dir, exist_ok=True)

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
                # compile the filter at the CLI threshold (see
                # run_network.get_fn — a lower --score-threshold must
                # not be silently masked by the on-device default)
                score_threshold=args.score_threshold,
                quant_scales=quant_scales,
                device_preprocess=True)
        return detect_fns[shape]

    def load_item(stem):
        # match the watcher's case-insensitive listing (0001.PNG must not
        # be listed, missed here, and silently marked done)
        for ext in (".png", ".jpg", ".PNG", ".JPG"):
            fp = os.path.join(args.image_dir, stem + ext)
            if os.path.exists(fp):
                break
        else:
            return None
        fr = prepare_network_frame(
            fp, os.path.join(args.calib_dir, stem + ".txt"),
            args.image_min_side, args.image_max_side)
        return {"stem": stem, "shape": fr["shape"], "scale": fr["scale"],
                "image": fr["image"], "P_inv": fr["P_inv"],
                "image_hw": fr["raw"].shape[:2],
                # start the host->device copy at decode time: the canvas
                # streams up while earlier batches compute instead of one
                # blocking batch-sized transfer at dispatch (same fix as
                # run_network; tools/probe_run_network_wall.py)
                "image_dev": jax.device_put(fr["image"])}

    def dispatch_batch(items):
        """items share one padded shape; pads to batch_size by repetition.
        Returns immediately with device arrays still in flight (jax
        dispatch is async) — the caller overlaps the next batch's host
        work and dispatch with this one's device time + relay RTT."""
        n = len(items)
        items = items + [items[-1]] * (args.batch_size - n)
        fn = get_fn(items[0]["shape"])
        out = fn(
            variables,
            jnp.stack([it["image_dev"] for it in items]),
            np.stack([it["P_inv"] for it in items]),
            planes_dev)
        return n, items, out, time.time()

    def finalize_batch(pending):
        """Fetch a dispatched batch to the host and write its outputs."""
        n, items, out, t_disp = pending
        # overlapped pull: device_get async-copies every field before
        # blocking (vs 11 serial relay round-trips — see run_network)
        out = jax.device_get(out._asdict())
        for j in range(n):
            it = items[j]
            keep = out["scores"][j] > args.score_threshold
            names = [args.class_names[int(l)]
                     if 0 <= int(l) < len(args.class_names) else "Car"
                     for l in out["labels"][j][keep]]
            write_kitti_file(
                os.path.join(args.output_dir, it["stem"] + ".txt"),
                out["boxes"][j][keep] / it["scale"], out["scores"][j][keep],
                out["locations"][j][keep], out["angles"][j][keep],
                out["pose_dims"][j][keep], it["image_hw"],
                class_name=names)
        # dispatch -> outputs-on-disk latency for this batch (includes the
        # overlap window: with the 1-deep pipeline the fetch waits behind
        # the next batch's dispatch, which is what a consumer experiences)
        latencies.append(time.time() - t_disp)
        return n

    done = set()
    fail_counts: dict = {}
    latencies: list = []
    total = 0
    t_start = time.time()
    # bound how much backlog one round decodes: every loaded item holds a
    # device-resident canvas (~1.7 MB at 416x1344), so sweeping an
    # unbounded `fresh` list would stage the WHOLE backlog in HBM before
    # the first dispatch. Leftover stems stay un-done and are picked up
    # by the next round immediately (no poll sleep while fresh is
    # non-empty), so a big backlog drains in bounded-memory rounds.
    intake_cap = _intake_cap(args.batch_size, args.int8)
    while True:
        # set-dedupe: stem.png + stem.jpg must not process twice
        stems = sorted({
            f.rsplit(".", 1)[0] for f in os.listdir(args.image_dir)
            if f.lower().endswith((".png", ".jpg"))})
        fresh = [s for s in stems if s not in done
                 and os.path.exists(os.path.join(args.calib_dir, s + ".txt"))]
        if not fresh:
            if args.once:
                break
            time.sleep(args.poll_interval)
            continue
        fresh = fresh[:intake_cap]

        buckets = {}
        for stem in fresh:
            # a watcher must survive partially-written / corrupt frames:
            # a file listed mid-copy fails to decode — retry it on later
            # polls, give up (and log) after a few attempts
            try:
                item = load_item(stem)
            except Exception as e:  # noqa: BLE001 — skip-and-retry
                fail_counts[stem] = fail_counts.get(stem, 0) + 1
                if fail_counts[stem] >= 5 or args.once:
                    print(f"skipping {stem}: {e}", file=sys.stderr)
                    done.add(stem)
                continue
            if item is not None:
                buckets.setdefault(item["shape"], []).append(item)
            done.add(stem)
        if args.int8 and quant_scales is None and buckets:
            # one-shot PTQ calibration on the first arrivals (before any
            # detect fn is compiled, so every shape's program runs int8)
            from ..models.quantize import collect_scales_uint8

            canvases = [it["image"] for its in buckets.values()
                        for it in its][:args.int8]
            quant_scales = collect_scales_uint8(
                model, variables, canvases,
                percentile=args.int8_percentile)
            print(f"int8: calibrated on {len(canvases)} images", flush=True)
        t0 = time.time()
        n_round = 0
        pending = None  # one batch in flight: overlap fetch+writes with compute
        for shape, items in buckets.items():
            for st in range(0, len(items), args.batch_size):
                dispatched = dispatch_batch(items[st:st + args.batch_size])
                if pending is not None:
                    n_round += finalize_batch(pending)
                pending = dispatched
        if pending is not None:
            n_round += finalize_batch(pending)
        total += n_round
        dt = time.time() - t0
        print(f"served {n_round} images in {dt:.2f}s "
              f"({n_round / max(dt, 1e-9):.1f} img/s); total {total}",
              flush=True)
        # no --once break here: a backlog bigger than intake_cap must
        # drain over further rounds; the empty-`fresh` check above is
        # the only --once exit, so nothing is silently dropped
    if total:
        line = f"done: {total} images in {time.time() - t_start:.2f}s"
        if latencies:
            lat = np.sort(np.asarray(latencies))
            p50 = lat[len(lat) // 2]
            p95 = lat[min(len(lat) - 1, int(np.ceil(0.95 * len(lat))) - 1)]
            line += (f"; batch latency p50 {p50*1e3:.0f} ms / "
                     f"p95 {p95*1e3:.0f} ms (n={len(lat)})")
        print(line, flush=True)
    return total


if __name__ == "__main__":
    main()
