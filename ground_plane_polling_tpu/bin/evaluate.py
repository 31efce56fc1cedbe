"""Standalone evaluation CLI: mAP per class-orientation bucket +
keypoint/h/w/l L1 errors on a prepared KITTI split from exported weights.

(The reference only evaluates inside the training callback,
callbacks/eval.py; this exposes the same sweep offline.)

  python -m ground_plane_polling_tpu.bin.evaluate model.npz kitti-data \
      --subset val
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_args(argv):
    p = argparse.ArgumentParser(description="Evaluate a GPP model.")
    p.add_argument("model_path", help=".npz weights (with .json sidecar)")
    p.add_argument("kitti_path")
    p.add_argument("--subset", default="val")
    p.add_argument("--score-threshold", type=float, default=0.05)
    p.add_argument("--iou-threshold", type=float, default=0.5)
    p.add_argument("--max-detections", type=int, default=100)
    p.add_argument("--image-min-side", type=int, default=800)
    p.add_argument("--image-max-side", type=int, default=1333)
    p.add_argument("--backbone", default=None)
    p.add_argument("--data-parallel", action="store_true",
                   help="shard the eval sweep over all devices (mesh-sized "
                        "batches of same-shape images; identical results)")
    p.add_argument("--fuse-towers", action="store_true",
                   help="run the cls+dim heads as one block-diagonal tower "
                        "(identical outputs, faster on TPU)")
    p.add_argument("--eval-batch", type=int, default=None,
                   help="single-device eval batch (same-shape images "
                        "grouped; identical results, ~30%% faster at >=4; "
                        "default 4; ignored under --data-parallel)")
    p.add_argument("--int8", type=int, nargs="?", const=8, default=0,
                   metavar="N",
                   help="run the conv trunk int8 (PTQ, ~2x MXU rate), "
                        "calibrating activation scales on the first N "
                        "eval images (default 8). Parity evals should "
                        "stay float — int8 trades a small accuracy delta "
                        "for speed (docs/PERFORMANCE.md)")
    p.add_argument("--int8-percentile", type=float, default=100.0,
                   help="clip each conv input's calibrated range to this "
                        "percentile of |x| (100 = absmax). Outlier "
                        "activations stretch the int8 grid; 99.9-99.99 "
                        "typically recovers accuracy (docs/PERFORMANCE.md)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv if argv is not None else sys.argv[1:])

    import os

    from ..data.kitti import KittiDataset
    from ..data.pipeline import KittiLoader
    from ..models import build_detector
    from ..training.checkpoint import device_resident, import_params
    from ..training.loop import evaluate_model
    from ..training.train import TrainState

    import jax.numpy as jnp

    cfg = {}
    if os.path.exists(args.model_path + ".json"):
        with open(args.model_path + ".json") as f:
            cfg = json.load(f)
    backbone = args.backbone or cfg.get("backbone", "resnet50")
    num_classes = cfg.get("num_classes", 1)

    ds = KittiDataset(args.kitti_path, args.subset)
    loader = KittiLoader(ds, batch_size=1,
                         image_min_side=args.image_min_side,
                         image_max_side=args.image_max_side, shuffle=False)
    model = build_detector(backbone, num_classes=num_classes,
                           fuse_cls_dim=args.fuse_towers)
    variables = import_params(args.model_path)
    if args.fuse_towers:
        from ..models import fuse_detector_params

        variables = fuse_detector_params(variables)
    mesh = None
    if args.data_parallel:
        import jax

        from ..parallel import data_parallel_mesh

        if jax.device_count() > 1:
            mesh = data_parallel_mesh()
            if args.eval_batch is not None:  # explicit: warn it's ignored
                print("note: --eval-batch is ignored with --data-parallel "
                      "(groups are mesh-sized)", file=sys.stderr)
        else:
            print("note: --data-parallel requested but only one device is "
                  "visible; falling back to single-device batching",
                  file=sys.stderr)

    # one upload instead of one per eval batch (see device_resident
    # docstring); with a mesh, place replicated up front so the committed
    # tree already matches make_detect_fn's in_shardings
    if mesh is not None:
        import jax
        from jax.sharding import NamedSharding, PartitionSpec

        variables = jax.device_put(
            variables, NamedSharding(mesh, PartitionSpec()))
    else:
        variables = device_resident(variables)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       frozen=variables.get("frozen", {}),
                       opt_state=None, lr=jnp.zeros(()))

    mean_ap, errors, aps = evaluate_model(
        model, state, loader, num_classes=num_classes,
        score_threshold=args.score_threshold,
        max_detections=args.max_detections,
        iou_threshold=args.iou_threshold, mesh=mesh,
        eval_batch=args.eval_batch if args.eval_batch is not None else 4,
        int8_calib=args.int8, int8_percentile=args.int8_percentile)

    for bucket, (ap, n) in sorted(aps.items()):
        print(f"bucket {bucket} (class {bucket // 4}, orient {bucket % 4}): "
              f"AP={ap:.4f} over {int(n)} annotations")
    print(json.dumps({"mAP": mean_ap, **errors}))
    return mean_ap, errors


if __name__ == "__main__":
    main()
