"""Dataset debug viewer — the reference's retinanet-3D-debug
(/root/reference/keras_retinanet_3D/bin/debug.py), headless: instead of an
interactive cv2 window it writes annotated images (ground-truth boxes +
keypoint glyphs, optionally positive anchors coloured by orientation) to an
output directory.

  python -m ground_plane_polling_tpu.bin.debug kitti /data/kitti \
      --out debug_vis --anchors --random-transform --limit 20
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def parse_args(argv):
    p = argparse.ArgumentParser(description="Debug dataset plumbing.")
    sub = p.add_subparsers(dest="dataset_type")
    kitti = sub.add_parser("kitti")
    kitti.add_argument("kitti_path")
    p.add_argument("--subset", default="train")
    p.add_argument("--out", default="debug_vis")
    p.add_argument("--limit", type=int, default=10)
    p.add_argument("--anchors", action="store_true",
                   help="Also draw positive anchors per orientation.")
    p.add_argument("--random-transform", action="store_true")
    p.add_argument("--resize", action="store_true",
                   help="Apply the training resize before drawing.")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv if argv is not None else sys.argv[1:])
    if args.dataset_type != "kitti":
        raise SystemExit("only kitti is supported")

    import jax
    from PIL import Image

    from ..data.augment import augment_example
    from ..data.kitti import KittiDataset, resize_scale
    from ..data.pipeline import _resize_image
    from ..ops import anchors as anchor_ops
    from ..ops.targets import anchor_targets
    from ..utils.visualization import (draw_anchors,
                                       draw_annotations_with_keypoints)

    ds = KittiDataset(args.kitti_path, args.subset)
    os.makedirs(args.out, exist_ok=True)
    key = jax.random.PRNGKey(0)

    for i in range(min(args.limit, len(ds))):
        image = ds.load_image(i).astype(np.float32)
        anns, ignores = ds.load_annotations(i)

        if args.resize:
            scale = resize_scale(image.shape[:2])
            image = _resize_image(image, scale)
            anns = anns.copy()
            anns[:, :12] *= scale
            ignores = ignores * scale

        if args.random_transform and len(anns):
            key, sub = jax.random.split(key)
            g = np.zeros((max(len(anns), 1), 17), np.float32)
            g[: len(anns)] = anns
            ig = np.zeros((max(len(ignores), 1), 4), np.float32)
            ig[: len(ignores)] = ignores
            image_j, anns_j, ig_j = augment_example(sub, image, g, ig)
            image = np.asarray(image_j)
            anns = np.asarray(anns_j)[: len(anns)]
            ignores = np.asarray(ig_j)[: len(ignores)]

        canvas = np.clip(image, 0, 255).astype(np.uint8)
        if args.anchors and len(anns):
            grid = anchor_ops.anchors_for_shape(image.shape[:2])
            g = np.zeros((32, 17), np.float32)
            m = np.zeros(32, bool)
            n = min(len(anns), 32)
            g[:n], m[:n] = anns[:n], True
            ig = np.zeros((8, 4), np.float32)
            gm = np.zeros(8, bool)
            k = min(len(ignores), 8)
            if k:
                ig[:k], gm[:k] = ignores[:k], True
            targets = anchor_targets(grid, g, m, ig, gm,
                                     num_classes=ds.num_classes)
            canvas = draw_anchors(canvas, grid,
                                  np.asarray(targets["labels"]))
        canvas = draw_annotations_with_keypoints(canvas, anns)

        stem = os.path.basename(ds.image_paths[i]).rsplit(".", 1)[0]
        Image.fromarray(canvas[:, :, ::-1]).save(
            os.path.join(args.out, stem + ".png"))
        print(f"wrote {stem}.png ({len(anns)} annotations)")


if __name__ == "__main__":
    main()
