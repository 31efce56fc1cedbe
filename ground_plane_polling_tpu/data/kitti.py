"""KITTI dataset layer: modified-label parsing, calibration, images.

Covers the reference's KittiGenerator responsibilities
(/root/reference/keras_retinanet_3D/preprocessing/kitti.py): the 20-field
modified label format, Car+Van -> class 0 mapping, DontCare/Misc ignore
regions, P2 calibration parsing, and the plane database. Unlike the
reference's thread-locked Keras generator, this is a plain indexable dataset;
batching/augmentation/target assembly live in data.pipeline.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from .label_prep import read_calibration
from .planes import load_plane_database

__all__ = ["KITTI_CLASSES", "KittiDataset", "read_image_bgr",
           "preprocess_image", "resize_scale"]

# class name -> label id (reference maps Car and Van to one class and
# ignores the rest; extendable like the commented-out reference table)
KITTI_CLASSES: Dict[str, int] = {
    "Car": 0,
    "Van": 0,
}
IGNORE_TYPES = ("DontCare", "Misc")

# caffe-style BGR channel means (reference utils/image.py:36-62)
BGR_MEAN = np.array([103.939, 116.779, 123.68], dtype=np.float32)

_LABEL_FIELDS = 20


def read_image_bgr(path: str) -> np.ndarray:
    """Read an image as float-ready uint8 BGR (reference reads RGB with PIL
    then reverses channels, utils/image.py:26-33).

    PNGs decode through cv2 when available: PNG is lossless so the pixels
    are bit-identical to the PIL path (pinned in tests/test_data.py), cv2
    returns BGR directly (no channel-reversal copy), and it decodes ~25%
    faster — host decode is the serving bottleneck on a small host. JPEGs
    stay on PIL, matching the reference decoder's output exactly."""
    if path.lower().endswith(".png"):
        try:
            import cv2

            bgr = cv2.imread(path, cv2.IMREAD_COLOR)
            if bgr is not None:
                return bgr
        except ImportError:
            pass
    from PIL import Image

    rgb = np.asarray(Image.open(path).convert("RGB"))
    return rgb[:, :, ::-1].copy()


def preprocess_image(image: np.ndarray) -> np.ndarray:
    """Subtract the caffe BGR means (image must already be BGR)."""
    return image.astype(np.float32) - BGR_MEAN


def resize_scale(shape: Tuple[int, int], min_side: int = 800,
                 max_side: int = 1333) -> float:
    """Scale factor so min side == min_side, capped so max side <= max_side."""
    smallest, largest = min(shape[:2]), max(shape[:2])
    scale = min_side / smallest
    if largest * scale > max_side:
        scale = max_side / largest
    return scale


def parse_modified_label(path: str):
    """Parse a 20-field modified label file.

    Returns (annotations (N, 17), ignore_boxes (M, 4)):
      annotations: x1 y1 x2 y2 xl yl xm ym xr yr xt yt h w l class orient.
    """
    anns, ignores = [], []
    with open(path) as f:
        for line in f:
            p = line.split()
            if len(p) != _LABEL_FIELDS:
                continue
            typ = p[0]
            vals = [float(x) for x in p[1:]]
            # fields after type: trunc occ alpha x1 y1 x2 y2 kp*8 h w l cls
            box = vals[3:7]
            if typ in IGNORE_TYPES:
                ignores.append(box)
                continue
            if typ not in KITTI_CLASSES:
                continue
            anns.append(box + vals[7:15] + vals[15:18]
                        + [KITTI_CLASSES[typ], vals[18]])
    anns = np.array(anns, np.float32).reshape(-1, 17)
    ignores = np.array(ignores, np.float32).reshape(-1, 4)
    return anns, ignores


class KittiDataset:
    """Indexable view over a prepared KITTI split directory.

    Layout (produced by data.prepare_split / label_prep):
      base_dir/{subset}/images/*.png
      base_dir/{subset}/labels/*.txt   (20-field modified labels)
      base_dir/{subset}/calibs/*.txt
      base_dir/road_planes_database.mat
    """

    def __init__(self, base_dir: str, subset: str = "train",
                 classes: Optional[Dict[str, int]] = None,
                 plane_db_path: Optional[str] = None):
        self.base_dir = base_dir
        self.subset = subset
        self.classes = dict(classes or KITTI_CLASSES)

        image_dir = os.path.join(base_dir, subset, "images")
        # case-insensitive extension check: prepare_split accepts .PNG
        # etc. the same way (prepare_split.py), and a mismatch here would
        # silently construct an empty dataset
        names = sorted(f for f in os.listdir(image_dir)
                       if f.lower().endswith((".png", ".jpg")))
        self.image_paths: List[str] = [
            os.path.join(image_dir, f) for f in names]
        # derive sibling dirs from the layout, NOT str.replace on the full
        # path (a base_dir containing 'images' would get mangled too)
        label_dir = os.path.join(base_dir, subset, "labels")
        calib_dir = os.path.join(base_dir, subset, "calibs")
        stems = [os.path.splitext(f)[0] for f in names]
        self.label_paths = [os.path.join(label_dir, s + ".txt")
                            for s in stems]
        self.calib_paths = [os.path.join(calib_dir, s + ".txt")
                            for s in stems]

        db = plane_db_path or os.path.join(base_dir, "road_planes_database.mat")
        self.planes = (load_plane_database(db) if os.path.exists(db)
                       else np.zeros((0, 4), np.float32))

    def __len__(self) -> int:
        return len(self.image_paths)

    @property
    def num_classes(self) -> int:
        return max(self.classes.values()) + 1

    def load_image(self, i: int) -> np.ndarray:
        return read_image_bgr(self.image_paths[i])

    def load_annotations(self, i: int):
        return parse_modified_label(self.label_paths[i])

    def load_calibration(self, i: int) -> np.ndarray:
        return read_calibration(self.calib_paths[i])

    def aspect_ratio(self, i: int) -> float:
        from PIL import Image

        with Image.open(self.image_paths[i]) as im:
            return im.width / im.height
