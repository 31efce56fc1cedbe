"""Synthetic tiny-KITTI fixture: a few images + raw labels + calibs + a
small plane database, for end-to-end data-layer tests without real data."""

import os

import numpy as np

from ground_plane_polling_tpu.data.label_prep import create_modified_labels
from ground_plane_polling_tpu.data.planes import save_plane_database

# a small-image camera so synthetic objects land inside the fixture frames
P2 = np.array([[200.0, 0.0, 208.0, 1.2],
               [0.0, 200.0, 64.0, 0.1],
               [0.0, 0.0, 1.0, 0.002]])

IMG_W, IMG_H = 416, 128


def _calib_text():
    rows = []
    for i in range(4):
        P = P2 if i == 2 else np.zeros((3, 4))
        rows.append(f"P{i}: " + " ".join(f"{v:.12e}" for v in P.ravel()))
    rows.append("R0_rect: " + " ".join(f"{v:.12e}" for v in np.eye(3).ravel()))
    return "\n".join(rows) + "\n"


def _raw_label(typ, alpha, box, dims, loc, yaw):
    x1, y1, x2, y2 = box
    h, w, l = dims
    x, y, z = loc
    return (f"{typ} 0.00 0 {alpha:.2f} {x1:.2f} {y1:.2f} {x2:.2f} {y2:.2f} "
            f"{h:.2f} {w:.2f} {l:.2f} {x:.2f} {y:.2f} {z:.2f} {yaw:.2f}")


def make_synthetic_kitti(root, n_images=3, n_planes=10):
    """Create root/{train,val}/{images,labels,calibs} + plane DB.

    Each image gets one Car at varying depth/yaw, one Van, and one DontCare.
    Returns root.
    """
    from PIL import Image

    rng = np.random.RandomState(0)
    raw_label_dir = os.path.join(root, "_raw_labels")
    raw_calib_dir = os.path.join(root, "_raw_calibs")
    os.makedirs(raw_label_dir, exist_ok=True)
    os.makedirs(raw_calib_dir, exist_ok=True)

    names = [f"{i:06d}" for i in range(n_images)]
    for i, name in enumerate(names):
        depth = 9.0 + 3.0 * i
        yaw = [-0.2, 1.4, -1.6][i % 3]
        loc = (rng.uniform(-2, 2), 1.65, depth)
        alpha = yaw - np.arctan2(loc[0], loc[2])
        # wrap to [-pi, pi]
        alpha = (alpha + np.pi) % (2 * np.pi) - np.pi
        rows = [
            _raw_label("Car", alpha, (500, 150, 700, 280),
                       (1.5, 1.7, 4.2), loc, yaw),
            _raw_label("Van", 0.5, (100, 140, 260, 260),
                       (2.0, 1.9, 5.0), (-4.0, 1.6, depth + 4), 0.6),
            _raw_label("DontCare", -10, (0, 0, 60, 40), (-1, -1, -1),
                       (-1000, -1000, -1000), -10),
        ]
        with open(os.path.join(raw_label_dir, name + ".txt"), "w") as f:
            f.write("\n".join(rows) + "\n")
        with open(os.path.join(raw_calib_dir, name + ".txt"), "w") as f:
            f.write(_calib_text())

    for subset, sel in (("train", names[:-1]), ("val", names[-1:])):
        img_dir = os.path.join(root, subset, "images")
        cal_dir = os.path.join(root, subset, "calibs")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(cal_dir, exist_ok=True)
        create_modified_labels(raw_label_dir, raw_calib_dir,
                               os.path.join(root, subset, "_all_labels"))
        lab_dir = os.path.join(root, subset, "labels")
        os.makedirs(lab_dir, exist_ok=True)
        for name in sel:
            arr = (np.random.RandomState(1).uniform(
                0, 255, (IMG_H, IMG_W, 3))).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(img_dir, name + ".png"))
            os.replace(os.path.join(root, subset, "_all_labels", name + ".txt"),
                       os.path.join(lab_dir, name + ".txt"))
            with open(os.path.join(raw_calib_dir, name + ".txt")) as f:
                calib = f.read()
            with open(os.path.join(cal_dir, name + ".txt"), "w") as f:
                f.write(calib)

    planes = np.stack([
        rng.uniform(-0.02, 0.02, n_planes),
        np.ones(n_planes),
        rng.uniform(-0.02, 0.02, n_planes),
        rng.uniform(-2.0, -1.4, n_planes),
    ], axis=1)
    planes[0] = [0.0, 1.0, 0.0, -1.65]
    save_plane_database(os.path.join(root, "road_planes_database.mat"), planes)
    return root
