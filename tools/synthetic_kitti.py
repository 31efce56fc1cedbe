"""Full-resolution synthetic KITTI dataset for end-to-end training proofs.

Real KITTI isn't available on this box; this generates KITTI-sized
(375x1242) scenes with a real KITTI P2, cars placed in 3D on the ground
plane, raw 15-field labels, and runs them through the framework's own
label-prep port (the MATLAB create_mod_labels.m equivalent) to produce the
20-field modified labels — so training exercises the exact production data
path at the exact production resolution. Images carry learnable signal:
each car is painted as a distinctive block at its projected location.
"""

from __future__ import annotations

import os

import numpy as np

from ground_plane_polling_tpu.data.label_prep import create_modified_labels
from ground_plane_polling_tpu.data.planes import save_plane_database

# a real KITTI P2 (2011_09_26 rectified)
P2 = np.array([[721.5377, 0.0, 609.5593, 44.85728],
               [0.0, 721.5377, 172.854, 0.2163791],
               [0.0, 0.0, 1.0, 0.002745884]])

IMG_W, IMG_H = 1242, 375


def _calib_text():
    rows = []
    for i in range(4):
        P = P2 if i == 2 else np.zeros((3, 4))
        rows.append(f"P{i}: " + " ".join(f"{v:.12e}" for v in P.ravel()))
    rows.append("R0_rect: " + " ".join(f"{v:.12e}" for v in np.eye(3).ravel()))
    return "\n".join(rows) + "\n"


def _box3d_corners(dims, loc, yaw):
    """8 corners of a KITTI 3D box (bottom-center origin at loc)."""
    h, w, l = dims
    x = np.array([l, l, -l, -l, l, l, -l, -l]) / 2.0
    y = np.array([0, 0, 0, 0, -h, -h, -h, -h])
    z = np.array([w, -w, -w, w, w, -w, -w, w]) / 2.0
    c, s = np.cos(yaw), np.sin(yaw)
    R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    return (R @ np.stack([x, y, z])).T + np.asarray(loc)


def _project(pts3):
    p = (P2 @ np.concatenate([pts3, np.ones((len(pts3), 1))], axis=1).T).T
    return p[:, :2] / p[:, 2:3]


def _raw_label(typ, alpha, box, dims, loc, yaw):
    x1, y1, x2, y2 = box
    h, w, l = dims
    x, y, z = loc
    return (f"{typ} 0.00 0 {alpha:.2f} {x1:.2f} {y1:.2f} {x2:.2f} {y2:.2f} "
            f"{h:.2f} {w:.2f} {l:.2f} {x:.2f} {y:.2f} {z:.2f} {yaw:.2f}")


def _scene(rng, name, raw_label_dir, raw_calib_dir, img_dir):
    from PIL import Image, ImageDraw

    n_cars = rng.randint(2, 6)
    rows, paint = [], []
    for _ in range(n_cars):
        z = rng.uniform(8.0, 45.0)
        x = rng.uniform(-0.75, 0.75) * z * 0.4
        loc = (x, 1.65 + rng.uniform(-0.05, 0.05), z)
        dims = (rng.uniform(1.4, 1.8), rng.uniform(1.6, 1.9),
                rng.uniform(3.8, 4.6))
        yaw = rng.uniform(-np.pi, np.pi)
        corners2 = _project(_box3d_corners(dims, loc, yaw))
        x1, y1 = corners2.min(axis=0)
        x2, y2 = corners2.max(axis=0)
        if x2 < 5 or x1 > IMG_W - 5 or y2 < 5 or y1 > IMG_H - 5:
            continue
        alpha = yaw - np.arctan2(loc[0], loc[2])
        alpha = (alpha + np.pi) % (2 * np.pi) - np.pi
        rows.append(_raw_label("Car", alpha, (x1, y1, x2, y2), dims, loc,
                               yaw))
        shade = tuple(int(v) for v in rng.randint(60, 255, 3))
        paint.append(((x1, y1, x2, y2), shade, yaw))
    if not rows:  # ensure at least one visible car
        return _scene(rng, name, raw_label_dir, raw_calib_dir, img_dir)
    rows.append(_raw_label("DontCare", -10, (0, 0, 80, 40), (-1, -1, -1),
                           (-1000, -1000, -1000), -10))

    # image: textured ground + sky + painted car blocks (learnable signal)
    img = rng.randint(90, 130, (IMG_H, IMG_W, 3)).astype(np.uint8)
    img[:160] = rng.randint(160, 200, (160, IMG_W, 3)).astype(np.uint8)
    pil = Image.fromarray(img)
    draw = ImageDraw.Draw(pil)
    for (x1, y1, x2, y2), shade, yaw in sorted(
            paint, key=lambda p: p[0][1]):
        draw.rectangle([x1, y1, x2, y2], fill=shade)
        # darker lower third = "wheels", orientation cue stripe
        draw.rectangle([x1, y2 - (y2 - y1) / 4, x2, y2],
                       fill=tuple(int(v * 0.4) for v in shade))
        mid = x1 + (0.2 if np.cos(yaw) > 0 else 0.8) * (x2 - x1)
        draw.rectangle([mid - 3, y1, mid + 3, y2], fill=(20, 20, 20))
    pil.save(os.path.join(img_dir, name + ".png"))

    with open(os.path.join(raw_label_dir, name + ".txt"), "w") as f:
        f.write("\n".join(rows) + "\n")
    with open(os.path.join(raw_calib_dir, name + ".txt"), "w") as f:
        f.write(_calib_text())


def make_full_res_kitti(root, n_train=32, n_val=8, n_planes=64, seed=0):
    rng = np.random.RandomState(seed)
    raw_label_dir = os.path.join(root, "_raw_labels")
    raw_calib_dir = os.path.join(root, "_raw_calibs")
    os.makedirs(raw_label_dir, exist_ok=True)
    os.makedirs(raw_calib_dir, exist_ok=True)

    names = [f"{i:06d}" for i in range(n_train + n_val)]
    splits = {"train": names[:n_train], "val": names[n_train:]}
    for subset, sel in splits.items():
        img_dir = os.path.join(root, subset, "images")
        cal_dir = os.path.join(root, subset, "calibs")
        lab_dir = os.path.join(root, subset, "labels")
        for d in (img_dir, cal_dir, lab_dir):
            os.makedirs(d, exist_ok=True)
        for name in sel:
            _scene(rng, name, raw_label_dir, raw_calib_dir, img_dir)
        create_modified_labels(raw_label_dir, raw_calib_dir,
                               os.path.join(root, subset, "_all_labels"))
        for name in sel:
            os.replace(
                os.path.join(root, subset, "_all_labels", name + ".txt"),
                os.path.join(lab_dir, name + ".txt"))
            with open(os.path.join(raw_calib_dir, name + ".txt")) as f:
                calib = f.read()
            with open(os.path.join(cal_dir, name + ".txt"), "w") as f:
                f.write(calib)

    planes = np.stack([
        rng.uniform(-0.02, 0.02, n_planes),
        np.ones(n_planes),
        rng.uniform(-0.02, 0.02, n_planes),
        rng.uniform(-1.8, -1.5, n_planes),
    ], axis=1)
    planes[0] = [0.0, 1.0, 0.0, -1.65]
    save_plane_database(os.path.join(root, "road_planes_database.mat"),
                        planes)
    return root


if __name__ == "__main__":
    import sys

    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/full_res_kitti"
    make_full_res_kitti(root)
    print("wrote", root)
