"""Tests for vectorized anchor target assignment vs a looped numpy oracle."""

import numpy as np

from ground_plane_polling_tpu.ops import anchors as A
from ground_plane_polling_tpu.ops import box_coder as bc
from ground_plane_polling_tpu.ops.targets import anchor_targets


def _oracle(anchors, anns, ignores, C):
    """Plain looped re-derivation of the documented assignment semantics."""
    n = anchors.shape[0]
    labels4c = -np.ones((n, 4 * C))
    labels_dim = -np.ones((n, C))
    if len(anns):
        # per-anchor best annotation by IoU
        best_iou = np.zeros(n)
        best_idx = np.zeros(n, dtype=int)
        for i in range(n):
            ious = []
            for g in anns:
                ix1, iy1 = max(anchors[i, 0], g[0]), max(anchors[i, 1], g[1])
                ix2, iy2 = min(anchors[i, 2], g[2]), min(anchors[i, 3], g[3])
                inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
                ua = ((anchors[i, 2] - anchors[i, 0]) * (anchors[i, 3] - anchors[i, 1])
                      + (g[2] - g[0]) * (g[3] - g[1]) - inter)
                ious.append(inter / max(ua, np.finfo(float).eps))
            best_idx[i] = int(np.argmax(ious))
            best_iou[i] = ious[best_idx[i]]
        assigned = anns[best_idx]
        for i in range(n):
            if best_iou[i] < 0.4:
                labels4c[i] = 0
                labels_dim[i] = 0
            elif best_iou[i] >= 0.5:
                labels4c[i] = 0
                labels_dim[i] = 0
                c_id, o_id = int(assigned[i, 15]), int(assigned[i, 16])
                labels4c[i, 4 * c_id + o_id] = 1
                labels_dim[i, c_id] = 1
    else:
        labels4c[:] = 0
        labels_dim[:] = 0
        assigned = np.zeros((n, 17))

    cx = (anchors[:, 0] + anchors[:, 2]) / 2
    cy = (anchors[:, 1] + anchors[:, 3]) / 2
    for r in ignores:
        inside = (cx >= r[0]) & (cy >= r[1]) & (cx <= r[2]) & (cy <= r[3])
        labels4c[inside] = -1
        labels_dim[inside] = -1

    t12, s01 = bc.encode_boxes(anchors, assigned[:, :12])
    t12, s01 = np.asarray(t12), np.asarray(s01)
    state = labels4c.max(axis=1)
    lab8 = np.concatenate(
        [labels4c * (1 - s01)[:, None], labels4c * s01[:, None]], axis=1
    )
    lab8[state == -1] = -1
    reg = np.concatenate([t12, state[:, None]], axis=1)
    dims = np.tile(assigned[:, 12:15], (1, C))
    dims = (dims - np.tile(bc.DIM_MEAN, C)) / np.tile(bc.DIM_STD, C)
    regd = np.concatenate(
        [dims.reshape(-1, 3), labels_dim.reshape(-1, 1)], axis=1
    )
    return lab8, reg, regd


def _pad(a, n, width):
    out = np.zeros((n, width), np.float32)
    mask = np.zeros(n, bool)
    if len(a):
        out[: len(a)] = a
        mask[: len(a)] = True
    return out, mask


def _run(anchors, anns, ignores, C=1):
    ann_p, ann_m = _pad(anns, 8, 17)
    ig_p, ig_m = _pad(ignores, 4, 4)
    out = anchor_targets(
        anchors.astype(np.float32), ann_p, ann_m, ig_p, ig_m, num_classes=C
    )
    return (np.asarray(out["labels"]), np.asarray(out["regression"]),
            np.asarray(out["regression_dim"]))


def _subsample_anchors():
    a = A.anchors_for_shape((128, 160))
    return a[::7][:200]  # keep the oracle loop cheap


def test_matches_oracle_with_annotations():
    anchors = _subsample_anchors()
    anns = np.array([
        [10, 10, 80, 60, 12, 58, 40, 59, 78, 57, 38, 12, 1.5, 1.7, 4.0, 0, 2],
        [60, 40, 150, 120, 62, 118, 100, 119, 148, 117, 105, 42, 1.6, 1.8, 4.2, 0, 1],
    ])
    ignores = np.array([[0.0, 0.0, 20.0, 20.0]])
    lab_o, reg_o, regd_o = _oracle(anchors, anns, ignores, 1)
    lab, reg, regd = _run(anchors, anns, ignores, 1)
    np.testing.assert_allclose(lab, lab_o, atol=1e-5)
    np.testing.assert_allclose(reg, reg_o, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(regd, regd_o, rtol=1e-4, atol=1e-5)
    # sanity: at least one positive and one ignore exist in this setup
    assert (reg[:, 12] == 1).any()
    assert (reg[:, 12] == -1).any()


def test_positive_slot_and_sign_halves():
    anchors = np.array([[100.0, 100.0, 200.0, 200.0]], np.float32)
    ann = np.zeros((1, 17), np.float32)
    ann[0, :4] = [100, 100, 200, 200]  # IoU 1
    ann[0, 6] = 120.0  # xm left of centre 150 -> sign bucket 0 (first half)
    ann[0, 10] = 118.0
    ann[0, 12:15] = [1.5, 1.7, 4.0]
    ann[0, 15], ann[0, 16] = 0, 3
    lab, reg, regd = _run(anchors, ann, np.zeros((0, 4)), C=1)
    want = np.zeros(8)
    want[3] = 1.0  # first (negative-sign) half, slot 4*0+3
    np.testing.assert_allclose(lab[0], want)
    assert reg[0, 12] == 1.0
    assert regd[0, 3] == 1.0

    # flip xm to the right of centre -> one-hot moves to the second half
    ann[0, 6] = 180.0
    lab2, _, _ = _run(anchors, ann, np.zeros((0, 4)), C=1)
    want2 = np.zeros(8)
    want2[4 + 3] = 1.0
    np.testing.assert_allclose(lab2[0], want2)


def test_no_annotations_matches_oracle():
    anchors = _subsample_anchors()[:50]
    lab_o, reg_o, regd_o = _oracle(anchors, np.zeros((0, 17)), np.zeros((0, 4)), 1)
    lab, reg, regd = _run(anchors, np.zeros((0, 17)), np.zeros((0, 4)), 1)
    np.testing.assert_allclose(lab, lab_o, atol=1e-6)
    np.testing.assert_allclose(reg, reg_o, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(regd, regd_o, rtol=1e-4, atol=1e-5)
    assert (lab == 0).all()  # everything negative


def test_multiclass_layout():
    anchors = np.array([[0.0, 0.0, 100.0, 100.0]], np.float32)
    ann = np.zeros((1, 17), np.float32)
    ann[0, :4] = [0, 0, 100, 100]
    ann[0, 6] = 80.0  # right of centre
    ann[0, 12:15] = [2.0, 2.5, 6.0]
    ann[0, 15], ann[0, 16] = 2, 1  # class 2 of 3, orientation 1
    lab, reg, regd = _run(anchors, ann, np.zeros((0, 4)), C=3)
    assert lab.shape == (1, 24)
    want = np.zeros(24)
    want[12 + 4 * 2 + 1] = 1.0  # second sign half, class 2, orient 1
    np.testing.assert_allclose(lab[0], want)
    assert regd.shape == (3, 4)
    # only class 2's dim row is positive
    np.testing.assert_allclose(regd[:, 3], [0.0, 0.0, 1.0])
    # all class rows carry the same (tiled) dim targets
    np.testing.assert_allclose(regd[0, :3], regd[2, :3], rtol=1e-6)
