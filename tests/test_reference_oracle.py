"""Bit-exactness tests against the reference's OWN numpy code.

The reference's anchor/target/encode machinery
(/root/reference/keras_retinanet_3D/utils/anchors.py) is numpy-only and
importable on this box, which makes it the authoritative oracle for the
geometry core: every other parity test in this suite compares against
independently-written oracles; this module compares against the reference
itself. Rotation conversions are cross-checked against cv2.Rodrigues, the
exact function the reference's pose solver calls
(/root/reference/keras_retinanet_3D/bin/run_network.py:166 etc.).
"""

import importlib.util
import pathlib

import numpy as np
import pytest

from ground_plane_polling_tpu.ops import anchors as gpp_anchors
from ground_plane_polling_tpu.ops import box_coder
from ground_plane_polling_tpu.ops.overlap import iou_matrix
from ground_plane_polling_tpu.ops.pose import (matrix_from_rodrigues,
                                               rodrigues_from_matrix)
from ground_plane_polling_tpu.ops.targets import anchor_targets

_REF_ANCHORS = pathlib.Path("/root/reference/keras_retinanet_3D/utils/anchors.py")

pytestmark = pytest.mark.skipif(
    not _REF_ANCHORS.exists(), reason="reference checkout not available")


@pytest.fixture(scope="module")
def ref():
    spec = importlib.util.spec_from_file_location("ref_anchors", _REF_ANCHORS)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def _random_annotations(rng, n, image_hw, num_classes):
    """(n, 17) plausible annotation rows inside the image."""
    h, w = image_hw
    x1 = rng.uniform(0, w * 0.8, n)
    y1 = rng.uniform(0, h * 0.8, n)
    x2 = x1 + rng.uniform(8, w * 0.3, n)
    y2 = y1 + rng.uniform(8, h * 0.3, n)
    cx = (x1 + x2) / 2
    kp = np.stack([
        x1 + rng.uniform(-4, 4, n), y2 + rng.uniform(-4, 4, n),   # xl, yl
        cx + rng.uniform(-10, 10, n), y2 + rng.uniform(-4, 4, n),  # xm, ym
        x2 + rng.uniform(-4, 4, n), y2 + rng.uniform(-4, 4, n),   # xr, yr
        cx + rng.uniform(-10, 10, n), y1 + rng.uniform(-4, 4, n),  # xt, yt
    ], axis=1)
    dims = rng.uniform(1.0, 5.0, (n, 3))
    cls = rng.randint(0, num_classes, (n, 1)).astype(np.float64)
    orient = rng.randint(0, 4, (n, 1)).astype(np.float64)
    return np.concatenate(
        [np.stack([x1, y1, x2, y2], axis=1), kp, dims, cls, orient], axis=1)


# ---------------------------------------------------------------------------
# anchor generation
# ---------------------------------------------------------------------------

def test_generate_anchors_matches_reference(ref):
    for size in (32, 64, 128, 256, 512):
        theirs = ref.generate_anchors(base_size=size)
        ours = gpp_anchors.generate_base_anchors(size)
        np.testing.assert_allclose(ours, theirs, rtol=1e-12, atol=1e-9)


@pytest.mark.parametrize("shape", [(256, 320), (375, 1242), (511, 1407),
                                   (800, 1333)])
def test_anchors_for_shape_matches_reference(ref, shape):
    theirs = ref.anchors_for_shape(shape + (3,))
    ours = gpp_anchors.anchors_for_shape(shape)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-3)


def test_shift_matches_reference(ref):
    base = ref.generate_anchors(base_size=64)
    theirs = ref.shift((7, 13), 16, base)
    ours = gpp_anchors.shift_anchors((7, 13), 16, np.asarray(base))
    np.testing.assert_allclose(ours, theirs, rtol=1e-12, atol=1e-9)


# ---------------------------------------------------------------------------
# IoU / encode / dims
# ---------------------------------------------------------------------------

def test_compute_overlap_matches_reference(ref, rng):
    a = rng.uniform(0, 200, (64, 4))
    b = rng.uniform(0, 200, (17, 4))
    a[:, 2:] = a[:, :2] + np.abs(a[:, 2:] - a[:, :2])
    b[:, 2:] = b[:, :2] + np.abs(b[:, 2:] - b[:, :2])
    theirs = ref.compute_overlap(a, b)
    ours = np.asarray(iou_matrix(a.astype(np.float32), b.astype(np.float32)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_bbox_transform_matches_reference(ref, rng):
    num_classes = 2
    anchors = ref.anchors_for_shape((64, 96, 3)).astype(np.float64)
    gt = _random_annotations(rng, anchors.shape[0], (64, 96), num_classes)
    gt = gt[:, :12]
    targets_ref, sign_ref = ref.bbox_transform(anchors, gt, num_classes)

    targets_ours, sign_ours = box_coder.encode_boxes(
        anchors.astype(np.float32), gt.astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(targets_ours), targets_ref, rtol=1e-4, atol=1e-4)

    # reference duplicates sign into (A, 8C): [1-s]*4C then [s]*4C
    sign_full = np.concatenate(
        [np.tile(1.0 - np.asarray(sign_ours)[:, None], (1, 4 * num_classes)),
         np.tile(np.asarray(sign_ours)[:, None], (1, 4 * num_classes))],
        axis=1)
    np.testing.assert_allclose(sign_full, sign_ref, atol=1e-6)


def test_dim_transform_matches_reference(ref, rng):
    dims = rng.uniform(0.5, 6.0, (200, 3))
    theirs = ref.dim_transform(dims)
    ours = np.asarray(box_coder.encode_dims(dims.astype(np.float32)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# full target assignment (reference generator.py:273-314 composition)
# ---------------------------------------------------------------------------

def _reference_targets(ref, image_hw, annotations, ignore_region, num_classes):
    """Reproduce the reference compute_targets recipe
    (preprocessing/generator.py:283-303) for one image."""
    labels, assigned, anchors, labels_dim, ann_dim = ref.anchor_targets_bbox(
        image_hw + (3,), annotations, ignore_region, num_classes)
    regression, sign = ref.bbox_transform(anchors, assigned, num_classes)
    ann_dim = ref.dim_transform(ann_dim)

    anchor_states = np.max(labels, axis=1, keepdims=True)
    labels8 = np.multiply(np.concatenate([labels, labels], axis=1), sign)
    labels8[anchor_states[:, 0] == -1, :] = -1
    regression = np.concatenate([regression, anchor_states], axis=1)
    regression_dim = np.append(
        np.reshape(ann_dim, (-1, 3)), np.reshape(labels_dim, (-1, 1)), axis=1)
    return labels8, regression, regression_dim


def _our_targets(image_hw, annotations, ignore_region, num_classes,
                 pad_to=None):
    anchors = gpp_anchors.anchors_for_shape(image_hw)
    g = annotations.shape[0]
    g_pad = pad_to or max(g, 1)
    ann = np.zeros((g_pad, 17), np.float32)
    ann[:g] = annotations
    mask = np.zeros(g_pad, bool)
    mask[:g] = True
    m = ignore_region.shape[0]
    m_pad = max(m, 1)
    ign = np.zeros((m_pad, 4), np.float32)
    ign[:m] = ignore_region
    imask = np.zeros(m_pad, bool)
    imask[:m] = True
    out = anchor_targets(anchors, ann, mask, ign, imask,
                         num_classes=num_classes)
    return (np.asarray(out["labels"]), np.asarray(out["regression"]),
            np.asarray(out["regression_dim"]))


def test_anchor_targets_match_reference(ref, rng):
    image_hw = (128, 160)
    annotations = _random_annotations(rng, 6, image_hw, 1)
    ignore = np.array([[10.0, 10.0, 60.0, 50.0]])

    labels_ref, reg_ref, dim_ref = _reference_targets(
        ref, image_hw, annotations, ignore, 1)
    labels, reg, dim = _our_targets(image_hw, annotations, ignore, 1,
                                    pad_to=8)

    np.testing.assert_array_equal(labels, labels_ref)
    np.testing.assert_allclose(reg, reg_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(dim, dim_ref, rtol=1e-4, atol=1e-4)


def test_anchor_targets_no_annotations_match_reference(ref):
    image_hw = (96, 128)
    annotations = np.zeros((0, 17))
    ignore = np.array([[0.0, 0.0, 40.0, 40.0]])

    labels_ref, reg_ref, dim_ref = _reference_targets(
        ref, image_hw, annotations, ignore, 1)
    labels, reg, dim = _our_targets(image_hw, annotations, ignore, 1,
                                    pad_to=4)

    np.testing.assert_array_equal(labels, labels_ref)
    np.testing.assert_allclose(reg, reg_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(dim, dim_ref, rtol=1e-4, atol=1e-4)


def test_anchor_targets_no_ignore_match_reference(ref, rng):
    image_hw = (128, 96)
    annotations = _random_annotations(rng, 3, image_hw, 1)
    ignore = np.zeros((0, 4))

    labels_ref, reg_ref, dim_ref = _reference_targets(
        ref, image_hw, annotations, ignore, 1)
    labels, reg, dim = _our_targets(image_hw, annotations, ignore, 1)

    np.testing.assert_array_equal(labels, labels_ref)
    np.testing.assert_allclose(reg, reg_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(dim, dim_ref, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Rodrigues vs cv2 (the exact routine the reference pose solver calls)
# ---------------------------------------------------------------------------

def _random_rotvecs(rng, n):
    axes = rng.normal(size=(n, 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    angles = rng.uniform(0.05, np.pi - 0.05, (n, 1))
    vecs = axes * angles
    # edge regimes
    extra = np.stack([
        np.array([1e-9, 0, 0]),                 # ~identity
        np.array([0.0, 1e-5, 0]),               # tiny angle
        axes[0] * (np.pi - 1e-7),               # ~pi
    ])
    return np.concatenate([vecs, extra], axis=0)


def test_rodrigues_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    vecs = _random_rotvecs(rng, 32)

    for v in vecs:
        R_cv, _ = cv2.Rodrigues(v)
        R_ours = np.asarray(matrix_from_rodrigues(v.astype(np.float64)))
        np.testing.assert_allclose(R_ours, R_cv, rtol=1e-6, atol=1e-6)

        v_cv, _ = cv2.Rodrigues(R_cv)
        v_ours = np.asarray(rodrigues_from_matrix(R_cv))
        # near pi the axis sign is ambiguous, and for near-zero angles cv2
        # truncates to exactly 0 while we keep the first-order value: in both
        # regimes compare through the rotation matrix instead
        theta = np.linalg.norm(v)
        if theta > np.pi - 1e-3 or theta < 1e-4:
            R_back = np.asarray(matrix_from_rodrigues(v_ours))
            np.testing.assert_allclose(R_back, R_cv, rtol=1e-5, atol=1e-5)
        else:
            np.testing.assert_allclose(
                v_ours, v_cv[:, 0], rtol=1e-5, atol=1e-6)
