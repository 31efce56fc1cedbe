"""The fused select-then-decode filter must match the decode-everything
path exactly."""

import numpy as np
import pytest

from ground_plane_polling_tpu.inference import decode_predictions
from ground_plane_polling_tpu.ops import anchors as anchor_ops
from ground_plane_polling_tpu.ops.filtering import (
    filter_detections, filter_detections_fused)


def _raw_inputs(rng, c=1, img=(128, 160)):
    anchors = anchor_ops.anchors_for_shape(img)
    n = anchors.shape[0]
    deltas = rng.normal(0, 0.5, (n, 12)).astype(np.float32)
    dims_raw = rng.normal(0, 1.0, (n, 3 * c)).astype(np.float32)
    cls = (rng.uniform(0, 0.15, (n, 8 * c)) ** 2).astype(np.float32)
    strong = rng.choice(n, 40, replace=False)
    for i in strong:
        cls[i, rng.randint(8 * c)] = rng.uniform(0.4, 1.0)
    return anchors, deltas, dims_raw, cls


@pytest.mark.parametrize("mode", [
    dict(),
    dict(class_specific=False),
    dict(orientation_specific=True),
    dict(nms=False),
])
def test_fused_matches_reference_path(rng, mode):
    anchors, deltas, dims_raw, cls = _raw_inputs(rng)
    raw = {"regression": deltas[None], "regression_dim": dims_raw[None],
           "classification": cls[None]}
    boxes, dims = decode_predictions(raw, anchors, 1)
    ref = filter_detections(np.asarray(boxes[0]), np.asarray(dims[0]), cls,
                            num_classes=1, **mode)
    got = filter_detections_fused(anchors, deltas, dims_raw, cls,
                                  num_classes=1, **mode)
    np.testing.assert_allclose(np.asarray(got.scores),
                               np.asarray(ref.scores), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got.boxes),
                               np.asarray(ref.boxes), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got.dims),
                               np.asarray(ref.dims), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got.labels),
                                  np.asarray(ref.labels))
    np.testing.assert_array_equal(np.asarray(got.orientations),
                                  np.asarray(ref.orientations))


def test_fused_multiclass(rng):
    anchors, deltas, dims_raw, cls = _raw_inputs(rng, c=2)
    raw = {"regression": deltas[None], "regression_dim": dims_raw[None],
           "classification": cls[None]}
    boxes, dims = decode_predictions(raw, anchors, 2)
    ref = filter_detections(np.asarray(boxes[0]), np.asarray(dims[0]), cls,
                            num_classes=2)
    got = filter_detections_fused(anchors, deltas, dims_raw, cls,
                                  num_classes=2)
    np.testing.assert_allclose(np.asarray(got.scores),
                               np.asarray(ref.scores), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got.dims),
                               np.asarray(ref.dims), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got.labels),
                                  np.asarray(ref.labels))


def test_fused_no_nms_short_pool_pads(rng):
    """Same short-pool padding contract as the unfused filter: the full
    (capped) candidate pool survives, the rest is -1 padding."""
    anchors, deltas, dims_raw, cls = _raw_inputs(rng)
    out = filter_detections_fused(anchors, deltas, dims_raw, cls,
                                  num_classes=1, nms=False,
                                  pre_nms_top_k=32, max_detections=100)
    scores = np.asarray(out.scores)
    assert scores.shape == (100,)
    col = cls.reshape(-1, 2, 1, 4).max(axis=1)[:, 0]
    expected = min(int((col.max(axis=1) > 0.05).sum()), 32)
    assert int((scores > -1).sum()) == expected > 0
