"""Filtering/NMS tests against a plain numpy greedy-NMS oracle."""

import numpy as np

from ground_plane_polling_tpu.ops.filtering import (
    filter_detections, filter_detections_batch)


def _oracle_nms(boxes, scores, thresh_score, thresh_iou, max_out):
    """Straightforward greedy NMS: repeatedly take the best-scoring box and
    drop everything overlapping it."""
    cand = [i for i in range(len(scores)) if scores[i] > thresh_score]
    cand.sort(key=lambda i: -scores[i])
    keep = []
    while cand and len(keep) < max_out:
        i = cand.pop(0)
        keep.append(i)
        rest = []
        for j in cand:
            ix1 = max(boxes[i, 0], boxes[j, 0]); iy1 = max(boxes[i, 1], boxes[j, 1])
            ix2 = min(boxes[i, 2], boxes[j, 2]); iy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
            a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            bb = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / max(a + bb - inter, 1e-12) <= thresh_iou:
                rest.append(j)
        cand = rest
    return keep


def _make_inputs(rng, n=400, c=1):
    x1 = rng.uniform(0, 400, n); y1 = rng.uniform(0, 200, n)
    w = rng.uniform(30, 120, n); h = rng.uniform(30, 120, n)
    boxes = np.zeros((n, 12), np.float32)
    boxes[:, 0], boxes[:, 1] = x1, y1
    boxes[:, 2], boxes[:, 3] = x1 + w, y1 + h
    boxes[:, 4:] = rng.uniform(0, 400, (n, 8))
    dims = rng.uniform(1, 5, (n, 3 * c)).astype(np.float32)
    cls = (rng.uniform(0, 0.2, (n, 8 * c)) ** 2).astype(np.float32)
    # make a few strong detections
    strong = rng.choice(n, 25, replace=False)
    for i in strong:
        cls[i, rng.randint(8 * c)] = rng.uniform(0.5, 1.0)
    return boxes, dims, cls


def test_matches_oracle_single_class(rng):
    boxes, dims, cls = _make_inputs(rng)
    out = filter_detections(boxes, dims, cls, num_classes=1)
    # oracle: collapse signs, max over orientation
    col = cls.reshape(-1, 2, 1, 4).max(axis=1)  # (N, 1, 4)
    scores = col[:, 0].max(axis=1)
    orients = col[:, 0].argmax(axis=1)
    keep = _oracle_nms(boxes[:, :4], scores, 0.05, 0.5, 100)

    got_scores = np.asarray(out.scores)
    nvalid = int((got_scores > -1).sum())
    assert nvalid == len(keep)
    want_scores = sorted((scores[i] for i in keep), reverse=True)
    np.testing.assert_allclose(got_scores[:nvalid], want_scores, rtol=1e-5)
    # same boxes selected, in score order
    order = np.argsort([-scores[i] for i in keep], kind="stable")
    want_idx = [keep[i] for i in order]
    np.testing.assert_allclose(
        np.asarray(out.boxes)[:nvalid], boxes[want_idx], rtol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(out.orientations)[:nvalid], orients[want_idx])


def test_padding_contract(rng):
    boxes, dims, cls = _make_inputs(rng, n=50)
    cls[:] = 0.001  # nothing above threshold
    out = filter_detections(boxes, dims, cls, num_classes=1)
    assert out.boxes.shape == (100, 12)
    assert (np.asarray(out.scores) == -1).all()
    assert (np.asarray(out.boxes) == -1).all()
    assert (np.asarray(out.labels) == -1).all()
    assert (np.asarray(out.orientations) == -1).all()


def test_orientation_and_sign_collapse():
    # one box, strongest score in sign-half 1, orientation 2
    boxes = np.zeros((4, 12), np.float32)
    boxes[0, :4] = [10, 10, 50, 50]
    dims = np.ones((4, 3), np.float32)
    cls = np.zeros((4, 8), np.float32)
    cls[0, 4 + 2] = 0.9  # second half, orient 2
    cls[0, 1] = 0.3      # first half, orient 1 (weaker)
    out = filter_detections(boxes, dims, cls, num_classes=1)
    assert float(out.scores[0]) > 0.89
    assert int(out.orientations[0]) == 2
    assert int(out.labels[0]) == 0


def test_multiclass_class_specific(rng):
    n = 100
    boxes, dims, cls = _make_inputs(rng, n=n, c=2)
    out = filter_detections(boxes, dims, cls, num_classes=2)
    got_l = np.asarray(out.labels)
    valid = got_l >= 0
    assert valid.any()
    # per-detection dims must come from the labelled class's 3-slice
    for i in np.where(valid)[0][:10]:
        anchor = np.where(
            (np.abs(boxes[:, :4] - np.asarray(out.boxes)[i, :4]) < 1e-4)
            .all(axis=1))[0][0]
        c_sel = got_l[i]
        np.testing.assert_allclose(
            np.asarray(out.dims)[i], dims[anchor, 3 * c_sel: 3 * c_sel + 3],
            rtol=1e-6)


def test_orientation_specific_mode(rng):
    boxes, dims, cls = _make_inputs(rng, n=80)
    out = filter_detections(boxes, dims, cls, num_classes=1,
                            orientation_specific=True)
    # each orientation is filtered independently: the same box may appear up
    # to 4 times; all valid entries have consistent score ordering
    s = np.asarray(out.scores)
    v = s > -1
    assert (np.diff(s[v]) <= 1e-6).all()


def test_orientation_specific_class_agnostic(rng):
    """4th mode: per-orientation filtering with argmax class selection."""
    boxes, dims, cls = _make_inputs(rng, n=60, c=2)
    out = filter_detections(boxes, dims, cls, num_classes=2,
                            class_specific=False,
                            orientation_specific=True)
    v = np.asarray(out.scores) > -1
    assert v.any()
    assert set(np.asarray(out.orientations)[v]) <= {0, 1, 2, 3}
    assert set(np.asarray(out.labels)[v]) <= {0, 1}


def test_batch_vmap(rng):
    boxes, dims, cls = _make_inputs(rng, n=60)
    out_b = filter_detections_batch(
        boxes[None].repeat(2, 0), dims[None].repeat(2, 0),
        cls[None].repeat(2, 0), num_classes=1)
    out_s = filter_detections(boxes, dims, cls, num_classes=1)
    np.testing.assert_allclose(np.asarray(out_b.scores[0]),
                               np.asarray(out_s.scores), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out_b.scores[1]),
                               np.asarray(out_s.scores), rtol=1e-6)


def test_no_nms_short_pool_pads(rng):
    """nms=False with pre_nms_top_k < max_detections used to crash at the
    final top_k (the pool is only pre_nms_top_k rows per set); it must pad
    with -1 rows instead (the reference pads, filter_detections.py:105)."""
    boxes, dims, cls = _make_inputs(rng, n=300)
    out = filter_detections(boxes, dims, cls, num_classes=1, nms=False,
                            pre_nms_top_k=64, max_detections=100)
    scores = np.asarray(out.scores)
    assert scores.shape == (100,)
    nvalid = int((scores > -1).sum())
    # the kept rows equal the plain score-sorted top of the pool — ALL of
    # it (an under-filled output would be a silent detection drop)
    col = cls.reshape(-1, 2, 1, 4).max(axis=1)[:, 0]
    pooled = np.sort(col.max(axis=1))[::-1]
    pooled = pooled[pooled > 0.05][:64]
    assert nvalid == len(pooled) > 0
    # padding rows are fully masked
    assert np.all(np.asarray(out.boxes)[nvalid:] == -1.0)
    assert np.all(np.asarray(out.labels)[nvalid:] == -1)
    np.testing.assert_allclose(scores[:nvalid], pooled, rtol=1e-5)
