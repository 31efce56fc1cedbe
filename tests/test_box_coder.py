"""Golden tests for box/keypoint/dim encode-decode."""

import numpy as np
import jax.numpy as jnp

from ground_plane_polling_tpu.ops import box_coder as bc
from ground_plane_polling_tpu.ops.overlap import iou_matrix, iou_one_to_many


def _rand_anchors(rng, n):
    x1 = rng.uniform(0, 500, n)
    y1 = rng.uniform(0, 300, n)
    w = rng.uniform(20, 200, n)
    h = rng.uniform(20, 200, n)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=1)


def test_encode_decode_roundtrip(rng):
    n = 64
    anchors = _rand_anchors(rng, n)
    gt = np.concatenate(
        [_rand_anchors(rng, n), rng.uniform(0, 600, (n, 8))], axis=1
    )
    # the coder carries ONE side bit for both xm and xt (the reference
    # discards xt's own sign, utils/anchors.py:302-306) — real boxes have the
    # top corner on the same side as the middle corner, so enforce that here
    cx = (anchors[:, 0] + anchors[:, 2]) / 2
    gt[:, 10] = cx + np.sign(gt[:, 6] - cx) * np.abs(gt[:, 10] - cx)
    targets, sign01 = bc.encode_boxes(anchors, gt)
    sign = np.where(np.asarray(sign01) >= 0.5, 1.0, -1.0)
    # on-centre xm encodes sign 0.5 -> +1; make sure no exact centres in test
    decoded = np.asarray(bc.decode_boxes(anchors, targets, sign))
    np.testing.assert_allclose(decoded, gt[:, :12], rtol=1e-4, atol=1e-3)


def test_encode_normalization_oracle(rng):
    """Hand-compute one anchor's targets from the documented formulas."""
    anchors = np.array([[100.0, 50.0, 200.0, 150.0]])  # w=100 h=100 cx=150
    gt = np.array(
        [[110.0, 60.0, 190.0, 140.0, 112.0, 139.0, 120.0, 141.0, 188.0,
          138.0, 118.0, 62.0]]
    )
    t, s = bc.encode_boxes(anchors, gt)
    raw = np.array(
        [
            (110 - 100) / 100,  # dx1
            (60 - 50) / 100,    # dy1
            (190 - 200) / 100,  # dx2
            (140 - 150) / 100,  # dy2
            (112 - 100) / 100,  # dxl (vs x1)
            (139 - 150) / 100,  # dyl (vs y2)
            abs(120 - 150) / 100,  # |dxm| (vs centre)
            (141 - 150) / 100,  # dym (vs y2)
            (188 - 200) / 100,  # dxr (vs x2)
            (138 - 150) / 100,  # dyr (vs y2)
            abs(118 - 150) / 100,  # |dxt| (vs centre)
            (62 - 50) / 100,    # dyt (vs y1)
        ]
    )
    want = (raw - bc.BOX_MEAN) / bc.BOX_STD
    np.testing.assert_allclose(np.asarray(t)[0], want, rtol=1e-5)
    # xm=120 is left of centre 150 -> sign bucket 0
    assert float(s[0]) == 0.0


def test_sign_half_on_centre():
    anchors = np.array([[0.0, 0.0, 100.0, 100.0]])
    gt = np.zeros((1, 12))
    gt[0, :4] = [0, 0, 100, 100]
    gt[0, 6] = 50.0  # xm exactly at centre
    _, s = bc.encode_boxes(anchors, gt)
    assert float(s[0]) == 0.5  # matches reference (sign(0)+1)/2


def test_dims_roundtrip(rng):
    d = rng.uniform(1, 5, (10, 3)).astype(np.float32)
    enc = bc.encode_dims(d)
    dec = np.asarray(bc.decode_dims(enc))
    np.testing.assert_allclose(dec, d, rtol=1e-5)


def test_decode_dims_multiclass():
    enc = np.zeros((2, 6), np.float32)  # 2 classes, zeros decode to the mean
    dec = np.asarray(bc.decode_dims(enc))
    np.testing.assert_allclose(dec, np.tile(bc.DIM_MEAN, 2)[None].repeat(2, 0),
                               rtol=1e-6)


def test_iou_oracle(rng):
    a = _rand_anchors(rng, 20)
    b = _rand_anchors(rng, 15)
    got = np.asarray(iou_matrix(jnp.asarray(a), jnp.asarray(b)))
    for i in range(20):
        for j in range(15):
            ix1 = max(a[i, 0], b[j, 0])
            iy1 = max(a[i, 1], b[j, 1])
            ix2 = min(a[i, 2], b[j, 2])
            iy2 = min(a[i, 3], b[j, 3])
            inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
            area_a = (a[i, 2] - a[i, 0]) * (a[i, 3] - a[i, 1])
            area_b = (b[j, 2] - b[j, 0]) * (b[j, 3] - b[j, 1])
            want = inter / (area_a + area_b - inter)
            assert abs(got[i, j] - want) < 1e-5


def test_clip_boxes():
    boxes = np.array([[-5.0, -3.0, 500.0, 400.0, 7.0, 7.0, 7.0, 7.0, 7.0,
                       7.0, 7.0, 7.0]])
    out = np.asarray(bc.clip_boxes(boxes, (370, 1224)))
    np.testing.assert_allclose(out[0, :4], [0.0, 0.0, 500.0, 370.0])
    # keypoint columns pass through untouched
    np.testing.assert_allclose(out[0, 4:], 7.0)


def test_iou_degenerate_no_nan():
    z = np.zeros((3, 4))
    got = np.asarray(iou_matrix(z, z))
    assert np.all(np.isfinite(got))
    assert np.all(got == 0.0)
    got1 = np.asarray(iou_one_to_many(np.zeros(4), z))
    assert np.all(got1 == 0.0)
