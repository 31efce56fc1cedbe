"""Golden tests for anchor generation against an independent numpy oracle."""

import numpy as np

from ground_plane_polling_tpu.ops import anchors as A


def _oracle_base_anchors(base, ratios, scales):
    """Straightforward re-derivation: anchors with area (base*scale)^2,
    h/w == ratio, centred at origin; ratio-major scale-minor ordering."""
    out = []
    for r in ratios:
        for s in scales:
            area = (base * s) ** 2
            w = np.sqrt(area / r)
            h = w * r
            out.append([-w / 2, -h / 2, w / 2, h / 2])
    return np.array(out)


def test_base_anchors_default():
    got = A.generate_base_anchors(32.0)
    want = _oracle_base_anchors(32.0, A.DEFAULT.ratios, A.DEFAULT.scales)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    assert got.shape == (12, 4)


def test_base_anchor_geometry():
    got = A.generate_base_anchors(64.0)
    w = got[:, 2] - got[:, 0]
    h = got[:, 3] - got[:, 1]
    # ratio-major: first 4 anchors have h/w = 0.5, then 1, then 2
    np.testing.assert_allclose(h[:4] / w[:4], 0.5, rtol=1e-12)
    np.testing.assert_allclose(h[4:8] / w[4:8], 1.0, rtol=1e-12)
    np.testing.assert_allclose(h[8:] / w[8:], 2.0, rtol=1e-12)
    # scale-minor: areas per ratio group follow scales^2 * 64^2
    areas = w * h
    scales = np.array(A.DEFAULT.scales)
    np.testing.assert_allclose(areas[:4], (64.0 * scales) ** 2, rtol=1e-9)
    # centred at origin
    np.testing.assert_allclose(got[:, 0] + got[:, 2], 0.0, atol=1e-9)


def test_feature_shapes():
    # ceil-div semantics
    assert A.feature_shapes((800, 1333)) == [
        (100, 167),
        (50, 84),
        (25, 42),
        (13, 21),
        (7, 11),
    ]
    assert A.feature_shapes((224, 224)) == [
        (28, 28),
        (14, 14),
        (7, 7),
        (4, 4),
        (2, 2),
    ]


def test_shift_grid():
    base = np.array([[-8.0, -4.0, 8.0, 4.0]])
    out = A.shift_anchors((2, 3), 16, base)
    assert out.shape == (6, 4)
    # first grid cell centre (0.5*16, 0.5*16) = (8, 8)
    np.testing.assert_allclose(out[0], [0.0, 4.0, 16.0, 12.0])
    # x-fastest ordering: second anchor centre at (24, 8)
    np.testing.assert_allclose(out[1], [16.0, 4.0, 32.0, 12.0])
    # second row starts at centre (8, 24)
    np.testing.assert_allclose(out[3], [0.0, 20.0, 16.0, 28.0])


def test_anchors_for_shape_count_and_order():
    img = (256, 320)
    all_a = A.anchors_for_shape(img)
    shapes = A.feature_shapes(img)
    want_n = sum(h * w * 12 for h, w in shapes)
    assert all_a.shape == (want_n, 4)
    assert all_a.shape[0] == A.num_anchors_for_shape(img)
    # level boundary: first anchor of P4 block equals its own grid origin
    n_p3 = shapes[0][0] * shapes[0][1] * 12
    base_p4 = A.generate_base_anchors(64.0)
    np.testing.assert_allclose(
        all_a[n_p3], base_p4[0] + np.array([8.0, 8.0, 8.0, 8.0]), rtol=1e-6
    )
