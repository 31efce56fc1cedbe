"""Ground-plane polling tests on a synthetic scene with a known answer."""

import numpy as np

from ground_plane_polling_tpu.ops.polling import (
    fit_road_planes, normalize_planes)

# KITTI-like intrinsics
K = np.array([[720.0, 0.0, 620.0], [0.0, 720.0, 190.0], [0.0, 0.0, 1.0]])
P = np.concatenate([K, np.zeros((3, 1))], axis=1)  # (3, 4)
P_INV = np.linalg.pinv(P)


def _project(X):
    x = P @ np.append(X, 1.0)
    return x[:2] / x[2]


def _scene(h=1.5, w=1.7, l=4.2, y_ground=1.65, depth=10.0):
    """Orientation-1 box resting on the plane y = y_ground.

    Camera coords: x right, y down, z forward. Returns (keypoints_2d (8,),
    X3d (4, 3) for l, m, r, t).
    """
    X_m = np.array([0.5, y_ground, depth])
    X_r = X_m - np.array([l, 0, 0])        # x_dir = (X_m - X_r)/l = +x
    X_l = X_m - np.array([0, 0, w])        # winding: (X_l-X_m)x(X_r-X_m) y>0
    X_t = X_m - np.array([0, h, 0])        # up is -y
    pts3 = np.stack([X_l, X_m, X_r, X_t])
    kp2 = np.concatenate([_project(X) for X in pts3])
    return kp2, pts3


def _boxes_from_kp(kp2):
    out = np.full((1, 1, 12), -1.0, np.float32)
    out[0, 0, 4:] = kp2
    return out


def _run(kp2, dims, orientation, planes):
    boxes = _boxes_from_kp(kp2)
    res = fit_road_planes(
        boxes,
        np.asarray(dims, np.float32).reshape(1, 1, 3),
        np.array([[orientation]], np.int32),
        P_INV[None].astype(np.float32),
        np.asarray(planes, np.float32)[None],
    )
    return res


def test_recovers_true_plane_and_keypoints():
    h, w, l = 1.5, 1.7, 4.2
    kp2, pts3 = _scene(h, w, l, y_ground=1.65)
    planes = np.array([
        [0.0, 1.0, 0.0, -1.0],    # wrong height
        [0.0, 1.0, 0.0, -1.65],   # true plane
        [0.0, 1.0, 0.0, -2.5],    # wrong height
        [0.05, 1.0, -0.01, -1.4], # tilted distractor
    ])
    res = _run(kp2, (h, w, l), 1, planes)
    got_plane = np.asarray(res.keyplanes)[0, 0, 0]
    want_plane = np.asarray(normalize_planes(planes[1]))
    np.testing.assert_allclose(got_plane, want_plane, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.keypoints)[0, 0], pts3,
                               rtol=1e-3, atol=5e-3)
    assert float(res.residuals[0, 0]) < 0.01


def test_wrong_winding_disqualifies():
    h, w, l = 1.5, 1.7, 4.2
    kp2, _ = _scene(h, w, l)
    # swap the l and r keypoints: the footprint triangle now winds the other
    # way, so every plane is disqualified and the residual is the 100 marker
    kp_swapped = np.concatenate([kp2[4:6], kp2[2:4], kp2[0:2], kp2[6:8]])
    planes = np.array([[0.0, 1.0, 0.0, -1.65]])
    res = _run(kp_swapped, (h, w, l), 1, planes)
    # the winning "residual" is the disqualification constant 100, reported
    # divided by the 6 polls like every residual
    np.testing.assert_allclose(float(res.residuals[0, 0]), 100.0 / 6, rtol=1e-5)


def test_vote_gating_prefers_full_votes():
    """A plane matching all six polls must beat one matching fewer, even if
    the loser has a smaller accumulated residual by luck."""
    h, w, l = 1.5, 1.7, 4.2
    kp2, _ = _scene(h, w, l, y_ground=1.65)
    planes = np.array([
        [0.0, 1.0, 0.0, -1.65],  # 6 votes, near-zero residual
        [0.0, 1.0, 0.0, -0.4],   # shrinks all distances far below dims
    ])
    res = _run(kp2, (h, w, l), 1, planes)
    want = np.asarray(normalize_planes(planes[0]))
    np.testing.assert_allclose(np.asarray(res.keyplanes)[0, 0, 0], want,
                               atol=1e-5)


def test_orientation_dependent_dims():
    """Poll expectations group orientations {1,2} vs {0,3}: the (l,m) pair
    measures the width for {1,2} but the length for {0,3}
    (reference fit_road_planes.py:97-108)."""
    h, w, l = 1.5, 1.7, 4.2
    y_g = 1.65
    X_m = np.array([0.5, y_g, 10.0])
    X_r = X_m - np.array([l, 0, 0])
    X_l = X_m - np.array([0, 0, w])
    X_t = X_m - np.array([0, h, 0])
    kp2 = np.concatenate([_project(X) for X in (X_l, X_m, X_r, X_t)])
    planes = np.array([[0.0, 1.0, 0.0, -y_g], [0.0, 1.0, 0.0, -1.0]])
    # orientation 1 expects (l,m)=w and (m,r)=l -> fits perfectly
    res_ok = _run(kp2, (h, w, l), 1, planes)
    # orientation 0 expects (l,m)=l and (m,r)=w -> misses two polls on the
    # true plane (|w-l| = 2.5 > 0.7) plus both vertical-diagonal polls
    res_bad = _run(kp2, (h, w, l), 0, planes)
    assert float(res_ok.residuals[0, 0]) < 0.01
    assert float(res_bad.residuals[0, 0]) > 0.5


def test_plane_normalization():
    raw = np.array([[0.0, 2.0, 0.0, -3.3], [0.0, -4.0, 0.0, 6.6]])
    n = np.asarray(normalize_planes(raw))
    # both normalize to the same (0, -1, 0, +1.65) plane
    np.testing.assert_allclose(n[0], n[1], atol=1e-7)
    np.testing.assert_allclose(np.linalg.norm(n[0, :3]), 1.0, rtol=1e-6)
    assert n[0, 1] < 0


def test_full_plane_database_shapes():
    """Run with a larger synthetic DB to check (B, D, P) scaling paths."""
    h, w, l = 1.5, 1.7, 4.2
    kp2, pts3 = _scene(h, w, l)
    rng = np.random.RandomState(0)
    planes = np.concatenate([
        np.array([[0.0, 1.0, 0.0, -1.65]]),
        np.stack([rng.uniform(-0.05, 0.05, 200),
                  np.ones(200),
                  rng.uniform(-0.05, 0.05, 200),
                  rng.uniform(-2.5, -1.0, 200)], axis=1),
    ])
    res = _run(kp2, (h, w, l), 1, planes)
    assert res.keypoints.shape == (1, 1, 4, 3)
    assert res.keyplanes.shape == (1, 1, 1, 4)
    assert np.isfinite(np.asarray(res.residuals)).all()
