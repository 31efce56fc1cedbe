"""Pose solver and Rodrigues conversion tests."""

import numpy as np

from ground_plane_polling_tpu.ops.pose import (
    matrix_from_rodrigues, matrix_from_rodrigues_np, rodrigues_from_matrix,
    solve_pose)


def _rot_y(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def test_rodrigues_roundtrip(rng):
    for _ in range(20):
        v = rng.uniform(-1, 1, 3)
        v = v / np.linalg.norm(v) * rng.uniform(0.01, 3.0)
        R = np.asarray(matrix_from_rodrigues(v))
        # R must be a rotation
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
        back = np.asarray(rodrigues_from_matrix(R))
        np.testing.assert_allclose(back, v, rtol=1e-4, atol=1e-5)


def test_rodrigues_numpy_twin_matches_jnp(rng):
    """matrix_from_rodrigues_np (host formatting path) must match the jnp
    version exactly — single vectors, batches, and the zero vector."""
    vecs = rng.uniform(-2, 2, (37, 3))
    vecs[0] = 0.0  # zero rotation -> identity
    got = matrix_from_rodrigues_np(vecs)
    want = np.stack([np.asarray(matrix_from_rodrigues(v)) for v in vecs])
    np.testing.assert_allclose(got, want, atol=1e-6)
    np.testing.assert_allclose(got[0], np.eye(3), atol=1e-12)
    # single-vector (no batch dim) shape contract
    one = matrix_from_rodrigues_np(vecs[3])
    assert one.shape == (3, 3)
    np.testing.assert_allclose(one, want[3], atol=1e-6)


def test_rodrigues_numpy_twin_is_host_only(rng):
    """The numpy twin exists so the KITTI writer / viz loops never dispatch
    device work; pin that with a transfer guard."""
    import jax

    vecs = rng.uniform(-2, 2, (8, 3))
    with jax.transfer_guard("disallow"):
        out = matrix_from_rodrigues_np(vecs)
    assert isinstance(out, np.ndarray)


def test_rodrigues_identity_and_pi():
    assert np.allclose(np.asarray(rodrigues_from_matrix(np.eye(3))), 0.0)
    # rotation by pi about y
    R = np.diag([-1.0, 1.0, -1.0])
    v = np.asarray(rodrigues_from_matrix(R))
    np.testing.assert_allclose(np.abs(v), [0.0, np.pi, 0.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(matrix_from_rodrigues(v)), R,
                               atol=1e-6)


def _keypoints_for(o, h, w, l, R, centre_bottom):
    """Construct the 3D keypoints the GPP pipeline would produce for a box
    with rotation R (columns = box axes x,y,z) resting with bottom-centre at
    `centre_bottom`. Derived from the pose equations: for each orientation,
    X_m / X_sel are two bottom corners and X_t is the top corner above X_m.
    """
    x_dir, y_dir, z_dir = R[:, 0], R[:, 1], R[:, 2]
    if o == 1:
        X_m = centre_bottom + x_dir * l / 2 + z_dir * w / 2
        X_sel = X_m - x_dir * l
    elif o == 2:
        X_m = centre_bottom - x_dir * l / 2 - z_dir * w / 2
        X_sel = X_m + x_dir * l
    elif o == 0:
        X_m = centre_bottom + x_dir * l / 2 - z_dir * w / 2
        X_sel = X_m - x_dir * l
    else:  # o == 3
        X_m = centre_bottom - x_dir * l / 2 + z_dir * w / 2
        X_sel = X_m + x_dir * l
    X_t = X_m - y_dir * h
    if o in (1, 2):
        kp = np.stack([np.zeros(3), X_m, X_sel, X_t])  # X_l unused
    else:
        kp = np.stack([X_sel, X_m, np.zeros(3), X_t])  # X_r unused
    return kp


def test_solve_pose_axis_aligned():
    h, w, l = 1.5, 1.7, 4.2
    centre = np.array([2.0, 1.65, 12.0])
    kp = _keypoints_for(1, h, w, l, np.eye(3), centre)
    res = solve_pose(kp[None], np.array([1]), np.array([[h, w, l]]))
    np.testing.assert_allclose(np.asarray(res.locations)[0], centre,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.angles)[0], 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.dimensions)[0], [h, w, l],
                               rtol=1e-5)


def test_solve_pose_all_orientations_rotated(rng):
    h, w, l = 1.4, 1.8, 4.0
    centre = np.array([-1.0, 1.6, 15.0])
    for o in range(4):
        theta = rng.uniform(-0.6, 0.6)
        R = _rot_y(theta)
        kp = _keypoints_for(o, h, w, l, R, centre)
        res = solve_pose(kp[None], np.array([o]), np.array([[h, w, l]]))
        np.testing.assert_allclose(np.asarray(res.locations)[0], centre,
                                   rtol=1e-4, atol=1e-4)
        R_got = np.asarray(matrix_from_rodrigues(np.asarray(res.angles)[0]))
        np.testing.assert_allclose(R_got, R, atol=1e-4)
        np.testing.assert_allclose(np.asarray(res.dimensions)[0], [h, w, l],
                                   rtol=1e-4)


def test_solve_pose_refines_dims():
    """Measured keypoint edge lengths override predicted h and l."""
    h_true, w, l_true = 1.6, 1.7, 4.5
    kp = _keypoints_for(1, h_true, w, l_true, np.eye(3),
                        np.array([0.0, 1.65, 10.0]))
    # feed WRONG predicted h and l; the solver must measure the true values
    res = solve_pose(kp[None], np.array([1]), np.array([[1.0, w, 3.0]]))
    np.testing.assert_allclose(np.asarray(res.dimensions)[0],
                               [h_true, w, l_true], rtol=1e-5)
