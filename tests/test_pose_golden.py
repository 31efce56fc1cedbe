"""Golden pose-solver parity against the reference's OWN pose code.

`ops/pose.py` replaces the per-detection host loop in
/root/reference/keras_retinanet_3D/bin/run_network.py:141-287 (plain numpy +
cv2.Rodrigues) with one vectorized jitted solve. Until now it was validated
only by self-constructed geometric tests (test_pose.py) — the one stage left
where a shared misreading could corrupt every KITTI txt. This module closes
that: it extracts the reference's actual per-detection loop from the source
file at test time (content-anchored slice, exec'd verbatim with the real
cv2.Rodrigues — nothing is copied into this repo) and asserts our
`solve_pose` matches locations / angles / refined dimensions bit-for-tol.

Also pinned here: the docstring claim in ops/pose.py that the reference's
`outlier` variable is a pure function of the orientation class
(run_network.py:147-150), which makes the diagonal-based third branch
(`else:` at :248) dead code, and makes X_l unread for orientations {1,2}
and X_r unread for {0,3}. We prove the unread-keypoint half behaviorally:
feeding NaN in the unused keypoint slot must leave every reference output
finite, and must not change ours.

Default lane (~1 s: numpy + cv2 only, no TF import).
"""

import re
import textwrap

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from ground_plane_polling_tpu.ops.pose import (
    matrix_from_rodrigues, solve_pose)

REF_FILE = "/root/reference/keras_retinanet_3D/bin/run_network.py"


@pytest.fixture(scope="module")
def ref_pose_loop():
    """The reference's pose loop source, sliced by content anchors."""
    with open(REF_FILE) as f:
        src = f.read()
    start = src.rindex("\n", 0, src.index("# find 6dof pose")) + 1
    stop = src.index("# store full results")
    body = textwrap.dedent(src[start:stop]).rstrip()
    # sanity: we grabbed the whole branch ladder, including the dead one
    assert body.count("cv2.Rodrigues") == 12
    assert "outlier = 2" in body and "outlier = 0" in body
    return body


def run_reference_pose(ref_loop, keypoints, orientations, dimensions,
                       keyplanes=None):
    """Execute the reference's own loop on (N, 4, 3) keypoints.

    Returns (locations, angles, dimensions) with the reference's in-place
    dimension refinement applied.
    """
    n = len(orientations)
    ns = {
        "np": np,
        "cv2": cv2,
        "scores": np.ones(n),
        "keypoints": np.asarray(keypoints, np.float64).reshape(n, 12),
        "keyplanes": (np.zeros((n, 4)) if keyplanes is None
                      else np.asarray(keyplanes, np.float64)),
        "orientations": np.asarray(orientations, np.int64),
        "dimensions": np.array(dimensions, np.float64, copy=True),
    }
    ns["angles"] = np.empty_like(ns["dimensions"])
    ns["locations"] = np.empty_like(ns["dimensions"])
    exec(compile(ref_loop, REF_FILE, "exec"), ns)
    return ns["locations"], ns["angles"], ns["dimensions"]


def _random_rotation(rng, max_angle=np.pi * 0.9):
    v = rng.normal(size=3)
    v = v / np.linalg.norm(v) * rng.uniform(0.05, max_angle)
    return cv2.Rodrigues(v)[0]


def _box_keypoints(o, h, w, l, R, centre, nan_unused=False):
    """Keypoints (4, 3) in the (X_l, X_m, X_r, X_t) layout our pipeline
    emits, for a box with rotation R and bottom-centre `centre`, consistent
    with the reference's orientation-class geometry."""
    x_dir, y_dir, z_dir = R[:, 0], R[:, 1], R[:, 2]
    if o == 1:
        X_m = centre + x_dir * l / 2 + z_dir * w / 2
        X_sel = X_m - x_dir * l
    elif o == 2:
        X_m = centre - x_dir * l / 2 - z_dir * w / 2
        X_sel = X_m + x_dir * l
    elif o == 0:
        X_m = centre + x_dir * l / 2 - z_dir * w / 2
        X_sel = X_m - x_dir * l
    else:
        X_m = centre - x_dir * l / 2 + z_dir * w / 2
        X_sel = X_m + x_dir * l
    X_t = X_m - y_dir * h
    unused = np.full(3, np.nan) if nan_unused else np.zeros(3)
    if o in (1, 2):
        return np.stack([unused, X_m, X_sel, X_t])
    return np.stack([X_sel, X_m, unused, X_t])


def _assert_matches(ref_loop, kp, orients, dims, atol=1e-4):
    loc_ref, ang_ref, dim_ref = run_reference_pose(
        ref_loop, kp, orients, dims)
    res = solve_pose(np.asarray(kp, np.float32), np.asarray(orients),
                     np.asarray(dims, np.float32))
    np.testing.assert_allclose(np.asarray(res.locations), loc_ref,
                               rtol=1e-4, atol=atol)
    np.testing.assert_allclose(np.asarray(res.dimensions), dim_ref,
                               rtol=1e-4, atol=atol)
    # compare rotations as matrices: at theta ~ pi the axis-angle SIGN is
    # ambiguous between implementations, the rotation itself is not
    R_ours = np.asarray(matrix_from_rodrigues(res.angles))
    for i in range(len(orients)):
        R_ref = cv2.Rodrigues(ang_ref[i])[0]
        np.testing.assert_allclose(R_ours[i], R_ref, atol=atol)
    # and directly as vectors away from pi (shared cv2 convention)
    theta = np.linalg.norm(ang_ref, axis=-1)
    safe = theta < np.pi - 1e-2
    np.testing.assert_allclose(
        np.asarray(res.angles)[safe], ang_ref[safe], rtol=1e-3, atol=atol)


def test_pose_golden_all_orientations_random_poses(ref_pose_loop, rng):
    """All 4 orientation classes x random full-3D rotations x random boxes,
    batched through one vectorized solve vs the reference's loop."""
    kp, orients, dims = [], [], []
    for o in range(4):
        for _ in range(8):
            h, w, l = rng.uniform([1.2, 1.4, 3.2], [2.2, 2.1, 5.5])
            centre = rng.uniform([-8, 0.5, 6], [8, 2.2, 40])
            R = _random_rotation(rng)
            kp.append(_box_keypoints(o, h, w, l, R, centre))
            orients.append(o)
            dims.append([h, w, l])
    _assert_matches(ref_pose_loop, np.stack(kp), orients, dims)


def test_pose_golden_arbitrary_keypoints(ref_pose_loop, rng):
    """Parity must hold for ARBITRARY (non-box-consistent) keypoints too —
    real polled keypoints are noisy and need not form a rectangle."""
    n = 32
    kp = rng.uniform([-10, -1, 4], [10, 3, 45], size=(n, 4, 3))
    orients = rng.randint(0, 4, size=n)
    dims = rng.uniform([1.0, 1.2, 3.0], [2.5, 2.2, 6.0], size=(n, 3))
    _assert_matches(ref_pose_loop, kp, orients, dims, atol=3e-4)


def test_pose_golden_near_pi_and_identity(ref_pose_loop):
    """Rodrigues regime edges: ~0 and ~pi rotations (matrix comparison
    handles the pi-axis sign ambiguity inside _assert_matches)."""
    kp, orients, dims = [], [], []
    for o, theta in [(0, 1e-7), (1, 1e-7), (2, np.pi - 1e-6),
                     (3, np.pi - 1e-6), (1, np.pi), (2, 2.5)]:
        c, s = np.cos(theta), np.sin(theta)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        kp.append(_box_keypoints(o, 1.5, 1.7, 4.2, R,
                                 np.array([1.0, 1.6, 12.0])))
        orients.append(o)
        dims.append([1.5, 1.7, 4.2])
    _assert_matches(ref_pose_loop, np.stack(kp), orients, dims, atol=2e-4)


def test_reference_unused_keypoint_never_read(ref_pose_loop, rng):
    """Behavioral pin of the dead-code analysis (ops/pose.py docstring):
    the reference never reads X_l for orientations {1,2} nor X_r for {0,3}
    (the `outlier` ladder at run_network.py:147-150 fixes the branch per
    class, leaving the diagonal `else:` branch unreachable). NaN in the
    unused slot must not propagate — in the reference or in ours."""
    for o in range(4):
        R = _random_rotation(rng)
        kp = _box_keypoints(o, 1.5, 1.8, 4.0, R,
                            np.array([0.0, 1.6, 15.0]), nan_unused=True)
        dims = [[1.5, 1.8, 4.0]]
        loc_ref, ang_ref, dim_ref = run_reference_pose(
            ref_pose_loop, kp[None], [o], dims)
        assert np.isfinite(loc_ref).all() and np.isfinite(ang_ref).all() \
            and np.isfinite(dim_ref).all()
        res = solve_pose(np.asarray(kp, np.float32)[None], np.array([o]),
                         np.asarray(dims, np.float32))
        assert np.isfinite(np.asarray(res.locations)).all()
        assert np.isfinite(np.asarray(res.angles)).all()
        np.testing.assert_allclose(np.asarray(res.locations)[0], loc_ref[0],
                                   rtol=1e-4, atol=1e-4)


def test_reference_outlier_is_pure_function_of_orientation(ref_pose_loop):
    """Textual pin: the only assignments to `outlier` sit in the
    orientation-conditional at the top of the loop, so (o -> branch) is
    {0: outlier-2, 3: outlier-2, 1: outlier-0, 2: outlier-0} and the final
    `else:` (diagonal solve) can never execute."""
    assigns = re.findall(r"outlier = (\d)", ref_pose_loop)
    assert sorted(assigns) == ["0", "2"]
    guard = re.search(
        r"if orientations\[i\] == 0 or orientations\[i\] == 3:\s*\n"
        r"\s*outlier = 2\s*\n\s*else:\s*\n\s*outlier = 0",
        ref_pose_loop)
    assert guard is not None
