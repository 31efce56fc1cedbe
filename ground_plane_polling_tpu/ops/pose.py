"""Closed-form 6-DoF pose recovery from polled 3D keypoints.

Vectorized, branch-free device-side math replacing the reference's per-
detection host loop with cv2.Rodrigues
(/root/reference/keras_retinanet_3D/bin/run_network.py:141-287).

Only the live code paths are implemented: orientations {1, 2} solve from
(X_m, X_r, X_t) and orientations {0, 3} from (X_l, X_m, X_t) — the
reference's `outlier` variable is a pure function of the orientation class
(run_network.py:147-150), which makes its diagonal-based third branch
unreachable dead code.

Common structure across the four orientations:
  height = |X_t - X_m|, along-edge length = |X_sel - X_m| where X_sel is
  X_r (o in {1,2}) or X_l (o in {0,3});
  y axis = (X_m - X_t)/h, x axis = s_x * (X_m - X_sel)/len with
  s_x = (+1, +1, -1, -1)[o], z axis = x cross y;
  centre = (X_m + X_sel)/2 + s_l * z * w/2 with s_l = (+1, -1, +1, -1)[o].
The measured edge replaces the length (o in {1,2}) or ... the reference
overwrites dims[0] (height) always, dims[2] (length) for the X-edge
orientations {1,2} / {0,3}-outlier cases, and keeps predicted width.

Rotation is reported as a Rodrigues (axis-angle) vector like cv2.Rodrigues.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["PoseResult", "solve_pose", "rodrigues_from_matrix",
           "matrix_from_rodrigues", "matrix_from_rodrigues_np",
           "corners_from_pose"]

_EPS = 1e-12


def rodrigues_from_matrix(R):
    """Rotation matrix (..., 3, 3) -> axis-angle vector (..., 3).

    Stable across the three regimes (generic, theta ~ 0, theta ~ pi),
    matching cv2.Rodrigues' convention (|vec| = angle in [0, pi]).
    """
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos)
    sin = jnp.sqrt(jnp.clip(1.0 - cos * cos, 0.0, 1.0))

    r = jnp.stack(
        [R[..., 2, 1] - R[..., 1, 2],
         R[..., 0, 2] - R[..., 2, 0],
         R[..., 1, 0] - R[..., 0, 1]],
        axis=-1,
    )
    # generic: axis = r / (2 sin theta)
    axis_generic = r / jnp.maximum(2.0 * sin, _EPS)[..., None]
    # theta ~ 0: vec ~ r / 2 (first order), handled by scaling below
    # theta ~ pi: R + I = 2 v v^T -> any strong column of (R + I) is the axis
    M = R + jnp.eye(3, dtype=R.dtype)
    diag = jnp.stack([M[..., 0, 0], M[..., 1, 1], M[..., 2, 2]], axis=-1)
    k = jnp.argmax(diag, axis=-1)
    col = jnp.take_along_axis(M, k[..., None, None], axis=-1)[..., 0]
    axis_pi = col / jnp.maximum(
        jnp.linalg.norm(col, axis=-1, keepdims=True), _EPS)

    near_pi = cos < -1.0 + 1e-6
    small = sin < 1e-6
    axis = jnp.where(near_pi[..., None], axis_pi, axis_generic)
    vec = theta[..., None] * axis
    vec_small = r / 2.0  # ~ axis*theta for tiny angles
    return jnp.where((small & ~near_pi)[..., None], vec_small, vec)


def matrix_from_rodrigues(vec):
    """Axis-angle (..., 3) -> rotation matrix (..., 3, 3)."""
    theta = jnp.linalg.norm(vec, axis=-1, keepdims=True)
    axis = vec / jnp.maximum(theta, _EPS)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack(
        [jnp.stack([zero, -z, y], axis=-1),
         jnp.stack([z, zero, -x], axis=-1),
         jnp.stack([-y, x, zero], axis=-1)],
        axis=-2,
    )
    t = theta[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=vec.dtype), K.shape)
    return eye + jnp.sin(t) * K + (1.0 - jnp.cos(t)) * (K @ K)


def matrix_from_rodrigues_np(vec):
    """Numpy twin of `matrix_from_rodrigues` for HOST-side formatting code
    (KITTI writer, visualization). The jnp version dispatches a handful of
    device ops per call; called per detection from a host loop that cost
    ~20 ms/row through the TPU relay — ~2 s per written frame at 100
    detections (tools/probe_run_network_wall.py). Same math, same shapes:
    axis-angle (..., 3) -> rotation matrix (..., 3, 3)."""
    import numpy as np

    vec = np.asarray(vec)
    theta = np.linalg.norm(vec, axis=-1, keepdims=True)
    axis = vec / np.maximum(theta, _EPS)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = np.zeros_like(x)
    K = np.stack(
        [np.stack([zero, -z, y], axis=-1),
         np.stack([z, zero, -x], axis=-1),
         np.stack([-y, x, zero], axis=-1)],
        axis=-2,
    )
    t = theta[..., None]
    eye = np.broadcast_to(np.eye(3, dtype=vec.dtype), K.shape)
    return eye + np.sin(t) * K + (1.0 - np.cos(t)) * (K @ K)


class PoseResult(NamedTuple):
    locations: jax.Array   # (..., 3) box bottom-centre in camera coords
    angles: jax.Array      # (..., 3) Rodrigues rotation vector
    dimensions: jax.Array  # (..., 3) refined (h, w, l)


@jax.jit
def solve_pose(keypoints, orientations, dimensions):
    """Recover pose for each detection.

    Args
      keypoints:    (..., 4, 3) polled 3D keypoints (X_l, X_m, X_r, X_t).
      orientations: (...,) int orientation class.
      dimensions:   (..., 3) predicted (h, w, l).
    """
    X_l = keypoints[..., 0, :]
    X_m = keypoints[..., 1, :]
    X_r = keypoints[..., 2, :]
    X_t = keypoints[..., 3, :]

    o = orientations
    use_right = (o == 1) | (o == 2)
    X_sel = jnp.where(use_right[..., None], X_r, X_l)

    h = jnp.linalg.norm(X_t - X_m, axis=-1)
    edge = jnp.linalg.norm(X_sel - X_m, axis=-1)
    w = dimensions[..., 1]

    s_x = jnp.asarray([1.0, 1.0, -1.0, -1.0])[o]
    s_l = jnp.asarray([1.0, -1.0, 1.0, -1.0])[o]

    y_dir = (X_m - X_t) / jnp.maximum(h, _EPS)[..., None]
    x_dir = s_x[..., None] * (X_m - X_sel) / jnp.maximum(edge, _EPS)[..., None]
    z_dir = jnp.cross(x_dir, y_dir)

    # every live reference path refines dims[0] = measured height and
    # dims[2] = measured horizontal edge, keeping the predicted width
    # (run_network.py:168-169, 179-180, 205-206, 238-239)
    dims_out = jnp.stack([h, w, edge], axis=-1)

    locations = (X_m + X_sel) / 2.0 + s_l[..., None] * z_dir * w[..., None] / 2.0

    R = jnp.stack([x_dir, y_dir, z_dir], axis=-1)  # columns are the axes
    # With noisy polled keypoints x_dir and y_dir are not exactly
    # orthogonal, so R is only near-rotation. cv2.Rodrigues (which the
    # reference feeds this same frame, run_network.py:166 etc.) resolves
    # that by projecting to the NEAREST rotation, U @ Vt of the SVD —
    # verified to machine precision in tests/test_pose_golden.py. Match it.
    # det(R) = |x x y|^2 >= 0 by construction, so the reflection branch of
    # the polar projection can't arise.
    U, _, Vt = jnp.linalg.svd(R)
    angles = rodrigues_from_matrix(U @ Vt)
    return PoseResult(locations=locations, angles=angles, dimensions=dims_out)


def corners_from_pose(dimensions, R, location):
    """World-frame 8 corners (3, 8) of a KITTI box from (h, w, l), a
    rotation matrix and the bottom-face-centre location.

    Canonical corner order (the reference's run_network.py:294-310):
    bottom face first (x = +-l/2, z = +-w/2, y = 0) then the top face
    (y = -h; camera y points down). Single shared implementation for the
    KITTI writer and the 3D visualization so the txt output and the
    rendered wireframes can never disagree about the same box.
    """
    import numpy as np

    h, w, l = [float(v) for v in dimensions]
    x_c = np.array([l / 2, l / 2, -l / 2, -l / 2,
                    l / 2, l / 2, -l / 2, -l / 2])
    y_c = np.array([0.0, 0, 0, 0, -h, -h, -h, -h])
    z_c = np.array([w / 2, -w / 2, -w / 2, w / 2,
                    w / 2, -w / 2, -w / 2, w / 2])
    return (np.asarray(R) @ np.stack([x_c, y_c, z_c])
            + np.asarray(location)[:, None])
