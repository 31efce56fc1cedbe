"""Ground-plane polling: score every road-plane hypothesis for every
detection and pick the best-fitting plane + 3D keypoints.

Semantics mirror /root/reference/keras_retinanet_3D/layers/fit_road_planes.py
exactly (thresholds, winding check, the residual=100 masking constant, the
residual/6 normalization, and argmin tie-breaking), but the implementation is
one fused batched einsum chain over (B, D, P) instead of a tf graph with
map_fn gathers — XLA fuses the whole poll into a handful of VPU loops, and
the plane axis can be tiled by a Pallas kernel for the 22k-plane database
(see kernels/polling_pallas.py).

Geometry recap (camera coordinates, KITTI: x right, y down, z forward):
  * each of the 4 predicted image keypoints (l, m, r, t) is back-projected
    to a ray d = P_inv @ (u, v, 1), sign-fixed so it points forward (z > 0);
  * the l/m/r rays are intersected with every plane in the database;
  * the t (top) point is X_m shifted along the plane normal to meet the top
    ray's vertical plane;
  * six "polls" compare induced keypoint distances with the predicted 3D
    dimensions (orientation determines which dimension each pair measures);
    each poll votes if its residual is below 0.7 m;
  * planes that don't reach the max vote count, or whose l/m/r triangle
    winds the wrong way, are disqualified (residual := 100);
  * the plane with minimum accumulated residual wins.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["PollResult", "fit_road_planes"]

POLL_THRESHOLD_M = 0.7
DISQUALIFIED_RESIDUAL = 100.0
NUM_POLLS = 6


class PollResult(NamedTuple):
    keypoints: jax.Array  # (B, D, 4, 3) 3D keypoints (X_l, X_m, X_r, X_t)
    keyplanes: jax.Array  # (B, D, 1, 4) winning plane (normalized)
    residuals: jax.Array  # (B, D) mean residual of the winning plane


def normalize_planes(planes):
    """Flip plane coefficient signs so the b component is negative (normal
    points 'up' in camera coords where y is down) and scale to unit normal."""
    direction = -jnp.sign(planes[..., 1:2])
    planes = planes * direction
    return planes / jnp.linalg.norm(planes[..., 0:3], axis=-1, keepdims=True)


@jax.jit
def fit_road_planes(boxes, dimensions, orientations, P_inv, planes):
    """Args
      boxes:        (B, D, 12) filtered boxes; last 8 cols are the keypoints
                    (xl, yl, xm, ym, xr, yr, xt, yt). Padded rows (-1) are
                    fine — they produce garbage keypoints that callers mask.
      dimensions:   (B, D, 3) predicted (h, w, l).
      orientations: (B, D) int orientation class in [0, 4).
      P_inv:        (B, 4, 3) pseudo-inverse camera projections.
      planes:       (B, P, 4) road-plane coefficient database.

    Returns PollResult.
    """
    b, d, _ = boxes.shape

    h = dimensions[..., 0:1]
    w = dimensions[..., 1:2]
    l = dimensions[..., 2:3]
    diag_hw = jnp.linalg.norm(dimensions[..., (0, 1)], axis=-1, keepdims=True)
    diag_wl = jnp.linalg.norm(dimensions[..., (1, 2)], axis=-1, keepdims=True)
    diag_hl = jnp.linalg.norm(dimensions[..., (0, 2)], axis=-1, keepdims=True)
    onehot = jax.nn.one_hot(orientations, 4, dtype=boxes.dtype)  # (B, D, 4)

    def orient_pick(d0, d1, d2, d3):
        """Select a per-detection dimension by orientation class."""
        stacked = jnp.concatenate([d0, d1, d2, d3], axis=-1)  # (B, D, 4)
        return jnp.sum(onehot * stacked, axis=-1)  # (B, D)

    planes_n = normalize_planes(planes)
    normals = planes_n[..., 0:3]  # (B, P, 3)
    offsets = planes_n[..., 3]    # (B, P)

    # back-project the 4 keypoints to rays (forward-pointing)
    kp = boxes[..., 4:12].reshape(b, d, 4, 2)
    kp_h = jnp.concatenate([kp, jnp.ones((b, d, 4, 1), boxes.dtype)], axis=-1)
    rays4 = jnp.einsum("bij,bdkj->bdki", P_inv, kp_h)  # (B, D, 4kp, 4comp)
    rays = rays4[..., 0:3]
    rays = rays * jnp.sign(rays[..., 2:3])

    # intersect l/m/r rays with every plane: X = |(-off / n.d)| * d
    ndot = jnp.einsum("bpc,bdkc->bdpk", normals, rays[:, :, 0:3, :])
    scale = -offsets[:, None, :, None] / ndot  # (B, D, P, 3)
    X_lmr = rays[:, :, None, 0:3, :] * jnp.abs(scale)[..., None]  # (B,D,P,3,3)
    X_l, X_m, X_r = X_lmr[..., 0, :], X_lmr[..., 1, :], X_lmr[..., 2, :]

    # winding check: y component of (X_l - X_m) x (X_r - X_m)
    z_dir_check = jnp.cross(X_l - X_m, X_r - X_m)[..., 1]  # (B, D, P)

    # top point: slide X_m along the plane normal onto the top ray's plane.
    # perp = d_t x (n x d_t) spans the plane containing the top ray and
    # perpendicular to the (n, d_t) plane; X_t = X_m - (perp.X_m / perp.n) n
    n_b = normals[:, None, :, :]                   # (B, 1, P, 3)
    d_t = rays[:, :, None, 3, :]                   # (B, D, 1, 3)
    perp = jnp.cross(d_t, jnp.cross(n_b, d_t))     # (B, D, P, 3)
    num = jnp.sum(perp * X_m, axis=-1)
    den = jnp.sum(perp * n_b, axis=-1)
    X_t = X_m - (num / den)[..., None] * n_b       # (B, D, P, 3)

    # six polls: (pair distance, expected dimension)
    def dist(a, c):
        return jnp.linalg.norm(a - c, axis=-1)  # (B, D, P)

    polls = [
        (dist(X_m, X_t), h[..., 0]),
        (dist(X_l, X_m), orient_pick(l, w, w, l)),
        (dist(X_m, X_r), orient_pick(w, l, l, w)),
        (dist(X_l, X_r), diag_wl[..., 0]),
        (dist(X_l, X_t), orient_pick(diag_hl, diag_hw, diag_hw, diag_hl)),
        (dist(X_r, X_t), orient_pick(diag_hw, diag_hl, diag_hl, diag_hw)),
    ]
    votes = jnp.zeros(z_dir_check.shape, boxes.dtype)
    residuals = jnp.zeros(z_dir_check.shape, boxes.dtype)
    for dd, expected in polls:
        r = jnp.abs(dd - expected[..., None])
        votes = votes + (r <= POLL_THRESHOLD_M).astype(boxes.dtype)
        residuals = residuals + r

    # disqualify non-max-vote and wrong-winding planes
    max_votes = jnp.max(votes, axis=-1, keepdims=True)
    residuals = jnp.where(votes < max_votes, DISQUALIFIED_RESIDUAL, residuals)
    residuals = jnp.where(z_dir_check < 0.0, DISQUALIFIED_RESIDUAL, residuals)

    best = jnp.argmin(residuals, axis=-1)  # (B, D)
    take = lambda x: jnp.take_along_axis(
        x, best[..., None, None, None], axis=2
    )[:, :, 0]
    X4 = jnp.concatenate([X_lmr, X_t[..., None, :]], axis=-2)  # (B,D,P,4,3)

    keypoints = take(X4)  # (B, D, 4, 3)
    keyplanes = jnp.take_along_axis(
        planes_n[:, None], best[..., None, None], axis=2
    )  # (B, D, 1, 4) via broadcast of planes over D
    best_residual = jnp.take_along_axis(residuals, best[..., None], axis=-1)
    return PollResult(
        keypoints=keypoints,
        keyplanes=keyplanes,
        residuals=best_residual[..., 0] / float(NUM_POLLS),
    )
