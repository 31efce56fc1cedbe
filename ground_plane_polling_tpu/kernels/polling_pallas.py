"""Pallas TPU kernel for ground-plane polling.

The jnp formulation (ops/polling.py) materializes (B, D, P, 4, 3) keypoint
tensors in HBM — ~350 MB of traffic for the 22k-plane database. This kernel
streams the plane database through VMEM in (4, P_TILE) blocks and emits only
the two (B*D, P) scoreboards (votes, winding-masked residual); everything
else lives in registers/VMEM. Per (detection, plane) the work is ~150 VPU
flops on (8, P_TILE) blocks — lane-parallel over planes, sublane-parallel
over detections.

The vote-gating argmin and the winning-plane keypoint reconstruction are
cheap (B, D, P)- and (B, D)-sized jnp follow-ups in the same jit program
(the reconstruction re-intersects each detection's rays with just its
winning plane).

Semantics match ops/polling.fit_road_planes exactly (same poll pairs,
0.7 m threshold, winding check, residual-100 disqualification, /6
normalization); see that module and reference layers/fit_road_planes.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.polling import (DISQUALIFIED_RESIDUAL, NUM_POLLS,
                           POLL_THRESHOLD_M, PollResult, normalize_planes)

__all__ = ["fit_road_planes_pallas"]

D_TILE = 32     # detections per block (multiple of the 8 VPU sublanes);
                # 32 x 512 f32 blocks keep ~40 live intermediates under
                # ~3 MB of VMEM while cutting grid-invocation overhead 4x
                # vs an 8-row tile
P_TILE = 512    # planes per block (VPU lanes; multiple of 128)


def _poll_kernel(rays_ref, exp_ref, planes_ref, votes_ref, res_ref):
    """One (D_TILE, P_TILE) block of one batch element's scoreboard.

    Blocks carry a leading unit batch dim: the grid is
    (B, D tiles, P tiles), so a single pallas_call covers the whole batch
    (compile time and program size are independent of B) while each batch
    element still reads its own plane database.
    """
    n0 = planes_ref[0, 0:1, :]
    n1 = planes_ref[0, 1:2, :]
    n2 = planes_ref[0, 2:3, :]
    dd = planes_ref[0, 3:4, :]

    def ray(k):
        return (rays_ref[0, :, 3 * k + 0][:, None],
                rays_ref[0, :, 3 * k + 1][:, None],
                rays_ref[0, :, 3 * k + 2][:, None])

    # intersect the l/m/r rays with every plane in the block
    X = []
    for k in range(3):
        rx, ry, rz = ray(k)
        ndot = rx * n0 + ry * n1 + rz * n2
        s = jnp.abs(dd / ndot)  # |-d / (n.r)|
        X.append((rx * s, ry * s, rz * s))
    (lx, ly, lz), (mx, my, mz), (rx_, ry_, rz_) = X

    # winding: y component of (X_l - X_m) x (X_r - X_m)
    ex, ez = lx - mx, lz - mz
    fx, fz = rx_ - mx, rz_ - mz
    wind_y = ez * fx - ex * fz

    # top point: X_t = X_m - (perp.X_m / perp.n) * n,
    # perp = d_t x (n x d_t)
    tx, ty, tz = ray(3)
    cx = n1 * tz - n2 * ty
    cy = n2 * tx - n0 * tz
    cz = n0 * ty - n1 * tx
    px = ty * cz - tz * cy
    py = tz * cx - tx * cz
    pz = tx * cy - ty * cx
    t = (px * mx + py * my + pz * mz) / (px * n0 + py * n1 + pz * n2)
    qx, qy, qz = mx - t * n0, my - t * n1, mz - t * n2  # X_t

    def dist(a, b):
        dx, dy, dz = a[0] - b[0], a[1] - b[1], a[2] - b[2]
        return jnp.sqrt(dx * dx + dy * dy + dz * dz)

    Xl, Xm, Xr, Xt = (lx, ly, lz), (mx, my, mz), (rx_, ry_, rz_), (qx, qy, qz)
    pairs = [(Xm, Xt), (Xl, Xm), (Xm, Xr), (Xl, Xr), (Xl, Xt), (Xr, Xt)]

    votes = jnp.zeros(wind_y.shape, jnp.float32)
    residual = jnp.zeros(wind_y.shape, jnp.float32)
    for i, (a, b) in enumerate(pairs):
        r = jnp.abs(dist(a, b) - exp_ref[0, :, i][:, None])
        votes = votes + (r <= POLL_THRESHOLD_M).astype(jnp.float32)
        residual = residual + r

    res_ref[0, :, :] = jnp.where(wind_y < 0.0, DISQUALIFIED_RESIDUAL,
                                 residual)
    votes_ref[0, :, :] = votes


def _expected_distances(dimensions, orientations):
    """(B, D, 6) expected distance per poll (orientation-dependent)."""
    h = dimensions[..., 0:1]
    w = dimensions[..., 1:2]
    l = dimensions[..., 2:3]
    d_hw = jnp.linalg.norm(dimensions[..., (0, 1)], axis=-1, keepdims=True)
    d_wl = jnp.linalg.norm(dimensions[..., (1, 2)], axis=-1, keepdims=True)
    d_hl = jnp.linalg.norm(dimensions[..., (0, 2)], axis=-1, keepdims=True)
    onehot = jax.nn.one_hot(orientations, 4, dtype=dimensions.dtype)

    def pick(d0, d1, d2, d3):
        return jnp.sum(onehot * jnp.concatenate([d0, d1, d2, d3], -1),
                       axis=-1, keepdims=True)

    return jnp.concatenate([
        h,
        pick(l, w, w, l),
        pick(w, l, l, w),
        d_wl,
        pick(d_hl, d_hw, d_hw, d_hl),
        pick(d_hw, d_hl, d_hl, d_hw),
    ], axis=-1)


def _rays_from_boxes(boxes, P_inv):
    """(B, D, 4, 3) forward-pointing keypoint rays."""
    b, d, _ = boxes.shape
    kp = boxes[..., 4:12].reshape(b, d, 4, 2)
    kp_h = jnp.concatenate([kp, jnp.ones((b, d, 4, 1), boxes.dtype)], axis=-1)
    rays = jnp.einsum("bij,bdkj->bdki", P_inv, kp_h)[..., 0:3]
    return rays * jnp.sign(rays[..., 2:3])


def _reconstruct_keypoints(rays, plane):
    """Keypoints of one detection on one plane: rays (4, 3), plane (4,)."""
    n, off = plane[0:3], plane[3]
    ndot = rays[0:3] @ n
    s = jnp.abs(off / ndot)
    X_lmr = rays[0:3] * s[:, None]
    X_m = X_lmr[1]
    d_t = rays[3]
    perp = jnp.cross(d_t, jnp.cross(n, d_t))
    t = jnp.dot(perp, X_m) / jnp.dot(perp, n)
    X_t = X_m - t * n
    return jnp.concatenate([X_lmr, X_t[None]], axis=0)  # (4, 3)


@jax.jit
def fit_road_planes_pallas(boxes, dimensions, orientations, P_inv, planes):
    """Drop-in replacement for ops.polling.fit_road_planes."""
    b, d, _ = boxes.shape
    p = planes.shape[1]
    d_pad = -(-d // D_TILE) * D_TILE
    p_pad = -(-p // P_TILE) * P_TILE
    interpret = jax.default_backend() != "tpu"

    planes_n = normalize_planes(planes)
    rays = _rays_from_boxes(boxes, P_inv)  # (B, D, 4, 3)
    expected = _expected_distances(dimensions, orientations)  # (B, D, 6)

    # one pallas_call for the whole batch: grid (B, D tiles, P tiles);
    # blocks carry a leading unit batch dim so each element reads its own
    # plane database, and compile time is independent of B
    planes_t = jnp.zeros((b, 4, p_pad), jnp.float32).at[:, :, :p].set(
        jnp.transpose(planes_n, (0, 2, 1)))
    rays_p = jnp.zeros((b, d_pad, 12), jnp.float32).at[:, :d].set(
        rays.reshape(b, d, 12))
    exp_p = jnp.zeros((b, d_pad, 8), jnp.float32).at[:, :d, :6].set(expected)

    grid = (b, d_pad // D_TILE, p_pad // P_TILE)
    votes, residual = pl.pallas_call(
        _poll_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, D_TILE, 12), lambda bi, i, j: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D_TILE, 8), lambda bi, i, j: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, P_TILE), lambda bi, i, j: (bi, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, D_TILE, P_TILE), lambda bi, i, j: (bi, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D_TILE, P_TILE), lambda bi, i, j: (bi, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, d_pad, p_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, d_pad, p_pad), jnp.float32),
        ],
        interpret=interpret,
    )(rays_p, exp_p, planes_t)
    votes = votes[:, :d, :p]       # (B, D, P)
    residual = residual[:, :d, :p]

    # vote gating + argmin (reference fit_road_planes.py:111-119)
    max_votes = jnp.max(votes, axis=-1, keepdims=True)
    residual = jnp.where(votes < max_votes, DISQUALIFIED_RESIDUAL, residual)
    best = jnp.argmin(residual, axis=-1)  # (B, D)

    keyplanes = jnp.take_along_axis(
        planes_n[:, None], best[..., None, None], axis=2)
    best_res = jnp.take_along_axis(residual, best[..., None], axis=-1)[..., 0]

    # reconstruct the winning keypoints (per detection, one plane)
    keypoints = jax.vmap(jax.vmap(_reconstruct_keypoints))(
        rays, keyplanes[:, :, 0, :])

    return PollResult(keypoints=keypoints, keyplanes=keyplanes,
                      residuals=best_res / float(NUM_POLLS))
