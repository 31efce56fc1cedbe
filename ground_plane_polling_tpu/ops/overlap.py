"""Pairwise IoU between axis-aligned boxes (jnp, jit/vmap friendly).

Matches reference utils/anchors.py:339-363 including the eps clamp on the
union (so degenerate/zero boxes give IoU 0, never NaN).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["iou_matrix", "iou_one_to_many"]

_EPS = np.finfo(np.float64).eps


def iou_matrix(a, b):
    """IoU between every box in `a` (N, 4) and every box in `b` (K, 4).

    Returns (N, K). Boxes are (x1, y1, x2, y2).
    """
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    iw = jnp.minimum(a[:, None, 2], b[None, :, 2]) - jnp.maximum(
        a[:, None, 0], b[None, :, 0]
    )
    ih = jnp.minimum(a[:, None, 3], b[None, :, 3]) - jnp.maximum(
        a[:, None, 1], b[None, :, 1]
    )
    iw = jnp.maximum(iw, 0.0)
    ih = jnp.maximum(ih, 0.0)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    inter = iw * ih
    union = jnp.maximum(area_a[:, None] + area_b[None, :] - inter, _EPS)
    return inter / union


def iou_one_to_many(box, boxes):
    """IoU of one box (4,) against many (K, 4). Returns (K,)."""
    iw = jnp.minimum(box[2], boxes[:, 2]) - jnp.maximum(box[0], boxes[:, 0])
    ih = jnp.minimum(box[3], boxes[:, 3]) - jnp.maximum(box[1], boxes[:, 1])
    iw = jnp.maximum(iw, 0.0)
    ih = jnp.maximum(ih, 0.0)
    inter = iw * ih
    area = (box[2] - box[0]) * (box[3] - box[1])
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    union = jnp.maximum(area + areas - inter, _EPS)
    return inter / union
