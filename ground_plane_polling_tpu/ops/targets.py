"""Anchor target assignment — fully vectorized, jit/vmap-friendly.

Replaces the reference's per-image numpy hot loop
(/root/reference/keras_retinanet_3D/utils/anchors.py:22-101 and
preprocessing/generator.py:273-314) with a single device-side program over
padded, fixed-shape annotation tensors. Semantics are reproduced exactly,
including the quirks:

  * every anchor is matched to its argmax-IoU annotation; IoU < 0.4 =>
    negative, >= 0.5 => positive, in between => ignore (-1),
  * positives light up a single class-orientation slot `4*class + orient` in
    a (A, 4C) grid, which is then duplicated into two sign halves and gated
    by which side of the anchor centre the ground-truth xm keypoint falls
    (generator.py:296-298),
  * regression targets are computed for ALL anchors against their assigned
    annotation (the loss masks them by the state column),
  * anchors whose centre lies in any ignore region get state -1,
  * with zero annotations the assigned boxes/dims are all-zero rows, and the
    encoded targets are encode(anchor, 0) — matching the reference, which
    runs bbox_transform on a zero annotation array in that case.

Padding contract: `annotations` is (G_max, 17) with `ann_mask` marking real
rows; pad rows must be zeros (they then behave exactly like the reference's
zero-filled no-annotation arrays). `ignore_regions` is (M_max, 4) with
`ignore_mask`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import box_coder
from .overlap import iou_matrix

__all__ = ["anchor_targets", "batched_anchor_targets"]


@functools.partial(jax.jit, static_argnames=("num_classes",))
def anchor_targets(
    anchors,
    annotations,
    ann_mask,
    ignore_regions,
    ignore_mask,
    num_classes: int = 1,
    negative_overlap: float = 0.4,
    positive_overlap: float = 0.5,
):
    """Compute training targets for one image.

    Args
      anchors:        (A, 4) float32.
      annotations:    (G, 17) float32, padded with zero rows:
                      (x1,y1,x2,y2, xl,yl,xm,ym,xr,yr,xt,yt, h,w,l, class, orient).
      ann_mask:       (G,) bool, True for real annotations.
      ignore_regions: (M, 4) float32 padded.
      ignore_mask:    (M,) bool.
      num_classes:    C.

    Returns dict with
      labels:         (A, 8C) — classification targets (-1 ignore / 0 / 1,
                      sign-gated duplicate halves).
      regression:     (A, 13) — 12 encoded box+keypoint targets + state col.
      regression_dim: (A*C, 4) — per-class (h,w,l) targets + per-class state.
    """
    num_anchors = anchors.shape[0]
    c = num_classes

    # --- IoU assignment ------------------------------------------------
    overlaps = iou_matrix(anchors, annotations[:, :4])
    overlaps = jnp.where(ann_mask[None, :], overlaps, -1.0)
    argmax_inds = jnp.argmax(overlaps, axis=1)
    max_overlaps = jnp.take_along_axis(overlaps, argmax_inds[:, None], axis=1)[:, 0]

    assigned = annotations[argmax_inds]  # (A, 17)
    positive = max_overlaps >= positive_overlap
    negative = max_overlaps < negative_overlap

    cls = assigned[:, 15].astype(jnp.int32)
    orient = assigned[:, 16].astype(jnp.int32)

    # --- class-orientation labels (A, 4C) -------------------------------
    slot = 4 * cls + orient
    onehot4c = jax.nn.one_hot(slot, 4 * c, dtype=anchors.dtype)
    labels4c = jnp.where(
        positive[:, None],
        onehot4c,
        jnp.where(negative[:, None], 0.0, -1.0),
    )
    onehot_dim = jax.nn.one_hot(cls, c, dtype=anchors.dtype)
    labels_dim = jnp.where(
        positive[:, None],
        onehot_dim,
        jnp.where(negative[:, None], 0.0, -1.0),
    )

    # --- ignore-region masking (anchor centre inside any region) --------
    cx = (anchors[:, 0] + anchors[:, 2]) / 2.0
    cy = (anchors[:, 1] + anchors[:, 3]) / 2.0
    inside = (
        (cx[:, None] >= ignore_regions[None, :, 0])
        & (cy[:, None] >= ignore_regions[None, :, 1])
        & (cx[:, None] <= ignore_regions[None, :, 2])
        & (cy[:, None] <= ignore_regions[None, :, 3])
        & ignore_mask[None, :]
    )
    ignored = jnp.any(inside, axis=1)
    labels4c = jnp.where(ignored[:, None], -1.0, labels4c)
    labels_dim = jnp.where(ignored[:, None], -1.0, labels_dim)

    # --- regression targets + sign-duplicated labels ---------------------
    targets12, sign01 = box_coder.encode_boxes(anchors, assigned[:, :12])
    anchor_state = jnp.max(labels4c, axis=1)  # (A,) in {-1, 0, 1}

    sign_neg = jnp.tile((1.0 - sign01)[:, None], (1, 4 * c))
    sign_pos = jnp.tile(sign01[:, None], (1, 4 * c))
    labels8c = jnp.concatenate([labels4c * sign_neg, labels4c * sign_pos], axis=1)
    labels8c = jnp.where(anchor_state[:, None] == -1.0, -1.0, labels8c)

    regression = jnp.concatenate([targets12, anchor_state[:, None]], axis=1)

    # --- dimension targets ------------------------------------------------
    dims_tiled = jnp.tile(assigned[:, 12:15], (1, c))  # (A, 3C)
    dims_norm = box_coder.encode_dims(
        dims_tiled, jnp.tile(box_coder.DIM_MEAN, c), jnp.tile(box_coder.DIM_STD, c)
    )
    regression_dim = jnp.concatenate(
        [dims_norm.reshape(num_anchors * c, 3), labels_dim.reshape(num_anchors * c, 1)],
        axis=1,
    )

    return {
        "labels": labels8c,
        "regression": regression,
        "regression_dim": regression_dim,
    }


def batched_anchor_targets(anchors, annotations, ann_mask, ignore_regions,
                           ignore_mask, num_classes: int = 1, **kw):
    """vmap of `anchor_targets` over a leading batch axis (anchors shared)."""
    fn = functools.partial(anchor_targets, num_classes=num_classes, **kw)
    return jax.vmap(fn, in_axes=(None, 0, 0, 0, 0))(
        anchors, annotations, ann_mask, ignore_regions, ignore_mask
    )
