"""Box / keypoint / dimension encode-decode.

The detector regresses, per anchor, 12 values: the 2D box corners
(x1, y1, x2, y2) and four image keypoints (xl, yl, xm, ym, xr, yr, xt, yt)
— the left / middle / right bottom corners of the 3D-box footprint plus one
top corner. The x offsets of the "middle" and "top" keypoints are encoded as
absolute magnitudes relative to the anchor centre; *which side* they fall on
is carried by the sign half of the joint classification output.

Encoding/decoding matches the reference bit-for-bit:
  encode: /root/reference/keras_retinanet_3D/utils/anchors.py:268-336
  decode: /root/reference/keras_retinanet_3D/backend/common.py:23-81

Everything here is shape-polymorphic jnp (works under jit/vmap) and also runs
fine on numpy inputs at trace time.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "BOX_MEAN",
    "BOX_STD",
    "DIM_MEAN",
    "DIM_STD",
    "encode_boxes",
    "decode_boxes",
    "encode_dims",
    "decode_dims",
    "clip_boxes",
]

# Normalization constants for the 12 regression targets
# (dataset statistics; reference utils/anchors.py:272-274).
BOX_MEAN = np.array(
    [-0.0373, -0.0165, 0.0373, 0.0171, -0.0286, -0.0478, 0.2929, 0.0114,
     0.0288, -0.0589, 0.2932, -0.0007],
    dtype=np.float32,
)
BOX_STD = np.array(
    [0.1957, 0.1896, 0.1957, 0.1897, 0.1967, 0.2034, 0.2046, 0.1898,
     0.1964, 0.2052, 0.2048, 0.1903],
    dtype=np.float32,
)

# KITTI car (height, width, length) statistics
# (reference utils/anchors.py:320-322).
DIM_MEAN = np.array([1.6570, 1.7999, 4.2907], dtype=np.float32)
DIM_STD = np.array([0.2681, 0.2243, 0.6281], dtype=np.float32)


def encode_boxes(anchors, gt, mean=BOX_MEAN, std=BOX_STD):
    """Encode ground-truth boxes+keypoints against anchors.

    Args
      anchors: (..., 4)  anchor boxes (x1, y1, x2, y2).
      gt:      (..., 12) ground truth (x1,y1,x2,y2,xl,yl,xm,ym,xr,yr,xt,yt).

    Returns
      targets: (..., 12) normalized regression targets; the xm / xt entries
               are absolute values.
      sign:    (...,) in {0, 1} (0 if xm is left of the anchor centre; exactly
               on-centre encodes 0.5, same as the reference's (sign+1)/2).
    """
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    cx = (anchors[..., 0] + anchors[..., 2]) / 2.0

    dx1 = (gt[..., 0] - anchors[..., 0]) / aw
    dy1 = (gt[..., 1] - anchors[..., 1]) / ah
    dx2 = (gt[..., 2] - anchors[..., 2]) / aw
    dy2 = (gt[..., 3] - anchors[..., 3]) / ah
    dxl = (gt[..., 4] - anchors[..., 0]) / aw
    dyl = (gt[..., 5] - anchors[..., 3]) / ah
    dxm = (gt[..., 6] - cx) / aw
    dym = (gt[..., 7] - anchors[..., 3]) / ah
    dxr = (gt[..., 8] - anchors[..., 2]) / aw
    dyr = (gt[..., 9] - anchors[..., 3]) / ah
    dxt = (gt[..., 10] - cx) / aw
    dyt = (gt[..., 11] - anchors[..., 1]) / ah

    sign = (jnp.sign(dxm) + 1.0) / 2.0

    targets = jnp.stack(
        [dx1, dy1, dx2, dy2, dxl, dyl, jnp.abs(dxm), dym, dxr, dyr,
         jnp.abs(dxt), dyt],
        axis=-1,
    )
    targets = (targets - mean) / std
    return targets, sign


def decode_boxes(anchors, deltas, sign, mean=BOX_MEAN, std=BOX_STD):
    """Apply regression deltas to anchors, resolving xm/xt side from `sign`.

    Args
      anchors: (..., 4)
      deltas:  (..., 12) network output (normalized)
      sign:    (...,) in {-1, +1}: side of the anchor centre for xm and xt.

    Returns
      (..., 12) decoded (x1,y1,x2,y2,xl,yl,xm,ym,xr,yr,xt,yt) in pixels.
    """
    w = anchors[..., 2] - anchors[..., 0]
    h = anchors[..., 3] - anchors[..., 1]
    cx = (anchors[..., 0] + anchors[..., 2]) / 2.0

    d = deltas * std + mean
    x1 = anchors[..., 0] + d[..., 0] * w
    y1 = anchors[..., 1] + d[..., 1] * h
    x2 = anchors[..., 2] + d[..., 2] * w
    y2 = anchors[..., 3] + d[..., 3] * h
    xl = anchors[..., 0] + d[..., 4] * w
    yl = anchors[..., 3] + d[..., 5] * h
    xm = cx + d[..., 6] * w * sign
    ym = anchors[..., 3] + d[..., 7] * h
    xr = anchors[..., 2] + d[..., 8] * w
    yr = anchors[..., 3] + d[..., 9] * h
    xt = cx + d[..., 10] * w * sign
    yt = anchors[..., 1] + d[..., 11] * h

    return jnp.stack(
        [x1, y1, x2, y2, xl, yl, xm, ym, xr, yr, xt, yt], axis=-1
    )


def clip_boxes(boxes, image_hw):
    """Clip the leading 4 box coords to the image (reference ClipBoxes layer,
    layers/_misc.py:202-218). Extra trailing columns pass through."""
    h, w = image_hw
    x1 = jnp.clip(boxes[..., 0], 0.0, w)
    y1 = jnp.clip(boxes[..., 1], 0.0, h)
    x2 = jnp.clip(boxes[..., 2], 0.0, w)
    y2 = jnp.clip(boxes[..., 3], 0.0, h)
    clipped = jnp.stack([x1, y1, x2, y2], axis=-1)
    if boxes.shape[-1] > 4:
        return jnp.concatenate([clipped, boxes[..., 4:]], axis=-1)
    return clipped


def encode_dims(dims, mean=DIM_MEAN, std=DIM_STD):
    """Normalize (h, w, l); broadcasts over any leading shape (reference
    utils/anchors.py:315-336). `mean`/`std` may be length 3 or 3*num_classes
    matching the trailing axis of `dims`."""
    return (dims - mean) / std


def decode_dims(dims, mean=DIM_MEAN, std=DIM_STD):
    """Un-normalize network dimension output (reference backend/common.py:23-40).

    For multi-class output of shape (..., 3*C) the per-class (h, w, l) triple
    layout repeats mean/std across classes.
    """
    dims = jnp.asarray(dims)
    c = dims.shape[-1] // len(mean)
    if c > 1:
        mean = jnp.tile(jnp.asarray(mean), c)
        std = jnp.tile(jnp.asarray(std), c)
    return dims * std + mean
