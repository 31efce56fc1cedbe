"""GPP-RetinaNet assembly: backbone -> FPN -> shared heads over P3..P7.

Mirrors the reference's training-graph model
(/root/reference/keras_retinanet_3D/models/retinanet.py:314-356): outputs are
the per-anchor regression (B, A, 12), dimension regression (B, A, 3C) and
sigmoid classification (B, A, 8C), concatenated over pyramid levels in
P3..P7 order. The anchor grid for the same ordering comes from
ops.anchors.anchors_for_shape on the padded input shape.

The inference-time graph (decode -> filter/NMS -> plane polling) lives in
ground_plane_polling_tpu.inference — unlike the reference we keep it a pure
jitted function instead of wrapping it in graph layers.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .fpn import FPN
from .heads import (BoxRegressionHead, ClassificationHead, DimRegressionHead,
                    FusedClsDimHead)

__all__ = ["GPPRetinaNet"]


def _pack_tail(features, gap: int = 1):
    """Pack P4..P7 into one canvas: P4 at the origin, the rest stacked
    vertically in a column to its right, `gap` zero pixels between regions.

    Returns (canvas, mask, layout) where layout is [(row, col, h, w)] per
    level. With the gap pixels re-zeroed after every tower conv (see
    heads._tower), a 3x3 SAME conv over the canvas produces exactly the
    per-level SAME-conv results inside each region — one big MXU-friendly
    conv instead of four launch-bound small ones. FLOP overhead of the
    padding is ~3% of the head total at KITTI shapes.
    """
    f0 = features[0]
    b, h0, w0, c = f0.shape
    col_w = max(f.shape[2] for f in features[1:])
    col_h = (sum(f.shape[1] for f in features[1:])
             + gap * (len(features) - 2))
    H = max(h0, col_h)
    W = w0 + gap + col_w

    canvas = jnp.zeros((b, H, W, c), f0.dtype)
    canvas = canvas.at[:, :h0, :w0].set(f0)
    layout = [(0, 0, h0, w0)]
    mask = np.zeros((1, H, W, 1), np.float32)
    mask[:, :h0, :w0] = 1.0
    r = 0
    for f in features[1:]:
        fh, fw = f.shape[1], f.shape[2]
        canvas = canvas.at[:, r:r + fh, w0 + gap:w0 + gap + fw].set(f)
        layout.append((r, w0 + gap, fh, fw))
        mask[:, r:r + fh, w0 + gap:w0 + gap + fw] = 1.0
        r += fh + gap
    return canvas, jnp.asarray(mask, f0.dtype), layout


class GPPRetinaNet(nn.Module):
    """Full detector trunk.

    Attributes
      backbone_fn: zero-arg constructor for a module whose __call__ maps an
        NHWC image batch to (C3, C4, C5).
      num_classes: C (KITTI Car+Van => 1).
      num_anchors: anchors per position (3 ratios x 4 scales = 12).
    """

    backbone_fn: Callable[[], nn.Module]
    num_classes: int = 1
    num_anchors: int = 12
    feature_size: int = 512
    dtype: Any = jnp.float32
    # pack P4..P7 into one canvas per head so each tower layer runs as 2
    # convs (P3 + packed tail) instead of 5 — same math (gap pixels are
    # re-zeroed each layer), much better MXU utilisation on the small
    # levels. Off by default to keep the reference-parity graph literal;
    # the serving/bench configs turn it on.
    pack_levels: bool = False
    # run the classification and dimension heads as ONE block-diagonal
    # 384-wide tower (exact same math; see heads.FusedClsDimHead).
    # Inference-only: params come from heads.fuse_cls_dim_params /
    # models.fuse_detector_params, training keeps the split tree.
    fuse_cls_dim: bool = False

    @nn.compact
    def __call__(self, images):
        c3, c4, c5 = self.backbone_fn()(images)
        features = FPN(feature_size=self.feature_size, dtype=self.dtype,
                       name="fpn")(c3, c4, c5)

        box_head = BoxRegressionHead(
            num_anchors=self.num_anchors, dtype=self.dtype, name="regression")
        if self.fuse_cls_dim:
            clsdim_head = FusedClsDimHead(
                num_classes=self.num_classes, num_anchors=self.num_anchors,
                dtype=self.dtype, name="clsdim")
            cls_head = dim_head = None
        else:
            cls_head = ClassificationHead(
                num_classes=self.num_classes, num_anchors=self.num_anchors,
                dtype=self.dtype, name="classification")
            dim_head = DimRegressionHead(
                num_classes=self.num_classes, num_anchors=self.num_anchors,
                dtype=self.dtype, name="regression_dim")

        if self.pack_levels:
            packed, mask, layout = _pack_tail(features[1:])

            def run(head):
                m3 = head(features[0], flatten=False)
                mt = head(packed, mask=mask, flatten=False)
                maps = [m3] + [mt[:, r:r + h, c:c + w]
                               for (r, c, h, w) in layout]
                fin = [head.finalize(m) for m in maps]
                if isinstance(fin[0], tuple):  # FusedClsDimHead
                    return tuple(jnp.concatenate(p, axis=1)
                                 for p in zip(*fin))
                return jnp.concatenate(fin, axis=1)

            regression = run(box_head)
            if self.fuse_cls_dim:
                classification, regression_dim = run(clsdim_head)
            else:
                regression_dim = run(dim_head)
                classification = run(cls_head)
        else:
            regression = jnp.concatenate(
                [box_head(f) for f in features], axis=1)
            if self.fuse_cls_dim:
                parts = [clsdim_head(f) for f in features]
                classification = jnp.concatenate(
                    [p[0] for p in parts], axis=1)
                regression_dim = jnp.concatenate(
                    [p[1] for p in parts], axis=1)
            else:
                regression_dim = jnp.concatenate(
                    [dim_head(f) for f in features], axis=1)
                classification = jnp.concatenate(
                    [cls_head(f) for f in features], axis=1)

        return {
            "regression": regression,
            "regression_dim": regression_dim,
            "classification": classification,
        }
