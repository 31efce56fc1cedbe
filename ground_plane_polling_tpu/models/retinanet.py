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
from flax import linen as nn

from .fpn import FPN
from .heads import BoxRegressionHead, ClassificationHead, DimRegressionHead

__all__ = ["GPPRetinaNet"]


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

    @nn.compact
    def __call__(self, images):
        c3, c4, c5 = self.backbone_fn()(images)
        features = FPN(feature_size=self.feature_size, dtype=self.dtype,
                       name="fpn")(c3, c4, c5)

        cls_head = ClassificationHead(
            num_classes=self.num_classes, num_anchors=self.num_anchors,
            dtype=self.dtype, name="classification")
        box_head = BoxRegressionHead(
            num_anchors=self.num_anchors, dtype=self.dtype, name="regression")
        dim_head = DimRegressionHead(
            num_classes=self.num_classes, num_anchors=self.num_anchors,
            dtype=self.dtype, name="regression_dim")

        regression = jnp.concatenate([box_head(f) for f in features], axis=1)
        regression_dim = jnp.concatenate([dim_head(f) for f in features], axis=1)
        classification = jnp.concatenate([cls_head(f) for f in features], axis=1)

        return {
            "regression": regression,
            "regression_dim": regression_dim,
            "classification": classification,
        }
