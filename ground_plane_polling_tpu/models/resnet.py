"""ResNet v1 backbones (50 / 101 / 152) in flax, frozen-BN.

Replaces the reference's keras_resnet backbone
(/root/reference/keras_retinanet_3D/models/resnet.py:71-114). Returns the
C3, C4, C5 feature maps (strides 8 / 16 / 32) consumed by the FPN.

TPU notes: NHWC layout (XLA's native conv layout on TPU), compute in a
configurable dtype (bfloat16 by default for inference) with float32
parameters; frozen BN folds to a fused multiply-add.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .common import FrozenBatchNorm

__all__ = ["ResNetBackbone", "RESNET_STAGES"]

RESNET_STAGES = {
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    "resnet152": (3, 8, 36, 3),
}


class BottleneckBlock(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck with identity or projection shortcut."""

    filters: int  # bottleneck width; output channels = 4 * filters
    stride: int = 1
    project: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        bn = lambda name: FrozenBatchNorm(dtype=self.dtype, name=name)
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), padding="SAME", use_bias=False,
            dtype=self.dtype, name=name,
        )

        shortcut = x
        if self.project:
            shortcut = conv(4 * self.filters, 1, self.stride, "conv_proj")(x)
            shortcut = bn("bn_proj")(shortcut)

        y = conv(self.filters, 1, self.stride, "conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = conv(self.filters, 3, 1, "conv2")(y)
        y = nn.relu(bn("bn2")(y))
        y = conv(4 * self.filters, 1, 1, "conv3")(y)
        y = bn("bn3")(y)
        return nn.relu(y + shortcut)


class ResNetBackbone(nn.Module):
    """ResNet v1; __call__ returns (C3, C4, C5).

    remat=True rematerializes each bottleneck block on the backward pass
    (jax.checkpoint): activations are recomputed instead of stored, cutting
    training HBM at the cost of ~1 extra forward — the standard TPU trade
    for deeper backbones (resnet101/152) or bigger batches.
    """

    stage_sizes: Sequence[int] = RESNET_STAGES["resnet50"]
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        # Explicit 3-pixel padding (not SAME): keras_resnet's stem is
        # ZeroPadding2D(3) + valid conv, which for stride-2 even inputs sits
        # one pixel left/up of SAME's asymmetric padding. Output shape is
        # identical; the window alignment must match for imported reference
        # weights to reproduce reference activations.
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        block_cls = nn.remat(BottleneckBlock) if self.remat else BottleneckBlock
        outputs = []
        widths = (64, 128, 256, 512)
        for stage, (n_blocks, w) in enumerate(zip(self.stage_sizes, widths)):
            for block in range(n_blocks):
                stride = 2 if (block == 0 and stage > 0) else 1
                x = block_cls(
                    filters=w,
                    stride=stride,
                    project=(block == 0),
                    dtype=self.dtype,
                    name=f"stage{stage + 1}_block{block + 1}",
                )(x)
            outputs.append(x)
        c2, c3, c4, c5 = outputs
        del c2
        return c3, c4, c5
