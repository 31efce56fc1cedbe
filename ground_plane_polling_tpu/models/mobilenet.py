"""MobileNet v1 backbones with width multiplier alpha (reference
models/mobilenet.py:103-105 uses conv_pw_5 / conv_pw_11 / conv_pw_13 as
C3 / C4 / C5).
"""

from __future__ import annotations

import functools
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .common import FrozenBatchNorm

__all__ = ["MobileNetBackbone", "REGISTRY"]

# (pointwise filters, stride) for the 13 depthwise-separable blocks
_BLOCKS = [
    (64, 1), (128, 2), (128, 1), (256, 2), (256, 1), (512, 2),
    (512, 1), (512, 1), (512, 1), (512, 1), (512, 1), (1024, 2), (1024, 1),
]
# reference alphas: mobilenet128/160/192/224 map to input sizes; width
# multiplier is the `_%.1f` suffix — expose the common ones
_ALPHAS = {"mobilenet224_1.0": 1.0, "mobilenet224_0.75": 0.75,
           "mobilenet224_0.5": 0.5, "mobilenet224_0.25": 0.25}


class MobileNetBackbone(nn.Module):
    alpha: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        a = self.alpha
        bn = lambda name: FrozenBatchNorm(dtype=self.dtype, name=name)
        x = x.astype(self.dtype)
        x = nn.Conv(int(32 * a), (3, 3), strides=(2, 2), padding="SAME",
                    use_bias=False, dtype=self.dtype, name="conv0")(x)
        x = nn.relu6(bn("bn0")(x))

        feats = {}
        for i, (f, s) in enumerate(_BLOCKS, start=1):
            ch = x.shape[-1]
            x = nn.Conv(ch, (3, 3), strides=(s, s), padding="SAME",
                        feature_group_count=ch, use_bias=False,
                        dtype=self.dtype, name=f"dw{i}")(x)
            x = nn.relu6(bn(f"dw{i}_bn")(x))
            x = nn.Conv(int(f * a), (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"pw{i}")(x)
            x = nn.relu6(bn(f"pw{i}_bn")(x))
            feats[i] = x
        # pw5 (stride 8), pw11 (stride 16), pw13 (stride 32)
        return feats[5], feats[11], feats[13]


def _make(name: str, dtype):
    return MobileNetBackbone(alpha=_ALPHAS[name], dtype=dtype,
                             name="backbone")


REGISTRY = {name: functools.partial(_make, name) for name in _ALPHAS}
