"""DenseNet-121 / 169 / 201 backbones (reference models/densenet.py:78-85
uses the dense-block concatenation outputs as C3, C4, C5).

C3/C4/C5 = outputs of dense blocks 2/3/4 (strides 8/16/32). Frozen BN
throughout, matching this framework's backbone convention.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .common import FrozenBatchNorm

__all__ = ["DenseNetBackbone", "REGISTRY"]

_CFG = {
    "densenet121": (6, 12, 24, 16),
    "densenet169": (6, 12, 32, 32),
    "densenet201": (6, 12, 48, 32),
}
_GROWTH = 32


class _DenseLayer(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="bn1")(x))
        y = nn.Conv(4 * _GROWTH, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(y)
        y = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="bn2")(y))
        y = nn.Conv(_GROWTH, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseNetBackbone(nn.Module):
    block_sizes: Sequence[int] = _CFG["densenet121"]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        # keras.applications densenet stem is ZeroPadding2D(3) + valid conv
        # and ZeroPadding2D(1) + valid pool — one pixel off SAME for even
        # stride-2 inputs; explicit padding keeps imported weights exact
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="stem_bn")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))

        feats = []
        for b, n in enumerate(self.block_sizes):
            for i in range(n):
                x = _DenseLayer(dtype=self.dtype,
                                name=f"block{b + 1}_layer{i + 1}")(x)
            feats.append(x)
            if b < len(self.block_sizes) - 1:
                # transition: 1x1 halving conv + 2x2 avg pool
                x = nn.relu(
                    FrozenBatchNorm(dtype=self.dtype, name=f"trans{b + 1}_bn")(x))
                x = nn.Conv(x.shape[-1] // 2, (1, 1), use_bias=False,
                            dtype=self.dtype, name=f"trans{b + 1}_conv")(x)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2), padding="SAME")
        return feats[1], feats[2], feats[3]


def _make(name: str, dtype):
    return DenseNetBackbone(block_sizes=_CFG[name], dtype=dtype,
                            name="backbone")


REGISTRY = {name: functools.partial(_make, name) for name in _CFG}
