"""VGG-16 / VGG-19 backbones (reference models/vgg.py:92-94 uses the
pool3 / pool4 / pool5 outputs as C3, C4, C5)."""

from __future__ import annotations

import functools
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["VGGBackbone", "REGISTRY"]

_CFG = {
    "vgg16": (2, 2, 3, 3, 3),
    "vgg19": (2, 2, 4, 4, 4),
}
_WIDTHS = (64, 128, 256, 512, 512)


class VGGBackbone(nn.Module):
    blocks: Sequence[int] = _CFG["vgg16"]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        feats = []
        for b, (n, w) in enumerate(zip(self.blocks, _WIDTHS)):
            for i in range(n):
                x = nn.Conv(w, (3, 3), padding="SAME", dtype=self.dtype,
                            name=f"block{b + 1}_conv{i + 1}")(x)
                x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")
            feats.append(x)
        # pool3 (stride 8), pool4 (stride 16), pool5 (stride 32)
        return feats[2], feats[3], feats[4]


def _make(name: str, dtype):
    return VGGBackbone(blocks=_CFG[name], dtype=dtype, name="backbone")


REGISTRY = {name: functools.partial(_make, name) for name in _CFG}
