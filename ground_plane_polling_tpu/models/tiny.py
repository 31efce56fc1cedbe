"""A minimal 3-level conv backbone for fast tests and smoke runs.

Not part of the reference's model zoo — exists so unit tests of the training
machinery (optimizer, sharding, losses) don't pay ResNet-50 compile times.
"""

from __future__ import annotations

import functools
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["TinyBackbone", "REGISTRY"]


class TinyBackbone(nn.Module):
    width: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        feats = []
        for i in range(5):
            x = nn.Conv(self.width * min(i + 1, 4), (3, 3), strides=(2, 2),
                        padding="SAME", dtype=self.dtype,
                        name=f"conv{i}")(x)
            x = nn.relu(x)
            feats.append(x)
        return feats[2], feats[3], feats[4]  # strides 8, 16, 32


def _make(dtype):
    return TinyBackbone(dtype=dtype, name="backbone")


REGISTRY = {"tiny": _make}
