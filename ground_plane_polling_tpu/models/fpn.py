"""Feature Pyramid Network, feature_size=512 (the reference widens the
standard 256-channel FPN to 512, models/retinanet.py:170-205).

Nearest-neighbour upsample-to-target replaces the reference's UpsampleLike
tf.resize op (layers/_misc.py:90-100); with static shapes this lowers to a
cheap broadcast-reshape when the ratio is exactly 2.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["FPN", "upsample_to"]


def upsample_to(x, target_hw):
    """Nearest-neighbour resize of NHWC `x` to (target_h, target_w)."""
    b, h, w, c = x.shape
    th, tw = target_hw
    if th == 2 * h and tw == 2 * w:
        # exact 2x: broadcast trick, cheaper than gather-based resize
        y = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
        return y.reshape(b, th, tw, c)
    return jax.image.resize(x, (b, th, tw, c), method="nearest")


class FPN(nn.Module):
    """(C3, C4, C5) -> [P3, P4, P5, P6, P7], all `feature_size` channels."""

    feature_size: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, c3, c4, c5):
        f = self.feature_size
        conv1 = lambda name: nn.Conv(f, (1, 1), padding="SAME",
                                     dtype=self.dtype, name=name)
        conv3 = lambda name, s=1: nn.Conv(f, (3, 3), strides=(s, s),
                                          padding="SAME", dtype=self.dtype,
                                          name=name)

        p5_lat = conv1("c5_reduce")(c5)
        p5 = conv3("p5")(p5_lat)

        p4_lat = conv1("c4_reduce")(c4) + upsample_to(p5_lat, c4.shape[1:3])
        p4 = conv3("p4")(p4_lat)

        p3_lat = conv1("c3_reduce")(c3) + upsample_to(p4_lat, c3.shape[1:3])
        p3 = conv3("p3")(p3_lat)

        p6 = conv3("p6", s=2)(c5)
        p7 = conv3("p7", s=2)(nn.relu(p6))

        return [p3, p4, p5, p6, p7]
