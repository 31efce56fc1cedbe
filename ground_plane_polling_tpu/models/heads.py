"""Per-level prediction heads (shared across pyramid levels).

Three heads, matching the reference's submodels
(/root/reference/keras_retinanet_3D/models/retinanet.py:24-167):

  * classification: 4x conv(256)+relu, final conv -> A * 8C channels,
    zero-init kernel + prior-probability bias, sigmoid. Output layout per
    anchor is 8C = [sign-half 0 | sign-half 1], each half indexed 4*c + o.
  * box/keypoint regression: 4x conv(512)+relu, final conv -> A * 12.
    (The reference splits the final conv into five parallel convs of
    4+2+2+2+2 channels and concatenates; one A*12 conv spans the same
    function family with a single MXU matmul, so we fuse it.)
  * dimension regression: 4x conv(128)+relu, final conv -> A * 3C, layout
    per anchor (h, w, l) repeated per class.

All hidden convs use N(0, 0.01) kernels and zero bias like the reference.
Heads output (B, H*W*A, K) per level; callers concatenate over levels.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .common import PRIOR_PROB_BIAS

__all__ = ["ClassificationHead", "BoxRegressionHead", "DimRegressionHead"]

_normal01 = nn.initializers.normal(stddev=0.01)


def _tower(x, width, dtype, name_prefix, mask=None):
    """4x conv+relu tower; `mask` re-zeroes inter-level gap pixels so a
    packed multi-level canvas behaves exactly like per-level SAME padding
    (each level's border convs must read zeros, not the neighbouring
    level's bias-coloured gap)."""
    for i in range(4):
        x = nn.Conv(
            width, (3, 3), padding="SAME", dtype=dtype,
            kernel_init=_normal01, bias_init=nn.initializers.zeros,
            name=f"{name_prefix}_{i}",
        )(x)
        x = nn.relu(x)
        if mask is not None:
            x = x * mask
    return x


def _flatten_anchors(x, per_anchor):
    b, h, w, _ = x.shape
    return x.reshape(b, h * w * (x.shape[-1] // per_anchor), per_anchor)


class ClassificationHead(nn.Module):
    num_classes: int = 1
    num_anchors: int = 12
    width: int = 256
    prior: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, flatten: bool = True):
        x = _tower(x, self.width, self.dtype, "cls", mask=mask)
        out_ch = self.num_anchors * 8 * self.num_classes
        x = nn.Conv(
            out_ch, (3, 3), padding="SAME", dtype=self.dtype,
            kernel_init=nn.initializers.zeros, bias_init=PRIOR_PROB_BIAS,
            name="cls_out",
        )(x)
        if not flatten:
            return x  # raw logit map (caller slices/flattens/sigmoids)
        return self.finalize(x)

    def finalize(self, x):
        logits = _flatten_anchors(x, 8 * self.num_classes)
        return nn.sigmoid(logits.astype(jnp.float32))


class BoxRegressionHead(nn.Module):
    num_anchors: int = 12
    width: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, flatten: bool = True):
        x = _tower(x, self.width, self.dtype, "box", mask=mask)
        x = nn.Conv(
            self.num_anchors * 12, (3, 3), padding="SAME", dtype=self.dtype,
            kernel_init=_normal01, bias_init=nn.initializers.zeros,
            name="box_out",
        )(x)
        if not flatten:
            return x
        return self.finalize(x)

    def finalize(self, x):
        return _flatten_anchors(x, 12).astype(jnp.float32)


class DimRegressionHead(nn.Module):
    num_classes: int = 1
    num_anchors: int = 12
    width: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, flatten: bool = True):
        x = _tower(x, self.width, self.dtype, "dim", mask=mask)
        x = nn.Conv(
            self.num_anchors * 3 * self.num_classes, (3, 3), padding="SAME",
            dtype=self.dtype, kernel_init=_normal01,
            bias_init=nn.initializers.zeros, name="dim_out",
        )(x)
        if not flatten:
            return x
        return self.finalize(x)

    def finalize(self, x):
        return _flatten_anchors(x, 3 * self.num_classes).astype(jnp.float32)
