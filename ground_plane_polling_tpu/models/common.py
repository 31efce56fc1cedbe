"""Shared model building blocks.

FrozenBatchNorm mirrors the reference's `freeze_bn=True` backbone BN
(/root/reference/keras_retinanet_3D/models/resnet.py:88-93): statistics and
affine parameters are loaded constants, never updated and never trained. On
TPU this folds into a single fused multiply-add that XLA merges into the
surrounding conv, so it is strictly cheaper than live BN.

Parameters live in a separate "frozen" variable collection so the optimizer
only ever sees trainable weights.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["FrozenBatchNorm", "PRIOR_PROB_BIAS", "prior_prob_bias_init"]


class FrozenBatchNorm(nn.Module):
    """Inference-mode batch norm with constant statistics.

    y = gamma * (x - mean) / sqrt(var + eps) + beta, all four tensors frozen.
    """

    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        gamma = self.variable("frozen", "scale", lambda: jnp.ones(c, jnp.float32))
        beta = self.variable("frozen", "bias", lambda: jnp.zeros(c, jnp.float32))
        mean = self.variable("frozen", "mean", lambda: jnp.zeros(c, jnp.float32))
        var = self.variable("frozen", "var", lambda: jnp.ones(c, jnp.float32))
        # fold into one scale/shift (constant-folded by XLA)
        inv = gamma.value * jnp.reciprocal(jnp.sqrt(var.value + self.epsilon))
        scale = inv.astype(self.dtype)
        shift = (beta.value - mean.value * inv).astype(self.dtype)
        return x * scale + shift


def prior_prob_bias_init(probability: float = 0.01):
    """Final classification conv bias: -log((1-p)/p), p = prior probability.

    Keeps the initial sigmoid output at p so focal loss doesn't blow up on
    the overwhelmingly-background anchor set
    (reference initializers.py:23-39).
    """
    import math

    value = -math.log((1.0 - probability) / probability)

    def init(key, shape, dtype=jnp.float32):
        del key
        return jnp.full(shape, value, dtype)

    return init


PRIOR_PROB_BIAS = prior_prob_bias_init(0.01)
