"""Detection losses: focal + smooth-L1 (box/keypoint) + smooth-L1 (dims).

Same math as the reference (/root/reference/keras_retinanet_3D/losses.py) but
expressed as masked reductions instead of dynamic-shape where/gather — on TPU
a gather to a data-dependent size would force a host round-trip; a multiply
by a {0,1} mask compiles to pure VPU work and fuses into the reduction.

Anchor-state conventions (produced by ops.targets):
  * classification: per-anchor state = max over the 8C label columns
    (-1 ignore / 0 negative / 1 positive); ignore rows contribute nothing,
    normalizer = #positive anchors.
  * box regression: y_true has 13 columns, col 12 is the state; only state==1
    rows contribute, normalizer = #contributing rows.
  * dim regression: y_true is (B, N*C, 4), col 3 is the per-class state.

Note: the reference's smooth_l1_dim gathers with 3-D indices over a
(B, N*C, 1) state tensor (losses.py:144-149), which silently reduces the loss
to the *height component only*. That is reproduced under
`compat_height_only=True`; the default trains all three components.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["focal", "smooth_l1", "smooth_l1_dim"]

_BCE_EPS = 1e-7  # keras-style probability clipping


def _smooth_l1_elem(diff, sigma_squared):
    """f(x) = 0.5 (sigma x)^2 if |x| < 1/sigma^2 else |x| - 0.5/sigma^2."""
    ad = jnp.abs(diff)
    return jnp.where(
        ad < 1.0 / sigma_squared,
        0.5 * sigma_squared * ad * ad,
        ad - 0.5 / sigma_squared,
    )


def focal(labels, probs, alpha: float = 0.25, gamma: float = 2.0):
    """Focal loss on sigmoid probabilities.

    Args
      labels: (B, N, 8C) targets; -1 marks ignore rows (row state = max col).
      probs:  (B, N, 8C) sigmoid outputs.

    Returns scalar: sum of focal-weighted BCE over non-ignored anchors,
    normalized by the number of positive anchors (min 1).
    """
    state = jnp.max(labels, axis=2)  # (B, N)
    valid = (state != -1.0).astype(probs.dtype)

    p = jnp.clip(probs, _BCE_EPS, 1.0 - _BCE_EPS)
    is_pos = labels == 1.0
    alpha_factor = jnp.where(is_pos, alpha, 1.0 - alpha)
    focal_weight = alpha_factor * jnp.where(is_pos, 1.0 - p, p) ** gamma
    bce = -(labels * jnp.log(p) + (1.0 - labels) * jnp.log1p(-p))
    loss = focal_weight * bce * valid[..., None]

    normalizer = jnp.maximum(jnp.sum((state == 1.0).astype(probs.dtype)), 1.0)
    return jnp.sum(loss) / normalizer


def smooth_l1(y_true, y_pred, sigma: float = 3.0):
    """Box/keypoint regression loss.

    Args
      y_true: (B, N, 13) — 12 targets + state column.
      y_pred: (B, N, 12).
    """
    sigma_squared = sigma * sigma
    target = y_true[..., :12]
    state = y_true[..., 12]
    mask = (state == 1.0).astype(y_pred.dtype)

    loss = _smooth_l1_elem(y_pred - target, sigma_squared) * mask[..., None]
    normalizer = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(loss) / normalizer


def smooth_l1_dim(y_true, y_pred, sigma: float = 3.0,
                  compat_height_only: bool = False):
    """Per-class dimension regression loss.

    Args
      y_true: (B, N*C, 4) — (h, w, l) targets + per-class state column.
      y_pred: (B, N, 3C) network output.
      compat_height_only: reproduce the reference's accidental behaviour of
        penalizing only the height component (see module docstring).
    """
    sigma_squared = sigma * sigma
    b = y_pred.shape[0]
    pred = y_pred.reshape(b, -1, 3)
    target = y_true[..., :3]
    state = y_true[..., 3]
    mask = (state == 1.0).astype(y_pred.dtype)

    diff = _smooth_l1_elem(pred - target, sigma_squared)
    if compat_height_only:
        diff = diff[..., :1]
    loss = diff * mask[..., None]
    normalizer = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(loss) / normalizer
