"""Device-side data augmentation (photometric + geometric), jit/vmap-able.

The reference runs photometric augmentation through a private TF session per
image (preprocessing/generator.py:72-82,178 — one host<->device round trip
per training image, its worst data-pipeline bottleneck) and geometric
augmentation via cv2.warpAffine on the host (utils/image.py:143-171). Here
both run on-device as part of the training step's input processing: one
fused program per batch.

Photometric chain (matching tf.image.random_* semantics on [0, 1] floats,
applied in the reference's order brightness -> contrast -> saturation -> hue,
then clipped):
  * brightness: x + U(-0.15, 0.15)
  * contrast:   (x - mean_hw) * U(0.5, 1.5) + mean_hw   (per-channel mean)
  * saturation: HSV scale of S by U(0.5, 1.5)
  * hue:        H + U(-0.2, 0.2) (mod 1)
Note the reference feeds BGR arrays into TF's RGB-assuming HSV math; we
apply the same channel-agnostic treatment for behavioural parity.

Geometric: a random homogeneous 3x3 built as
rotation @ translation @ shear @ scale @ flip (utils/transform.py:252-299),
origin moved to the image centre with translation relative to image size
(utils/image.py:65-82). Images are warped by inverse-mapping bilinear
sampling with replicate borders (cv2.warpAffine's default semantics);
annotations transform their 4 box corners (axis-aligned hull) and the 4
keypoints, and an x-flip swaps orientation classes 0<->1, 2<->3 AND the
l/r keypoints (utils/transform.py:27-77).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["AugmentConfig", "random_transform_matrix", "photometric",
           "warp_image", "transform_annotations", "augment_example"]


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    # defaults = reference train defaults (bin/train.py:202-216)
    min_rotation: float = -0.1
    max_rotation: float = 0.1
    min_translation: Tuple[float, float] = (-0.1, -0.1)
    max_translation: Tuple[float, float] = (0.1, 0.1)
    min_shear: float = -0.1
    max_shear: float = 0.1
    min_scaling: Tuple[float, float] = (0.9, 0.9)
    max_scaling: Tuple[float, float] = (1.1, 1.1)
    flip_x_chance: float = 0.5
    flip_y_chance: float = 0.0
    brightness_delta: float = 0.15
    contrast_range: Tuple[float, float] = (0.5, 1.5)
    saturation_range: Tuple[float, float] = (0.5, 1.5)
    hue_delta: float = 0.2


DEFAULT = AugmentConfig()


# --------------------------------------------------------------------------
# geometric transform construction
# --------------------------------------------------------------------------

def _rot(a):
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def _trans(t):
    return jnp.array([[1.0, 0.0, t[0]], [0.0, 1.0, t[1]], [0.0, 0.0, 1.0]])


def _shear(a):
    return jnp.array([[1.0, -jnp.sin(a), 0.0], [0.0, jnp.cos(a), 0.0],
                      [0.0, 0.0, 1.0]])


def _scale(s):
    return jnp.array([[s[0], 0.0, 0.0], [0.0, s[1], 0.0], [0.0, 0.0, 1.0]])


def compose_transform(angle, tx, shear_angle, scale, flip_x, flip_y,
                      image_hw):
    """Deterministic augmentation-matrix composition.

    Matches the reference exactly (utils/transform.py:293-299 composed with
    utils/image.py:65-82): rotation @ translation @ shear @ scaling @ flip,
    after which the COMPOSED matrix's translation column is scaled by
    (w, h) and the origin is moved to the image centre. Scaling after
    composition means the relative translation is applied along the image
    axes — NOT rotated with the image — which differs from scaling tx
    before composing whenever rotation != 0 on a non-square image.

    Args
      angle, shear_angle: radians.
      tx: (2,) translation as a fraction of (width, height).
      scale: (2,) per-axis scale factors.
      flip_x, flip_y: bool scalars.
    """
    h, w = image_hw
    flip = _scale(jnp.stack([
        1.0 - 2.0 * jnp.asarray(flip_x, jnp.float32),
        1.0 - 2.0 * jnp.asarray(flip_y, jnp.float32),
    ]))
    m = _rot(angle) @ _trans(tx) @ _shear(shear_angle) @ _scale(scale) @ flip
    m = m.at[:2, 2].multiply(jnp.array([w, h], jnp.float32))
    centre = jnp.array([0.5 * w, 0.5 * h])
    return _trans(centre) @ m @ _trans(-centre)


def random_transform_matrix(key, image_hw, config: AugmentConfig = DEFAULT):
    """Random augmentation matrix for an (h, w) image.

    Returns (matrix (3, 3), flip_x (bool scalar)). Translation is relative to
    image size and the transform origin is the image centre.
    """
    ks = jax.random.split(key, 6)
    angle = jax.random.uniform(ks[0], (), minval=config.min_rotation,
                               maxval=config.max_rotation)
    tx = jax.random.uniform(ks[1], (2,),
                            minval=jnp.asarray(config.min_translation),
                            maxval=jnp.asarray(config.max_translation))
    shear = jax.random.uniform(ks[2], (), minval=config.min_shear,
                               maxval=config.max_shear)
    sc = jax.random.uniform(ks[3], (2,),
                            minval=jnp.asarray(config.min_scaling),
                            maxval=jnp.asarray(config.max_scaling))
    flip_x = jax.random.uniform(ks[4], ()) < config.flip_x_chance
    flip_y = jax.random.uniform(ks[5], ()) < config.flip_y_chance

    m = compose_transform(angle, tx, shear, sc, flip_x, flip_y, image_hw)
    return m, flip_x


# --------------------------------------------------------------------------
# photometric chain
# --------------------------------------------------------------------------

def _rgb_to_hsv(x):
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    rng = maxc - minc
    s = jnp.where(maxc > 0, rng / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(rng, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(rng > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(x):
    h, s, v = x[..., 0], x[..., 1], x[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _valid_mask(shape_hw, image_hw):
    """(H, W, 1) mask of true-image pixels on a padded canvas."""
    ys = jnp.arange(shape_hw[0], dtype=jnp.float32)[:, None]
    xs = jnp.arange(shape_hw[1], dtype=jnp.float32)[None, :]
    return ((ys < image_hw[0]) & (xs < image_hw[1]))[..., None]


def photometric(key, image, config: AugmentConfig = DEFAULT,
                image_hw=None):
    """Random photometric chain on a (H, W, 3) image in [0, 255].

    `image_hw` (h, w): the TRUE image extent when `image` is a zero-padded
    canvas — the contrast mean is computed over real pixels only and the
    padding is re-zeroed afterwards, reproducing the reference's
    augment-then-pad order (its generator runs photometric on the raw
    image, preprocessing/generator.py:72-82, and zero padding is added by
    batching later)."""
    ks = jax.random.split(key, 4)
    x = image / 255.0

    x = x + jax.random.uniform(ks[0], (), minval=-config.brightness_delta,
                               maxval=config.brightness_delta)

    c = jax.random.uniform(ks[1], (), minval=config.contrast_range[0],
                           maxval=config.contrast_range[1])
    if image_hw is None:
        mask = None
        mean = jnp.mean(x, axis=(0, 1), keepdims=True)
    else:
        mask = _valid_mask(image.shape[:2], image_hw).astype(x.dtype)
        count = jnp.maximum(jnp.sum(mask), 1.0)
        mean = jnp.sum(x * mask, axis=(0, 1), keepdims=True) / count
    x = (x - mean) * c + mean

    hsv = _rgb_to_hsv(jnp.clip(x, 0.0, 1.0))
    sat = jax.random.uniform(ks[2], (), minval=config.saturation_range[0],
                             maxval=config.saturation_range[1])
    hue = jax.random.uniform(ks[3], (), minval=-config.hue_delta,
                             maxval=config.hue_delta)
    hsv = jnp.stack([
        (hsv[..., 0] + hue) % 1.0,
        jnp.clip(hsv[..., 1] * sat, 0.0, 1.0),
        hsv[..., 2],
    ], axis=-1)
    x = _hsv_to_rgb(hsv)
    x = 255.0 * jnp.clip(x, 0.0, 1.0)
    if mask is not None:
        x = x * mask       # padding stays exactly zero
    return x


# --------------------------------------------------------------------------
# image warp
# --------------------------------------------------------------------------

def warp_image(image, matrix, image_hw=None):
    """Apply a forward homogeneous 3x3 to an (H, W, C) image: output pixel
    (x, y) samples the input at matrix^-1 @ (x, y), bilinear, replicate
    border (cv2.warpAffine default semantics).

    `image_hw` (h, w): the TRUE image extent when `image` is a zero-padded
    canvas. Sampling is then clamped to the true frame (replicate border
    at the real image edge, not at the canvas edge, matching the
    reference's warp of the unpadded image, utils/image.py:143-171) and
    output pixels outside the true frame stay zero (the padding is added
    after warping in the reference's order)."""
    h, w = image.shape[:2]
    clamp_h = (h - 1) if image_hw is None else (image_hw[0] - 1)
    clamp_w = (w - 1) if image_hw is None else (image_hw[1] - 1)
    inv = jnp.linalg.inv(matrix)
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=image.dtype),
                          jnp.arange(w, dtype=image.dtype), indexing="ij")
    sx = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
    sy = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0

    def sample(yi, xi):
        yi = jnp.clip(yi, 0, clamp_h).astype(jnp.int32)
        xi = jnp.clip(xi, 0, clamp_w).astype(jnp.int32)
        return image[yi, xi]

    v00 = sample(y0, x0)
    v01 = sample(y0, x0 + 1)
    v10 = sample(y0 + 1, x0)
    v11 = sample(y0 + 1, x0 + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    out = top * (1 - fy) + bot * fy
    if image_hw is not None:
        out = out * _valid_mask((h, w), image_hw).astype(out.dtype)
    return out


# --------------------------------------------------------------------------
# annotation transform
# --------------------------------------------------------------------------

def transform_annotations(matrix, flip_x, annotations):
    """Transform padded (G, 17) annotations by the augmentation matrix.

    Box = axis-aligned hull of the 4 transformed corners; keypoints map
    directly; x-flip swaps l<->r keypoints and orientation 0<->1, 2<->3.
    """
    x1, y1 = annotations[:, 0], annotations[:, 1]
    x2, y2 = annotations[:, 2], annotations[:, 3]
    corners = jnp.stack([
        jnp.stack([x1, x2, x1, x2], axis=1),
        jnp.stack([y1, y2, y2, y1], axis=1),
        jnp.ones((annotations.shape[0], 4), annotations.dtype),
    ], axis=1)  # (G, 3, 4)
    tc = jnp.einsum("ij,gjk->gik", matrix, corners)
    nx1 = tc[:, 0].min(axis=1)
    ny1 = tc[:, 1].min(axis=1)
    nx2 = tc[:, 0].max(axis=1)
    ny2 = tc[:, 1].max(axis=1)

    kp = annotations[:, 4:12].reshape(-1, 4, 2)
    kp_h = jnp.concatenate(
        [kp, jnp.ones((kp.shape[0], 4, 1), annotations.dtype)], axis=-1)
    tkp = jnp.einsum("ij,gkj->gki", matrix, kp_h)[..., :2]  # (G, 4, 2)

    # x-flip: swap l and r keypoints, remap orientation
    tkp_flipped = tkp[:, jnp.array([2, 1, 0, 3])]
    tkp = jnp.where(flip_x, tkp_flipped, tkp)
    orient = annotations[:, 16].astype(jnp.int32)
    orient_flipped = jnp.array([1, 0, 3, 2])[jnp.clip(orient, 0, 3)]
    orient = jnp.where(flip_x, orient_flipped, orient)

    return jnp.concatenate([
        jnp.stack([nx1, ny1, nx2, ny2], axis=1),
        tkp.reshape(-1, 8),
        annotations[:, 12:16],
        orient[:, None].astype(annotations.dtype),
    ], axis=1)


def transform_boxes(matrix, boxes):
    """Transform padded (M, 4) ignore-region boxes (hull of 4 corners),
    mirroring utils/transform.py:79-104."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    corners = jnp.stack([
        jnp.stack([x1, x2, x1, x2], axis=1),
        jnp.stack([y1, y2, y2, y1], axis=1),
        jnp.ones((boxes.shape[0], 4), boxes.dtype),
    ], axis=1)
    tc = jnp.einsum("ij,gjk->gik", matrix, corners)
    return jnp.stack([
        tc[:, 0].min(axis=1), tc[:, 1].min(axis=1),
        tc[:, 0].max(axis=1), tc[:, 1].max(axis=1),
    ], axis=1)


# --------------------------------------------------------------------------
# full per-example augmentation
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("config",))
def augment_example(key, image, annotations, ignore_boxes,
                    config: AugmentConfig = DEFAULT, image_hw=None):
    """Photometric + geometric augmentation of one example.

    Args
      image:        (H, W, 3) float in [0, 255] (pre mean-subtraction).
      annotations:  (G, 17) padded.
      ignore_boxes: (M, 4) padded.
      image_hw:     (h, w) TRUE image extent when `image` is a zero-padded
                    batch canvas: the transform origin/relative translation
                    use the real size (the reference augments the unpadded
                    image — utils/image.py:65-82 — and pads afterwards),
                    the contrast mean and warp border see only real pixels,
                    and the padding stays zero. None = image is unpadded.
    Returns (image, annotations, ignore_boxes) augmented.
    """
    k_photo, k_geom = jax.random.split(key)
    image = photometric(k_photo, image, config, image_hw=image_hw)
    hw = image.shape[:2] if image_hw is None else image_hw
    m, flip_x = random_transform_matrix(k_geom, hw, config)
    image = warp_image(image, m, image_hw=image_hw)
    annotations = transform_annotations(m, flip_x, annotations)
    ignore_boxes = transform_boxes(m, ignore_boxes)
    return image, annotations, ignore_boxes
