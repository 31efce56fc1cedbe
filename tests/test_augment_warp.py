"""Device-side affine warp parity vs cv2.warpAffine (the reference's host
op, utils/image.py:143-171: bilinear interpolation, replicate border)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax  # noqa: E402

from ground_plane_polling_tpu.data.augment import (  # noqa: E402
    random_transform_matrix, warp_image)


def _compare(matrix, image):
    ours = np.asarray(warp_image(image, matrix))
    ref = cv2.warpAffine(
        image, matrix[:2, :],
        dsize=(image.shape[1], image.shape[0]),
        flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_REPLICATE,
    )
    # cv2 uses 5-bit fixed-point interpolation weights; allow ~2 levels
    # and ignore a 2px frontier where replicate-border rounding differs
    diff = np.abs(ours[2:-2, 2:-2] - ref[2:-2, 2:-2])
    assert np.percentile(diff, 99) <= 4.0, diff.max()


def test_identity(rng):
    img = rng.uniform(0, 255, (40, 60, 3)).astype(np.float32)
    _compare(np.eye(3), img)


def test_rotation_about_centre(rng):
    img = rng.uniform(0, 255, (48, 64, 3)).astype(np.float32)
    a = 0.2
    c, s = np.cos(a), np.sin(a)
    centre = np.array([[1, 0, 32], [0, 1, 24], [0, 0, 1.0]])
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    back = np.array([[1, 0, -32], [0, 1, -24], [0, 0, 1.0]])
    _compare(centre @ rot @ back, img)


def test_scale_translate(rng):
    img = rng.uniform(0, 255, (32, 48, 3)).astype(np.float32)
    m = np.array([[1.1, 0, 3.0], [0, 0.9, -2.0], [0, 0, 1.0]])
    _compare(m, img)


def test_random_matrix_composition(rng):
    """Matrices from random_transform_matrix behave like cv2 end to end."""
    img = rng.uniform(0, 255, (40, 56, 3)).astype(np.float32)
    for seed in range(3):
        m, _ = random_transform_matrix(jax.random.PRNGKey(seed), (40, 56))
        _compare(np.asarray(m), img)
