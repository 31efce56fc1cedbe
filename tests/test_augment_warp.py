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


# ---------------------------------------------------------------------------
# composition golden vs the reference's own transform code


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("hw", [(375, 1242), (256, 256)])
def test_compose_transform_matches_reference(seed, hw):
    """compose_transform == the reference's random_transform composition +
    adjust_transform_for_image (utils/transform.py:293-299,
    utils/image.py:65-82) for identical drawn parameters — pinning the
    scale-AFTER-compose relative-translation semantics (the translation is
    applied along the image axes, not rotated with the image)."""
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    ref_image = pytest.importorskip("keras_retinanet_3D.utils.image")
    ref_tf = pytest.importorskip("keras_retinanet_3D.utils.transform")

    from ground_plane_polling_tpu.data.augment import compose_transform

    rng = np.random.RandomState(seed)
    angle = rng.uniform(-0.4, 0.4)
    tx = rng.uniform(-0.2, 0.2, 2)
    shear_angle = rng.uniform(-0.3, 0.3)
    scale = rng.uniform(0.7, 1.3, 2)
    flip_x, flip_y = bool(rng.rand() < 0.5), bool(rng.rand() < 0.5)

    ref_m = np.linalg.multi_dot([
        ref_tf.rotation(angle),
        ref_tf.translation(tx),
        ref_tf.shear(shear_angle),
        ref_tf.scaling(scale),
        ref_tf.scaling((1 - 2 * flip_x, 1 - 2 * flip_y)),
    ])
    h, w = hw
    ref_m = ref_image.adjust_transform_for_image(
        ref_m, np.zeros((h, w, 3), np.uint8), relative_translation=True)

    got = np.asarray(compose_transform(angle, tx, shear_angle, scale,
                                       flip_x, flip_y, hw))
    np.testing.assert_allclose(got, ref_m, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_transform_annotations_matches_reference_aabb(seed):
    """transform_annotations / transform_boxes == the reference's own
    transform_aabb / transform_aabb_old (utils/transform.py:27-104) on
    random affine transforms, including the x-flip branch that swaps the
    l/r keypoints and remaps the orientation class (0<->1, 2<->3)."""
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    ref_tf = pytest.importorskip("keras_retinanet_3D.utils.transform")

    from ground_plane_polling_tpu.data.augment import (transform_annotations,
                                                       transform_boxes)

    rng = np.random.RandomState(seed)
    flip_x = bool(seed % 2)  # cover both branches deterministically
    m = np.linalg.multi_dot([
        ref_tf.rotation(rng.uniform(-0.4, 0.4)),
        ref_tf.translation(rng.uniform(-20, 20, 2)),
        ref_tf.shear(rng.uniform(-0.3, 0.3)),
        ref_tf.scaling(rng.uniform(0.7, 1.3, 2)),
        ref_tf.scaling(((-1.0 if flip_x else 1.0), 1.0)),
    ]).astype(np.float32)
    assert (m[0, 0] < 0) == flip_x  # the reference's flip detection rule

    anns = np.zeros((5, 17), np.float32)
    for g in range(5):
        x1, y1 = rng.uniform(0, 300, 2)
        anns[g, :4] = [x1, y1, x1 + rng.uniform(10, 200),
                       y1 + rng.uniform(10, 150)]
        anns[g, 4:12] = rng.uniform(0, 400, 8)
        anns[g, 12:15] = rng.uniform(1, 5, 3)
        anns[g, 15] = rng.randint(0, 2)
        anns[g, 16] = g % 4  # one row per orientation class + a repeat

    got = np.asarray(transform_annotations(m, flip_x, anns))
    for g in range(5):
        ref_row = ref_tf.transform_aabb(
            m, list(anns[g, :12]) + [int(anns[g, 16])])
        np.testing.assert_allclose(got[g, :12], ref_row[:12],
                                   rtol=1e-5, atol=1e-3)
        assert int(got[g, 16]) == int(ref_row[12])
        np.testing.assert_allclose(got[g, 12:16], anns[g, 12:16])

    boxes = np.zeros((3, 4), np.float32)
    for g in range(3):
        x1, y1 = rng.uniform(0, 300, 2)
        boxes[g] = [x1, y1, x1 + rng.uniform(10, 200),
                    y1 + rng.uniform(10, 150)]
    got_b = np.asarray(transform_boxes(m, boxes))
    for g in range(3):
        ref_b = ref_tf.transform_aabb_old(m, list(boxes[g]))
        np.testing.assert_allclose(got_b[g], ref_b, rtol=1e-5, atol=1e-3)
