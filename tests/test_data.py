"""Data-layer tests: label prep, dataset parsing, pipeline, augmentation."""

import os
import numpy as np
import pytest

from ground_plane_polling_tpu.data import label_prep
from ground_plane_polling_tpu.data.augment import (
    AugmentConfig, augment_example, transform_annotations)
from ground_plane_polling_tpu.data.kitti import KittiDataset
from ground_plane_polling_tpu.data.pipeline import KittiLoader

from .fixtures import P2, make_synthetic_kitti


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    return make_synthetic_kitti(str(tmp_path_factory.mktemp("kitti")))


def test_label_prep_orientation_classes():
    """Orientation class = quadrant of alpha; keypoint ids per class."""
    for alpha_deg, want_cls in [(45, 0), (135, 1), (-45, 2), (-135, 3)]:
        obj = label_prep.KittiObject(
            type="Car", truncated=0.0, occluded=0,
            alpha=np.deg2rad(alpha_deg),
            box2d=np.array([0.0, 0, 10, 10]),
            dims=np.array([1.5, 1.7, 4.2]),
            location=np.array([0.0, 1.65, 10.0]), yaw=0.3)
        row = label_prep.modified_label_row(obj, P2)
        assert row.split()[0] == "Car"
        assert int(row.split()[-1]) == want_cls


def test_label_prep_golden_rows():
    """Byte-exact golden rows, one per alpha quadrant + one behind-camera.

    The expected strings were derived by an independent transliteration of
    the MATLAB pipeline (create_mod_labels.m:57-111, computeBox3D.m:13-37,
    projectToImage.m) written directly from the .m sources — corner
    construction, yaw rotation, projection, per-quadrant corner id
    selection, amodal min/max box, and the DontCare sentinel block — then
    checked in as literals. Any re-interpretation drift in label_prep.py
    breaks these bytes.
    """
    P_kitti = np.array([[721.5377, 0.0, 609.5593, 44.85728],
                        [0.0, 721.5377, 172.854, 0.2163791],
                        [0.0, 0.0, 1.0, 0.002745884]])
    dims = np.array([1.48, 1.62, 3.9])
    cases = [
        # (alpha_deg, location, yaw, golden row)
        (30.0, (2.0, 1.65, 15.0), 0.8,
         "Car 0.200000 1 0.523599 615.036134 180.068647 813.238868 "
         "264.136077 615.036134 248.010884 766.563617 264.136077 "
         "813.238868 256.864396 766.563617 182.241055 1.480000 1.620000 "
         "3.900000 0"),
        (120.0, (-3.0, 1.60, 20.0), 2.2,
         "Car 0.200000 1 2.094395 428.530015 176.767958 570.659534 "
         "237.156770 428.530015 233.913640 471.564994 237.156770 "
         "570.659534 227.548707 471.564994 177.663399 1.480000 1.620000 "
         "3.900000 1"),
        (-45.0, (1.0, 1.70, 12.0), -0.6,
         "Car 0.200000 1 -0.785398 546.766382 184.361141 790.976247 "
         "292.695231 546.766382 278.846485 603.058675 292.695231 "
         "790.976247 271.473102 603.058675 188.340894 1.480000 1.620000 "
         "3.900000 2"),
        (-135.0, (-1.5, 1.55, 25.0), -2.5,
         "Car 0.200000 1 -2.356194 510.969078 174.727670 627.442307 "
         "221.076490 510.969078 216.666240 598.273156 221.076490 "
         "627.442307 218.520371 598.273156 175.021155 1.480000 1.620000 "
         "3.900000 3"),
    ]
    for alpha_deg, loc, yaw, golden in cases:
        obj = label_prep.KittiObject(
            type="Car", truncated=0.2, occluded=1,
            alpha=np.deg2rad(alpha_deg),
            box2d=np.array([0.0, 0.0, 0.0, 0.0]),
            dims=dims.copy(), location=np.array(loc), yaw=yaw)
        assert label_prep.modified_label_row(obj, P_kitti) == golden, \
            f"alpha {alpha_deg}"

    behind = label_prep.KittiObject(
        type="Car", truncated=0.2, occluded=1, alpha=0.5,
        box2d=np.array([12.5, 140.25, 88.0, 190.5]),
        dims=dims.copy(), location=np.array([0.5, 1.65, -4.0]), yaw=0.3)
    assert label_prep.modified_label_row(behind, P_kitti) == (
        "DontCare -1.000000 -1 -10.000000 12.500000 140.250000 88.000000 "
        "190.500000 -10000.000000 -10000.000000 -10000.000000 "
        "-10000.000000 -10000.000000 -10000.000000 -10000.000000 "
        "-10000.000000 1.480000 1.620000 3.900000 -1")


def test_label_prep_behind_camera_dontcare():
    obj = label_prep.KittiObject(
        type="Car", truncated=0.0, occluded=0, alpha=0.5,
        box2d=np.array([1.0, 2, 30, 40]), dims=np.array([1.5, 1.7, 4.2]),
        location=np.array([0.0, 1.65, -5.0]), yaw=0.0)
    row = label_prep.modified_label_row(obj, P2).split()
    assert row[0] == "DontCare"
    assert float(row[8]) == -10000.0  # sentinel keypoints
    assert int(row[-1]) == -1
    # original 2D box preserved
    assert [float(v) for v in row[4:8]] == [1.0, 2.0, 30.0, 40.0]


def test_label_prep_amodal_box_is_corner_hull():
    obj = label_prep.KittiObject(
        type="Car", truncated=0.0, occluded=0, alpha=0.4,
        box2d=np.array([0.0, 0, 1, 1]),  # bogus; must be replaced
        dims=np.array([1.5, 1.7, 4.2]),
        location=np.array([2.0, 1.65, 12.0]), yaw=0.7)
    row = label_prep.modified_label_row(obj, P2).split()
    corners2 = label_prep.project_points(label_prep.box3d_corners(obj), P2)
    np.testing.assert_allclose(
        [float(v) for v in row[4:8]],
        [corners2[0].min(), corners2[1].min(),
         corners2[0].max(), corners2[1].max()], rtol=1e-5)


def test_dataset_parses_fixture(kitti_root):
    ds = KittiDataset(kitti_root, "train")
    assert len(ds) == 2
    assert ds.num_classes == 1
    anns, ignores = ds.load_annotations(0)
    assert anns.shape[1] == 17
    assert len(anns) == 2  # Car + Van
    assert (anns[:, 15] == 0).all()  # both map to class 0
    assert anns[0, 16] in (0, 1, 2, 3)
    assert len(ignores) == 1  # the DontCare row
    P = ds.load_calibration(0)
    np.testing.assert_allclose(P, P2, rtol=1e-6)
    assert ds.planes.shape == (10, 4)


@pytest.mark.parametrize("native", [True, False])
def test_loader_train_batch(kitti_root, native):
    ds = KittiDataset(kitti_root, "train")
    loader = KittiLoader(ds, batch_size=2, image_min_side=128,
                         image_max_side=448, pad_multiple=64,
                         use_native_loader=native)
    batch = next(iter(loader.epoch()))
    b, h, w, _ = batch["image"].shape
    assert b == 2 and h % 64 == 0 and w % 64 == 0
    n = batch["labels"].shape[1]
    assert batch["regression"].shape == (2, n, 13)
    assert batch["regression_dim"].shape == (2, n, 4)
    # at least one positive anchor somewhere in the batch
    assert (np.asarray(batch["regression"])[:, :, 12] == 1).any()


def test_loader_resolution_buckets(kitti_root, tmp_path):
    """Mixed-resolution datasets batch within per-shape buckets."""
    import shutil
    from PIL import Image

    root = str(tmp_path / "mixed")
    shutil.copytree(kitti_root, root)
    # add a train image at double width (its own bucket)
    img_dir = os.path.join(root, "train", "images")
    src = sorted(os.listdir(img_dir))[0]
    wide = Image.open(os.path.join(img_dir, src)).resize((832, 128))
    wide.save(os.path.join(img_dir, "900000.png"))
    for kind, ext in (("labels", ".txt"), ("calibs", ".txt")):
        shutil.copyfile(
            os.path.join(root, "train", kind, src.replace(".png", ext)),
            os.path.join(root, "train", kind, "900000" + ext))

    ds = KittiDataset(root, "train")
    loader = KittiLoader(ds, batch_size=2, image_min_side=128,
                         image_max_side=896, pad_multiple=64)
    shapes = set()
    for batch in loader.epoch(prefetch=0):
        shapes.add(tuple(np.asarray(batch["image"]).shape[1:3]))
        # anchor count always matches the batch's own image shape
        from ground_plane_polling_tpu.ops import anchors as A

        assert batch["labels"].shape[1] == A.num_anchors_for_shape(
            tuple(np.asarray(batch["image"]).shape[1:3]))
    assert len(shapes) == 2  # two buckets





def test_loader_eval_inputs(kitti_root):
    ds = KittiDataset(kitti_root, "val")
    loader = KittiLoader(ds, batch_size=1, image_min_side=128,
                         image_max_side=448, pad_multiple=64, shuffle=False)
    item = next(loader.eval_inputs())
    assert item["image"].shape[0] == 1
    assert item["P_inv"].shape == (1, 4, 3)
    assert item["planes"].shape == (1, 10, 4)
    # P_inv really is the pseudo-inverse of the scaled P
    P_scaled = np.diag([item["scale"], item["scale"], 1.0]) @ P2
    np.testing.assert_allclose(item["P_inv"][0], np.linalg.pinv(P_scaled),
                               rtol=1e-4, atol=1e-6)


def test_xflip_swaps_orientation_and_keypoints():
    ann = np.zeros((1, 17), np.float32)
    ann[0, :4] = [10, 10, 50, 50]
    ann[0, 4:12] = [12, 48, 30, 49, 47, 48, 28, 12]  # l, m, r, t
    ann[0, 16] = 0
    w = 100.0
    flip = np.array([[-1.0, 0, w], [0, 1, 0], [0, 0, 1]])  # x-flip about w/2
    out = np.asarray(transform_annotations(flip, True, ann))
    # orientation 0 -> 1
    assert out[0, 16] == 1
    # l keypoint is now the flipped former r keypoint
    np.testing.assert_allclose(out[0, 4], w - 47.0, rtol=1e-6)
    np.testing.assert_allclose(out[0, 8], w - 12.0, rtol=1e-6)
    # box is the transformed hull
    np.testing.assert_allclose(out[0, :4], [w - 50, 10, w - 10, 50],
                               rtol=1e-6)
    # no-flip identity keeps everything
    ident = np.eye(3)
    out2 = np.asarray(transform_annotations(ident, False, ann))
    np.testing.assert_allclose(out2[0], ann[0], rtol=1e-6)


def test_augment_example_shapes_and_range(rng):
    import jax

    img = rng.uniform(0, 255, (64, 96, 3)).astype(np.float32)
    ann = np.zeros((4, 17), np.float32)
    ig = np.zeros((2, 4), np.float32)
    out_img, out_ann, out_ig = augment_example(
        jax.random.PRNGKey(0), img, ann, ig)
    assert out_img.shape == img.shape
    assert float(np.asarray(out_img).min()) >= 0.0
    assert float(np.asarray(out_img).max()) <= 255.0
    assert out_ann.shape == ann.shape and out_ig.shape == ig.shape


def test_photometric_identity_config(rng):
    """With degenerate ranges the photometric chain is the identity."""
    import jax
    from ground_plane_polling_tpu.data.augment import photometric

    cfg = AugmentConfig(brightness_delta=0.0, contrast_range=(1.0, 1.0),
                        saturation_range=(1.0, 1.0), hue_delta=0.0)
    img = rng.uniform(0, 255, (32, 32, 3)).astype(np.float32)
    out = np.asarray(photometric(jax.random.PRNGKey(0), img, cfg))
    np.testing.assert_allclose(out, img, rtol=1e-3, atol=0.5)


# ---------------------------------------------------------------------------
# host resize parity vs the reference's cv2 kernel


def test_resize_image_matches_reference_cv2():
    """_resize_image == the reference's cv2.resize exactly when cv2 is
    available (reference utils/image.py:196-199, default INTER_LINEAR)."""
    cv2 = pytest.importorskip("cv2")

    from ground_plane_polling_tpu.data.kitti import resize_scale
    from ground_plane_polling_tpu.data.pipeline import _resize_image

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (375, 1242, 3), dtype=np.uint8)
    scale = resize_scale(img.shape[:2])
    ours = _resize_image(img, scale)
    ref = cv2.resize(img, None, fx=scale, fy=scale)
    assert ours.shape == ref.shape
    np.testing.assert_array_equal(ours, ref.astype(np.float32))


def test_resize_image_uint8_path_bit_identical():
    """The serving CLIs' cast-free uint8 resize+pad path produces the
    exact canvas of the old float path (uint8_canvas(_resize_image(f32))):
    rint∘clip is the identity on the resize kernels' uint8-valued output,
    so skipping the full-frame float round trips must change nothing."""
    from ground_plane_polling_tpu.data.kitti import resize_scale
    from ground_plane_polling_tpu.data.pipeline import (_resize_image,
                                                        _resize_image_uint8,
                                                        uint8_canvas)

    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (375, 1242, 3), dtype=np.uint8)
    scale = resize_scale(img.shape[:2])

    new = _resize_image_uint8(img, scale)
    old = _resize_image(img.astype(np.float32), scale)
    assert new.dtype == np.uint8 and new.shape == old.shape
    ph = int(np.ceil(old.shape[0] / 32)) * 32
    pw = int(np.ceil(old.shape[1] / 32)) * 32
    canvas = np.zeros((ph, pw, 3), np.uint8)
    canvas[: new.shape[0], : new.shape[1]] = new
    np.testing.assert_array_equal(canvas, uint8_canvas(old, ph, pw))


def test_read_image_bgr_png_decoders_bit_identical(tmp_path):
    """read_image_bgr's cv2 PNG fast path must match the PIL path exactly
    (PNG is lossless; both decoders see the same pixels) across RGB, RGBA,
    grayscale, and palette encodings."""
    pytest.importorskip("cv2")
    from PIL import Image

    from ground_plane_polling_tpu.data.kitti import read_image_bgr

    rng = np.random.RandomState(2)
    rgb = rng.randint(0, 255, (37, 53, 3), dtype=np.uint8)
    cases = {
        "rgb.png": Image.fromarray(rgb),
        "rgba.png": Image.fromarray(
            np.concatenate([rgb, np.full((37, 53, 1), 200, np.uint8)], -1)),
        "gray.png": Image.fromarray(rgb[:, :, 0]),
        "palette.png": Image.fromarray(rgb).convert(
            "P", palette=Image.ADAPTIVE),
    }
    for name, im in cases.items():
        fp = str(tmp_path / name)
        im.save(fp)
        got = read_image_bgr(fp)
        pil = np.asarray(Image.open(fp).convert("RGB"))[:, :, ::-1]
        np.testing.assert_array_equal(got, pil, err_msg=name)


def test_resize_image_pil_fallback_close():
    """The PIL fallback stays within a bounded deviation of the cv2 kernel
    on photographic (smooth) content at the KITTI scale."""
    cv2 = pytest.importorskip("cv2")
    from PIL import Image

    from ground_plane_polling_tpu.data.kitti import resize_scale
    from ground_plane_polling_tpu.data.pipeline import _resize_image_pil

    rng = np.random.RandomState(0)
    base = rng.uniform(0, 255, (47, 155, 3)).astype(np.uint8)
    img = np.asarray(Image.fromarray(base).resize((1242, 375),
                                                  Image.BILINEAR))
    scale = resize_scale(img.shape[:2])
    ours = _resize_image_pil(img, scale)
    ref = cv2.resize(img, None, fx=scale, fy=scale).astype(np.float32)
    assert ours.shape == ref.shape
    diff = np.abs(ours - ref)
    assert diff.mean() < 3.0 and np.percentile(diff, 99) < 12.0


def test_augment_padded_canvas_matches_unpadded(rng):
    """augment_example(image_hw=...) on a zero-padded canvas must equal
    augmenting the unpadded image with the same key (the reference's
    augment-then-pad order), and the padding must stay exactly zero."""
    import jax

    h, w = 56, 88
    img = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
    ann = np.zeros((4, 17), np.float32)
    ann[0, :4] = [10, 10, 40, 40]
    ig = np.zeros((2, 4), np.float32)
    key = jax.random.PRNGKey(7)

    out_img, out_ann, out_ig = augment_example(key, img, ann, ig)

    H, W = 64, 96
    canvas = np.zeros((H, W, 3), np.float32)
    canvas[:h, :w] = img
    pad_img, pad_ann, pad_ig = augment_example(
        key, canvas, ann, ig, image_hw=np.asarray([h, w], np.float32))

    np.testing.assert_allclose(np.asarray(pad_img)[:h, :w],
                               np.asarray(out_img), rtol=1e-5, atol=1e-3)
    assert np.all(np.asarray(pad_img)[h:] == 0.0)
    assert np.all(np.asarray(pad_img)[:, w:] == 0.0)
    np.testing.assert_allclose(np.asarray(pad_ann), np.asarray(out_ann),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pad_ig), np.asarray(out_ig),
                               rtol=1e-5, atol=1e-4)


def test_dataset_paths_survive_images_in_base_dir(tmp_path):
    """label/calib paths must not be derived by str.replace over the FULL
    path (a base dir containing 'images' used to get mangled), and the
    extension filter is case-insensitive like prepare_split's."""
    import shutil
    from .fixtures import make_synthetic_kitti
    from ground_plane_polling_tpu.data.kitti import KittiDataset

    root = str(tmp_path / "kitti_images")   # 'images' inside base dir
    make_synthetic_kitti(root)
    # uppercase extension must still be listed
    img_dir = os.path.join(root, "train", "images")
    first = sorted(os.listdir(img_dir))[0]
    upper = os.path.splitext(first)[0] + "_up.PNG"
    shutil.copy(os.path.join(img_dir, first), os.path.join(img_dir, upper))
    for sub in ("labels", "calibs"):
        src = os.path.join(root, "train", sub,
                           os.path.splitext(first)[0] + ".txt")
        shutil.copy(src, os.path.join(
            root, "train", sub, os.path.splitext(upper)[0] + ".txt"))

    ds = KittiDataset(root, "train")
    assert any(p.endswith(".PNG") for p in ds.image_paths)
    for i in range(len(ds)):
        ds.load_annotations(i)      # FileNotFoundError before the fix
        ds.load_calibration(i)
