"""GPPDetector convenience API: init/load/detect_image round trip."""

import numpy as np
import jax

from ground_plane_polling_tpu.inference import GPPDetector


def test_detect_image_roundtrip(rng, tmp_path):
    det = GPPDetector("tiny", num_classes=1)
    det.init(jax.random.PRNGKey(0), (128, 256))

    image = rng.randint(0, 255, (100, 300, 3)).astype(np.uint8)
    P = np.array([[200.0, 0, 150, 0], [0, 200.0, 50, 0], [0, 0, 1, 0]])
    planes = np.array([[0.0, 1.0, 0.0, -1.65]], np.float32)
    out = det.detect_image(image, P, planes, min_side=96, max_side=320,
                           pad_multiple=64)
    for key in ["boxes", "dims", "scores", "labels", "orientations",
                "keypoints3d", "keyplanes", "residuals", "locations",
                "angles", "pose_dims"]:
        assert key in out
    n = len(out["scores"])
    assert out["boxes"].shape == (n, 12)
    assert (out["scores"] > 0.05).all()


def test_export_load_roundtrip(rng, tmp_path):
    from ground_plane_polling_tpu.training.checkpoint import export_params

    det = GPPDetector("tiny", num_classes=1)
    variables = det.init(jax.random.PRNGKey(0), (64, 64))
    path = str(tmp_path / "w.npz")
    export_params(path, variables)

    det2 = GPPDetector("tiny", num_classes=1)
    det2.load(path)
    img = rng.uniform(-128, 128, (1, 64, 64, 3)).astype(np.float32)
    P_inv = np.linalg.pinv(
        np.array([[200.0, 0, 32, 0], [0, 200.0, 32, 0], [0, 0, 1, 0]]))
    planes = np.array([[[0.0, 1.0, 0.0, -1.65]]], np.float32)
    o1 = det(img, P_inv[None].astype(np.float32), planes)
    o2 = det2(img, P_inv[None].astype(np.float32), planes)
    np.testing.assert_allclose(np.asarray(o1.scores), np.asarray(o2.scores),
                               rtol=1e-6)


def test_detect_image_device_preprocess_identical(rng):
    """uint8 upload + on-device mean subtraction must reproduce the
    host-preprocessed f32 path exactly (the resize output is
    uint8-valued, so the cast is lossless)."""
    base = GPPDetector("tiny", num_classes=1, device_preprocess=False,
                       score_threshold=0.001)
    base.init(jax.random.PRNGKey(0), (128, 256))
    dev = GPPDetector("tiny", num_classes=1, device_preprocess=True,
                      score_threshold=0.001)
    dev.variables = base.variables

    image = rng.randint(0, 255, (100, 300, 3)).astype(np.uint8)
    P = np.array([[200.0, 0, 150, 0], [0, 200.0, 50, 0], [0, 0, 1, 0]])
    planes = np.array([[0.0, 1.0, 0.0, -1.65]], np.float32)
    kw = dict(min_side=96, max_side=320, pad_multiple=64,
              score_threshold=0.001)
    out_a = base.detect_image(image, P, planes, **kw)
    out_b = dev.detect_image(image, P, planes, **kw)
    assert len(out_a["scores"]) > 0
    for key in out_a:
        np.testing.assert_allclose(out_b[key], out_a[key], rtol=1e-5,
                                   atol=1e-5, err_msg=key)
