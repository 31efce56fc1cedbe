"""Full detect-pipeline integration test with a stubbed model.

Crafts raw head outputs that decode to a known synthetic 3D scene and checks
that decode -> filter/NMS -> polling -> pose reproduces the ground truth end
to end (model-independent: the stub returns the crafted tensors)."""

import numpy as np
import jax.numpy as jnp

from ground_plane_polling_tpu.inference import make_detect_fn
from ground_plane_polling_tpu.ops import anchors as anchor_ops
from ground_plane_polling_tpu.ops import box_coder as bc
from ground_plane_polling_tpu.ops.polling import normalize_planes

from .test_polling import K, P, P_INV, _project, _scene

IMG = (256, 512)


class _StubModel:
    def __init__(self, outputs):
        self.outputs = outputs

    def apply(self, variables, images):
        del variables, images
        return self.outputs


def _build_scene_outputs():
    h, w, l = 1.5, 1.7, 4.2
    kp2, pts3 = _scene(h, w, l, y_ground=1.65, depth=10.0)
    # 2D box around the projected object
    xs, ys = kp2[0::2], kp2[1::2]
    box2d = [xs.min() - 6, ys.min() - 4, xs.max() + 6, ys.max() + 4]
    gt12 = np.concatenate([box2d, kp2]).astype(np.float32)

    anchors = anchor_ops.anchors_for_shape(IMG)
    # best anchor by IoU with the 2D box
    from ground_plane_polling_tpu.ops.overlap import iou_matrix

    ious = np.asarray(iou_matrix(anchors, gt12[None, :4]))[:, 0]
    a_star = int(ious.argmax())
    assert ious[a_star] > 0.4

    targets, sign01 = bc.encode_boxes(anchors[a_star:a_star + 1], gt12[None])
    sign_half = 1 if float(sign01[0]) >= 0.5 else 0
    orientation = 1

    n = anchors.shape[0]
    cls = np.full((1, n, 8), 0.001, np.float32)
    cls[0, a_star, 4 * sign_half + orientation] = 0.95
    reg = np.zeros((1, n, 12), np.float32)
    reg[0, a_star] = np.asarray(targets)[0]
    dims_enc = np.zeros((1, n, 3), np.float32)
    dims_enc[0, a_star] = np.asarray(bc.encode_dims(np.array([h, w, l])))

    outputs = {"regression": jnp.asarray(reg),
               "regression_dim": jnp.asarray(dims_enc),
               "classification": jnp.asarray(cls)}
    return outputs, gt12, (h, w, l), orientation, pts3


def _planes():
    return np.array([
        [0.0, 1.0, 0.0, -1.2],
        [0.0, 1.0, 0.0, -1.65],   # true plane
        [0.02, 1.0, -0.01, -2.1],
    ], np.float32)


def _run(use_pallas=False):
    outputs, gt12, dims_true, orientation, pts3 = _build_scene_outputs()
    model = _StubModel(outputs)
    detect = make_detect_fn(model, IMG, num_classes=1, with_pose=True,
                            use_pallas_polling=use_pallas)
    planes = _planes()
    out = detect({}, jnp.zeros((1, *IMG, 3)),
                 jnp.asarray(P_INV[None], jnp.float32),
                 jnp.asarray(planes[None]))
    return out, gt12, dims_true, orientation, pts3, planes


def test_full_pipeline_recovers_scene():
    out, gt12, dims_true, orientation, pts3, planes = _run()
    scores = np.asarray(out.scores[0])
    assert (scores > 0.9).sum() == 1
    assert scores[0] > 0.9

    np.testing.assert_allclose(np.asarray(out.boxes[0, 0]), gt12,
                               rtol=1e-3, atol=0.25)
    np.testing.assert_allclose(np.asarray(out.dims[0, 0]), dims_true,
                               rtol=1e-4)
    assert int(out.orientations[0, 0]) == orientation

    # polling picked the true plane and the 3D keypoints
    want_plane = np.asarray(normalize_planes(planes[1]))
    np.testing.assert_allclose(np.asarray(out.keyplanes[0, 0, 0]),
                               want_plane, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.keypoints[0, 0]), pts3,
                               rtol=0.02, atol=0.05)
    assert float(out.residuals[0, 0]) < 0.1

    # pose: X_m/X_r derived location; orientation 1 => identity-ish rotation
    loc = np.asarray(out.locations[0, 0])
    # box bottom-centre = midpoint of X_m,X_r shifted by w/2 along z
    want_loc = (pts3[1] + pts3[2]) / 2 - np.array([0, 0, dims_true[1] / 2])
    np.testing.assert_allclose(loc, want_loc, rtol=0.05, atol=0.08)

    # padded rows stay -1
    assert (scores[1:] == -1).all()
    assert (np.asarray(out.boxes[0, 1:]) == -1).all()


def test_full_pipeline_pallas_matches_jnp():
    out_a, *_ = _run(use_pallas=False)
    out_b, *_ = _run(use_pallas=True)
    np.testing.assert_allclose(np.asarray(out_a.residuals),
                               np.asarray(out_b.residuals),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_a.keypoints[0, 0]),
                               np.asarray(out_b.keypoints[0, 0]),
                               rtol=1e-3, atol=1e-3)
