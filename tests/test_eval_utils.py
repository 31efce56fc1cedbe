"""Tests for evaluation, KITTI writing, and visualization utilities."""

import numpy as np

from ground_plane_polling_tpu.utils.eval import (
    average_precision, bucket_annotations, bucket_detections,
    evaluate_detections)
from ground_plane_polling_tpu.utils.kitti_writer import kitti_rows, wrap_angle
from ground_plane_polling_tpu.utils import visualization as vis


def test_average_precision_perfect():
    ap = average_precision(np.array([0.5, 1.0]), np.array([1.0, 1.0]))
    assert ap == 1.0


def test_average_precision_half():
    # one TP then one FP over two annotations: recall 0.5, precision envelope
    ap = average_precision(np.array([0.5, 0.5]), np.array([1.0, 0.5]))
    np.testing.assert_allclose(ap, 0.5)


def _det_row(box, dims=(1.5, 1.7, 4.2), score=0.9):
    kp = [box[0] + 1, box[3] - 1, (box[0] + box[2]) / 2, box[3] - 1,
          box[2] - 1, box[3] - 1, (box[0] + box[2]) / 2, box[1] + 1]
    return np.array([*box, *kp, *dims, score])


def _ann_row(box, dims=(1.5, 1.7, 4.2)):
    kp = [box[0] + 1, box[3] - 1, (box[0] + box[2]) / 2, box[3] - 1,
          box[2] - 1, box[3] - 1, (box[0] + box[2]) / 2, box[1] + 1]
    return np.array([*box, *kp, *dims])


def test_evaluate_perfect_detection():
    det = [[np.stack([_det_row((10, 10, 60, 60))]),
            np.zeros((0, 16)), np.zeros((0, 16)), np.zeros((0, 16))]]
    ann = [[np.stack([_ann_row((10, 10, 60, 60))]),
            np.zeros((0, 15)), np.zeros((0, 15)), np.zeros((0, 15))]]
    aps, kp_err, h_err, w_err, l_err = evaluate_detections(det, ann, 4)
    assert aps[0][0] == 1.0
    assert aps[0][1] == 1.0
    assert kp_err == 0.0 and h_err == 0.0


def test_evaluate_mismatched_bucket_is_fp():
    """A detection in the wrong orientation bucket never matches."""
    det = [[np.zeros((0, 16)), np.stack([_det_row((10, 10, 60, 60))]),
            np.zeros((0, 16)), np.zeros((0, 16))]]
    ann = [[np.stack([_ann_row((10, 10, 60, 60))]),
            np.zeros((0, 15)), np.zeros((0, 15)), np.zeros((0, 15))]]
    aps, *_ = evaluate_detections(det, ann, 4)
    assert aps[0][0] == 0.0  # annotation bucket: no detection
    assert aps[1] == (0.0, 0.0)  # detection bucket: no annotations


def test_bucketing_roundtrip():
    boxes = np.zeros((3, 12))
    boxes[:, 2:4] = 10
    dims = np.ones((3, 3))
    scores = np.array([0.9, 0.8, -1.0])
    labels = np.array([0, 0, -1])
    orients = np.array([2, 1, -1])
    buckets = bucket_detections(boxes, dims, scores, labels, orients, 1)
    assert len(buckets) == 4
    assert len(buckets[2]) == 1 and len(buckets[1]) == 1
    assert len(buckets[0]) == 0  # padded row dropped

    anns = np.zeros((2, 17))
    anns[0, 15:] = [0, 3]
    anns[1, 15:] = [0, 0]
    ab = bucket_annotations(anns, 1)
    assert len(ab[3]) == 1 and len(ab[0]) == 1 and len(ab[1]) == 0


def test_wrap_angle():
    np.testing.assert_allclose(wrap_angle(0.5), 0.5)
    np.testing.assert_allclose(wrap_angle(np.pi + 0.1), -np.pi + 0.1,
                               rtol=1e-6)
    np.testing.assert_allclose(wrap_angle(-np.pi - 0.1), np.pi - 0.1,
                               rtol=1e-6)
    np.testing.assert_allclose(wrap_angle(2 * np.pi + 0.3), 0.3, rtol=1e-6)


def test_kitti_rows_format():
    rows = kitti_rows(
        boxes=np.array([[10.0, 20, 300, 200]]),
        scores=np.array([0.87]),
        locations=np.array([[1.0, 1.65, 12.0]]),
        angles=np.array([[0.0, 0.3, 0.0]]),
        dimensions=np.array([[1.5, 1.7, 4.2]]),
        image_hw=(370, 1224),
    )
    parts = rows[0].split()
    assert parts[0] == "Car"
    assert parts[1] == "-1" and parts[2] == "-1"
    assert len(parts) == 16
    # ry field
    np.testing.assert_allclose(float(parts[14]), 0.3, atol=0.01)
    # h recomputed from corners == input h for a pure yaw rotation
    np.testing.assert_allclose(float(parts[8]), 1.5, atol=0.01)
    # Y = box bottom (location y) for yaw-only rotation
    np.testing.assert_allclose(float(parts[12]), 1.65, atol=0.01)
    # score last
    np.testing.assert_allclose(float(parts[15]), 0.87, atol=0.005)


def test_kitti_rows_clip_to_image():
    rows = kitti_rows(
        boxes=np.array([[-5.0, -3, 5000, 4000]]),
        scores=np.array([0.5]),
        locations=np.array([[0.0, 1.6, 9.0]]),
        angles=np.array([[0.0, 0.0, 0.0]]),
        dimensions=np.array([[1.5, 1.7, 4.2]]),
        image_hw=(370, 1224),
    )
    p = rows[0].split()
    assert float(p[4]) == 0.0 and float(p[5]) == 0.0
    assert float(p[6]) == 1224.0 and float(p[7]) == 370.0


def test_kitti_rows_never_touches_the_device(rng):
    """kitti_rows is host formatting code on the CLI critical path; a single
    device op per row cost ~2 s/frame through the TPU relay
    (tools/probe_run_network_wall.py). Pin host-only execution."""
    import jax

    n = 25
    kwargs = dict(
        boxes=rng.uniform(0, 300, (n, 4)),
        scores=rng.uniform(0, 1, n),
        locations=rng.uniform(-5, 30, (n, 3)),
        angles=rng.uniform(-1, 1, (n, 3)),
        dimensions=rng.uniform(1, 4, (n, 3)),
        image_hw=(370, 1224),
    )
    with jax.transfer_guard("disallow"):
        rows = kitti_rows(**kwargs)
    assert len(rows) == n
    # and the empty-detections path
    with jax.transfer_guard("disallow"):
        assert kitti_rows(
            boxes=np.zeros((0, 4)), scores=np.zeros(0),
            locations=np.zeros((0, 3)), angles=np.zeros((0, 3)),
            dimensions=np.zeros((0, 3)), image_hw=(370, 1224)) == []


def test_draw_3d_from_pose_never_touches_the_device(rng):
    """Same guard for the 3D wireframe renderer (run-network composites)."""
    import jax

    img = rng.randint(0, 255, (128, 256, 3)).astype(np.uint8)
    n = 6
    with jax.transfer_guard("disallow"):
        out = vis.draw_3d_detections_from_pose(
            img, rng.uniform(0, 120, (n, 4)), np.ones(n, np.int32),
            rng.uniform(0, 0.2, n), rng.uniform(0.5, 1, n),
            np.zeros(n, np.int32), rng.uniform(-3, 20, (n, 3)),
            rng.uniform(-1, 1, (n, 3)), rng.uniform(1, 4, (n, 3)),
            P=np.array([[200.0, 0, 128, 0], [0, 200.0, 64, 0],
                        [0, 0, 1, 0]]))
    assert out.shape == img.shape


def test_visualization_smoke(rng):
    img = rng.randint(0, 255, (128, 256, 3)).astype(np.uint8)
    boxes = np.array([[20.0, 20, 120, 100, 25, 95, 70, 97, 115, 94, 68, 25]])
    out = vis.draw_detections_with_keypoints(
        img, boxes, np.array([0.9]), np.array([0]), np.array([1]))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert (out != img).any()  # something was drawn

    out3d = vis.draw_3d_detections_from_pose(
        img, boxes[:, :4], np.array([1]), np.array([0.1]), np.array([0.9]),
        np.array([0]), np.array([[0.0, 1.65, 10.0]]),
        np.array([[0.0, 0.2, 0.0]]), np.array([[1.5, 1.7, 4.2]]),
        P=np.array([[200.0, 0, 128, 0], [0, 200.0, 64, 0], [0, 0, 1, 0]]))
    assert (out3d != img).any()

    ann = np.zeros((1, 17))
    ann[0, :12] = boxes[0]
    ann[0, 16] = 2
    out_ann = vis.draw_annotations_with_keypoints(img, ann)
    assert (out_ann != img).any()

    anchors = np.array([[10.0, 10, 50, 50], [60.0, 60, 90, 90]])
    labels8 = np.zeros((2, 8))
    labels8[0, 5] = 1
    out_anchor = vis.draw_anchors(img, anchors, labels8)
    assert (out_anchor != img).any()

    # 3D wireframe from raw polled keypoints (no pose needed)
    X_m = np.array([0.5, 1.65, 10.0])
    kp3 = np.stack([X_m - [0, 0, 1.7], X_m, X_m - [4.2, 0, 0],
                    X_m - [0, 1.5, 0]])
    out_kp3 = vis.draw_3d_detections(
        img, boxes[:, :4], kp3[None], np.array([0.05]), np.array([0.9]),
        np.array([0]), np.array([1]),
        P=np.array([[200.0, 0, 128, 0], [0, 200.0, 64, 0], [0, 0, 1, 0]]))
    assert (out_kp3 != img).any()


def test_plain_draw_helpers():
    """draw_annotations / draw_boxes (reference visualization.py:391-410,
    54-62) — plain variants without keypoint glyphs."""
    from ground_plane_polling_tpu.utils import visualization as vis

    img = np.zeros((128, 256, 3), np.uint8)
    ann = np.zeros((2, 17))
    ann[0, :4] = [20, 20, 80, 90]
    ann[0, 13] = 1.7
    ann[1, :4] = [100, 30, 180, 100]
    ann[1, 15] = 0

    out = vis.draw_annotations(img, ann)
    assert (out != img).any()
    out_named = vis.draw_annotations(
        img, ann, color=None, label_to_name=lambda i: "car")
    assert (out_named != img).any()

    boxes = np.array([[10.0, 10, 60, 60], [70.0, 20, 120, 90]])
    out_boxes = vis.draw_boxes(img, boxes, (0, 255, 0))
    assert (out_boxes != img).any()

    out_det = vis.draw_detections(
        img, boxes, np.array([0.9, 0.2]), np.array([0, 0]),
        np.array([1, 2]))
    assert (out_det != img).any()
