"""Golden parity for the evaluation pipeline against the REFERENCE'S OWN
`evaluate()` (/root/reference/keras_retinanet_3D/utils/eval.py:169-262).

The reference's eval is pure numpy + cv2 and runs as-is on this box, so we
drive the WHOLE thing — `_get_detections` (threshold, sort, cap, bucket),
`_get_annotations`, the greedy IoU matching, the py-faster-rcnn AP, and the
four L1 regression errors — through a stub generator + stub model whose
`predict_on_batch` replays pre-built detection arrays. Our
`bucket_detections` / `bucket_annotations` / `evaluate_detections`
(ground_plane_polling_tpu/utils/eval.py) must produce identical per-bucket
(AP, n_annotations) pairs and identical keypoint/height/width/length errors
on the same inputs.

This covers the risk classes the re-derived unit tests can't: bucket-index
layout (4*label+orientation; the reference reads label from col -1 and
orientation from col -2 of its detection rows but the OPPOSITE columns of
its annotation rows), double-match suppression order, the no-annotation
bucket convention (AP := 0, not skipped), and the error-column slicing
(d[4:15]: 8 keypoint coords + 3 dims).
"""

import sys

import numpy as np
import pytest

REF_ROOT = "/root/reference"


@pytest.fixture(scope="module")
def ref_eval():
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    return pytest.importorskip("keras_retinanet_3D.utils.eval")


def _random_scene(rng, n_images, num_classes, max_det=14, max_ann=10):
    """Per-image raw detection arrays + (G, 17) annotations.

    Detections are shaped like our detector's padded output (score -1 on
    padding rows, kept scores above the 0.05 threshold both pipelines use).
    Roughly half the detections are jittered copies of an annotation (TP
    candidates, including deliberate duplicates on one box); the rest are
    random (FP). Some images get zero annotations for some buckets.
    """
    scenes = []
    for _ in range(n_images):
        g = rng.randint(0, max_ann + 1)
        cx = rng.uniform(50, 1200, g)
        cy = rng.uniform(50, 350, g)
        w = rng.uniform(30, 200, g)
        h = rng.uniform(20, 120, g)
        boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], 1)
        keypoints = rng.uniform(0, 1300, (g, 8))
        dims = rng.uniform(1.0, 4.0, (g, 3))
        labels = rng.randint(0, num_classes, g)
        orientations = rng.randint(0, 4, g)
        ann = np.concatenate(
            [boxes, keypoints, dims, labels[:, None], orientations[:, None]],
            axis=1).astype(np.float64)

        k = rng.randint(0, max_det + 1)
        det_boxes = np.zeros((k, 12))
        det_dims = np.zeros((k, 3))
        det_scores = np.zeros(k)
        det_labels = np.zeros(k)
        det_orients = np.zeros(k)
        for i in range(k):
            if g and rng.rand() < 0.6:
                j = rng.randint(0, g)  # TP candidate (duplicates possible)
                jitter = rng.uniform(-6, 6, 4)
                det_boxes[i, :4] = ann[j, :4] + jitter
                det_boxes[i, 4:] = ann[j, 4:12] + rng.uniform(-5, 5, 8)
                det_dims[i] = ann[j, 12:15] + rng.uniform(-0.3, 0.3, 3)
                det_labels[i] = ann[j, 15]
                det_orients[i] = ann[j, 16]
            else:
                x1 = rng.uniform(0, 1100)
                y1 = rng.uniform(0, 300)
                det_boxes[i, :4] = [x1, y1, x1 + rng.uniform(20, 200),
                                    y1 + rng.uniform(20, 120)]
                det_boxes[i, 4:] = rng.uniform(0, 1300, 8)
                det_dims[i] = rng.uniform(1.0, 4.0, 3)
                det_labels[i] = rng.randint(0, num_classes)
                det_orients[i] = rng.randint(0, 4)
            det_scores[i] = rng.uniform(0.06, 1.0)

        # pad like our detector: fixed 20-row output, score -1 padding
        pad = 20 - k
        det = dict(
            boxes=np.concatenate([det_boxes, np.zeros((pad, 12))]),
            dims=np.concatenate([det_dims, np.zeros((pad, 3))]),
            scores=np.concatenate([det_scores, -np.ones(pad)]),
            labels=np.concatenate([det_labels, -np.ones(pad)]),
            orientations=np.concatenate([det_orients, -np.ones(pad)]),
        )
        scenes.append((det, ann))
    return scenes


class _StubGenerator:
    """Minimal generator protocol for the reference's _get_detections /
    _get_annotations (reference eval.py:58-167)."""

    def __init__(self, scenes, num_classes):
        self._scenes = scenes
        self._num_classes = num_classes
        self.plane_params = np.zeros((8, 4), dtype=np.float64)

    def size(self):
        return len(self._scenes)

    def num_classes(self):
        return self._num_classes

    def load_image(self, i):
        return np.zeros((8, 8, 3), dtype=np.uint8)

    def preprocess_image(self, image):
        return image.astype(np.float64)

    def resize_image(self, image):
        return image, 1.0

    def load_calibration(self, i):
        P = np.zeros((3, 4))
        P[0, 0] = P[1, 1] = 700.0
        P[2, 2] = 1.0
        return P

    def load_annotations(self, i):
        return [self._scenes[i][1]]


class _StubModel:
    """Replays the pre-built detection arrays through predict_on_batch."""

    def __init__(self, scenes):
        self._scenes = scenes
        self._i = 0

    def predict_on_batch(self, inputs):
        det = self._scenes[self._i][0]
        self._i += 1
        k = det["scores"].shape[0]
        return [
            det["boxes"][None].copy(),                  # (1, K, 12)
            det["dims"][None].copy(),                   # (1, K, 3)
            det["scores"][None].copy(),                 # (1, K)
            det["labels"][None].copy(),                 # (1, K)
            det["orientations"][None].copy(),           # (1, K)
            np.zeros((1, k, 4, 3)),                     # plane_pts
            np.zeros((1, k, 1, 4)),                     # planes
            np.zeros((1, k)),                           # residuals
        ]


@pytest.mark.parametrize("seed,num_classes", [(0, 1), (1, 2), (7, 3)])
def test_evaluate_matches_reference(ref_eval, seed, num_classes):
    from ground_plane_polling_tpu.utils.eval import (bucket_annotations,
                                                     bucket_detections,
                                                     evaluate_detections)

    rng = np.random.RandomState(seed)
    scenes = _random_scene(rng, n_images=6, num_classes=num_classes)

    gen = _StubGenerator(scenes, num_classes)
    model = _StubModel(scenes)
    ref_aps, ref_kp, ref_h, ref_w, ref_l = ref_eval.evaluate(
        gen, model, iou_threshold=0.5, score_threshold=0.05,
        max_detections=100)

    detections = [bucket_detections(det["boxes"], det["dims"], det["scores"],
                                    det["labels"], det["orientations"],
                                    num_classes)
                  for det, _ in scenes]
    annotations = [bucket_annotations(ann, num_classes)
                   for _, ann in scenes]
    ours = evaluate_detections(detections, annotations,
                               num_buckets=4 * num_classes,
                               iou_threshold=0.5)
    our_aps, our_kp, our_h, our_w, our_l = ours

    assert set(our_aps) == set(ref_aps)
    for bucket in ref_aps:
        ref_ap, ref_n = ref_aps[bucket]
        our_ap, our_n = our_aps[bucket]
        assert our_n == ref_n, f"bucket {bucket} annotation count"
        assert np.isclose(our_ap, ref_ap, atol=1e-12), f"bucket {bucket} AP"
    assert np.isclose(our_kp, ref_kp)
    assert np.isclose(our_h, ref_h)
    assert np.isclose(our_w, ref_w)
    assert np.isclose(our_l, ref_l)


def test_evaluate_reference_empty_scene(ref_eval):
    """Zero detections + zero annotations: both report AP 0 with n=0."""
    from ground_plane_polling_tpu.utils.eval import (bucket_annotations,
                                                     bucket_detections,
                                                     evaluate_detections)

    det = dict(boxes=np.zeros((4, 12)), dims=np.zeros((4, 3)),
               scores=-np.ones(4), labels=-np.ones(4),
               orientations=-np.ones(4))
    ann = np.zeros((0, 17))
    scenes = [(det, ann)]

    ref_aps, ref_kp, ref_h, ref_w, ref_l = ref_eval.evaluate(
        _StubGenerator(scenes, 1), _StubModel(scenes))
    ours = evaluate_detections(
        [bucket_detections(det["boxes"], det["dims"], det["scores"],
                           det["labels"], det["orientations"], 1)],
        [bucket_annotations(ann, 1)], num_buckets=4)

    assert all(v == (0, 0) for v in ref_aps.values())
    assert all(v == (0.0, 0.0) for v in ours[0].values())
    assert (ref_kp, ref_h, ref_w, ref_l) == (0, 0, 0, 0)
    assert ours[1:] == (0.0, 0.0, 0.0, 0.0)
