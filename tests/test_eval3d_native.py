"""numpy <-> native (C++) parity for the eval3d core.

The native library (native/gpp_eval3d.cpp) must reproduce the pure-numpy
devkit protocol exactly: overlap matrices to f64 precision and identical
tp/fp/fn/AOS accumulation, hence identical APs.
"""

import numpy as np
import pytest

from ground_plane_polling_tpu.utils import eval3d, eval3d_native

pytestmark = pytest.mark.skipif(not eval3d_native.available(),
                                reason="native eval3d core unavailable")


def _scene(rng, n, cls="Car"):
    x1 = rng.uniform(0, 1100, n)
    y1 = rng.uniform(50, 200, n)
    w = rng.uniform(20, 200, n)
    h = rng.uniform(20, 120, n)
    return {
        "type": np.array([cls] * n, object),
        "truncated": rng.uniform(0, 0.4, n),
        "occluded": rng.integers(0, 3, n),
        "alpha": rng.uniform(-np.pi, np.pi, n),
        "bbox": np.stack([x1, y1, x1 + w, y1 + h], 1),
        "dims": np.stack([rng.uniform(1.2, 2.0, n),
                          rng.uniform(1.4, 2.0, n),
                          rng.uniform(3.0, 5.0, n)], 1),
        "loc": np.stack([rng.uniform(-20, 20, n), rng.uniform(1.2, 2.0, n),
                         rng.uniform(5, 60, n)], 1),
        "ry": rng.uniform(-np.pi, np.pi, n),
        "score": rng.uniform(0.05, 1.0, n),
    }


def _numpy_only(monkeypatch):
    monkeypatch.setenv("GPP_EVAL3D_NATIVE", "0")


@pytest.mark.parametrize("seed", [0, 1])
def test_overlap_matrices_match(seed, monkeypatch):
    rng = np.random.default_rng(seed)
    det, gt = _scene(rng, 17), _scene(rng, 13)
    nat_bev = eval3d_native.bev_overlap(det, gt)
    nat_3d = eval3d_native.overlap_3d(det, gt)
    _numpy_only(monkeypatch)
    np_bev = eval3d.bev_overlap_matrix(det, gt)
    np_3d = eval3d.overlap_3d_matrix(det, gt)
    np.testing.assert_allclose(nat_bev, np_bev, atol=1e-12)
    np.testing.assert_allclose(nat_3d, np_3d, atol=1e-12)


def test_full_protocol_matches(monkeypatch):
    rng = np.random.default_rng(7)
    gts, dets = [], []
    for i in range(25):
        g = _scene(rng, int(rng.integers(0, 14)))
        # mix: jittered copies of a few GT boxes + random dets + a Van +
        # a DontCare region, to exercise every matching branch
        d = _scene(rng, int(rng.integers(0, 10)))
        if len(g["ry"]) >= 2:
            take = {k: (v[:2].copy() if hasattr(v, "copy") else v)
                    for k, v in g.items()}
            take["loc"] = take["loc"] + rng.normal(0, 0.2, take["loc"].shape)
            take["bbox"] = take["bbox"] + rng.normal(0, 2, take["bbox"].shape)
            take["score"] = rng.uniform(0.4, 1.0, 2)
            d = {k: np.concatenate([d[k], take[k]]) for k in d}
        if rng.random() < 0.5 and len(g["type"]):
            g["type"][0] = "Van"
        if rng.random() < 0.5 and len(g["type"]) > 1:
            g["type"][1] = "DontCare"
        gts.append(g)
        dets.append(d)
    r_nat = eval3d.evaluate_kitti_3d(gts, dets,
                                     metrics=("bbox", "bev", "3d"),
                                     ap_mode="40")
    _numpy_only(monkeypatch)
    r_np = eval3d.evaluate_kitti_3d(gts, dets,
                                    metrics=("bbox", "bev", "3d"),
                                    ap_mode="40")
    for metric in ("bbox", "bev", "3d", "aos"):
        for diff in eval3d.DIFFICULTY_NAMES:
            a, b = r_nat["Car"][metric][diff], r_np["Car"][metric][diff]
            assert a == pytest.approx(b, abs=1e-9), (metric, diff)


def test_empty_images(monkeypatch):
    rng = np.random.default_rng(3)
    gts = [_scene(rng, 0), _scene(rng, 5)]
    dets = [_scene(rng, 4), _scene(rng, 0)]
    r_nat = eval3d.evaluate_kitti_3d(gts, dets, metrics=("bbox",))
    _numpy_only(monkeypatch)
    r_np = eval3d.evaluate_kitti_3d(gts, dets, metrics=("bbox",))
    assert (r_nat["Car"]["bbox"]["moderate"]
            == pytest.approx(r_np["Car"]["bbox"]["moderate"]))


def test_oversized_image_falls_back(monkeypatch):
    # >4096 detections exceeds the native per-image buffer; _eval_class
    # must route that image through the numpy path with identical results
    rng = np.random.default_rng(11)
    gt = _scene(rng, 6)
    det = _scene(rng, 4100)
    # make a couple of real matches so the curve is non-trivial
    for k in ("bbox", "dims", "loc", "ry", "alpha"):
        det[k][:2] = gt[k][:2]
    det["score"][:2] = 0.95
    r_nat = eval3d.evaluate_kitti_3d([gt], [det], metrics=("bbox",),
                                     ap_mode="11")
    _numpy_only(monkeypatch)
    r_np = eval3d.evaluate_kitti_3d([gt], [det], metrics=("bbox",),
                                    ap_mode="11")
    assert (r_nat["Car"]["bbox"]["moderate"]
            == pytest.approx(r_np["Car"]["bbox"]["moderate"], abs=1e-9))
