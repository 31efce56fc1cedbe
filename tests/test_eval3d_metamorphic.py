"""Metamorphic properties of the KITTI devkit evaluator (utils/eval3d.py).

Round-4 VERDICT missing item 4: utils/eval3d.py and its C++ twin
(native/gpp_eval3d.cpp) are parity-tested against each other, and
tests/test_eval3d.py pins analytic fixtures — but a PROTOCOL misreading
shared by both twins would pass all of that. The actual devkit binary
(`evaluate_object_3d_offline.cpp`) cannot be obtained on this box (zero
egress; the reference repo does not vendor it), so this module attacks
the protocol with metamorphic properties that hold for the devkit BY
CONSTRUCTION of its algorithm and would each catch a distinct class of
misreading:

  * detection-order permutation invariance     (protocol sorts by score)
  * strictly-monotone score-transform invariance (protocol is rank-based:
    thresholds are taken FROM the TP score list, so any order-preserving
    rescaling of all det scores is a no-op)
  * duplicate detections are FPs               (second det on a matched GT
    must count against precision, never as a second TP)
  * the exact px boundary of the height gate, including the devkit's
    ASYMMETRY: GT ignored when height <= MIN_HEIGHT (evaluate_object_3d_
    offline.cpp cleanData's `height<=MIN_HEIGHT[difficulty]`), detections
    ignored when height < MIN_HEIGHT (strict)
  * Van-matched detections are neutral for Car at ANY score
  * DontCare-zone detections are neutral at ANY score
  * world rigid-motion invariance of BEV/3D AP (translate the whole scene
    in the road plane / rotate it about the camera Y axis: all pairwise
    rotated-IoU values are preserved, so every AP must be bit-identical)

All default lane (pure numpy, < 5 s).
"""

import numpy as np
import pytest

from ground_plane_polling_tpu.utils import eval3d

from .test_eval3d import _obj, _parse_lines, _perfect_scene


def _eval_bbox(gt_lines, det_lines, ap_mode="40", metrics=("bbox",)):
    return eval3d.evaluate_kitti_3d([_parse_lines(gt_lines)],
                                    [_parse_lines(det_lines)],
                                    metrics=metrics, ap_mode=ap_mode)


def _mixed_scene():
    """GTs + matching dets + FPs + near-threshold scores: enough structure
    that an order/threshold bug cannot cancel out."""
    g, d = _perfect_scene(n_gt=40, seed=3)
    rng = np.random.default_rng(7)
    for i in range(12):  # far-away FPs with interleaved scores
        d.append(_obj(bbox=(2000 + 40 * i, 100, 2025 + 40 * i, 160),
                      loc=(300.0 + 5 * i, 1.65, 150.0),
                      score=float(rng.uniform(0.05, 0.95))))
    return g, d


def _results_equal(a, b):
    for cls in a:
        for metric in a[cls]:
            for diff, va in a[cls][metric].items():
                vb = b[cls][metric][diff]
                if np.isnan(va) and np.isnan(vb):
                    continue
                assert va == pytest.approx(vb, abs=1e-9), (
                    cls, metric, diff, va, vb)


def test_detection_order_permutation_invariance():
    g, d = _mixed_scene()
    base = _eval_bbox(g, d, metrics=("bbox", "bev", "3d"))
    rng = np.random.default_rng(0)
    for _ in range(3):
        perm = list(d)
        rng.shuffle(perm)
        _results_equal(base, _eval_bbox(g, perm,
                                        metrics=("bbox", "bev", "3d")))


@pytest.mark.parametrize("ap_mode", ["11", "40"])
def test_monotone_score_transform_invariance(ap_mode):
    """Any strictly increasing transform of ALL detection scores leaves
    every AP unchanged: the devkit samples precision at thresholds drawn
    from the sorted TP scores themselves, so only the ORDER of scores can
    matter. Catches any accidental dependence on score magnitude
    (fixed-grid thresholding, score binning, epsilon comparisons)."""
    g, d = _mixed_scene()
    base = _eval_bbox(g, d, ap_mode=ap_mode)

    def transform(line, f):
        parts = line.split()
        parts[-1] = f"{f(float(parts[-1])):.6f}"
        return " ".join(parts)

    for f in (lambda s: s ** 3,            # convex squash, order kept
              lambda s: 0.05 + 0.1 * s,    # affine shrink
              lambda s: np.tanh(4 * s)):   # saturating
        got = _eval_bbox(g, [transform(x, f) for x in d], ap_mode=ap_mode)
        _results_equal(base, got)


def test_duplicate_detections_are_false_positives():
    g, d = _perfect_scene(n_gt=40, seed=1)
    dups = []
    for line in d:
        parts = line.split()
        parts[-1] = f"{float(parts[-1]) - 0.002:.4f}"  # just below original
        dups.append(" ".join(parts))
    clean = _eval_bbox(g, d)
    doubled = _eval_bbox(g, d + dups)
    # every duplicate lands on an already-claimed GT -> pure FP stream;
    # precision at every sampled recall is ~halved, AP must drop hard
    assert (doubled["Car"]["bbox"]["moderate"]
            < clean["Car"]["bbox"]["moderate"] - 5.0), (clean, doubled)
    # and the TP set is unchanged: recall still reaches 1, so AP stays
    # well above the all-FP floor
    assert doubled["Car"]["bbox"]["moderate"] > 30.0


def test_height_gate_exact_boundary_asymmetry():
    """The devkit gates GT with `height <= MIN_HEIGHT[difficulty]`
    (cleanData, evaluate_object_3d_offline.cpp) but detections with the
    STRICT `height < MIN_HEIGHT[difficulty]` — a real asymmetry both our
    twins must reproduce. Pin the exact-equality behaviour at 40 px
    (easy) and 25 px (moderate/hard)."""
    def gate(height, difficulty, kind):
        lines = [_obj(bbox=(100, 100, 150, 100 + height),
                      score=0.9 if kind == "det" else None)]
        parsed = _parse_lines(lines)
        empty = _parse_lines([])
        if kind == "gt":
            ig_gt, _, _, n_valid = eval3d._clean_data(
                "Car", parsed, empty, difficulty)
            return int(ig_gt[0]), n_valid
        _, _, ig_det, _ = eval3d._clean_data("Car", empty, parsed,
                                             difficulty)
        return int(ig_det[0])

    # GT: exactly 40 px is IGNORED for easy (<=), 40.01 px is valid
    assert gate(40.0, 0, "gt") == (1, 0)
    assert gate(40.01, 0, "gt") == (0, 1)
    # GT at exactly 25 px: ignored for moderate AND hard
    assert gate(25.0, 1, "gt") == (1, 0)
    assert gate(25.01, 1, "gt") == (0, 1)
    assert gate(25.0, 2, "gt") == (1, 0)
    # detections: exactly 40/25 px is KEPT (strict <), just under is not
    assert gate(40.0, 0, "det") == 0
    assert gate(39.99, 0, "det") == 1
    assert gate(25.0, 1, "det") == 0
    assert gate(24.99, 1, "det") == 1


def test_van_matched_detections_neutral_for_car_at_any_score():
    """Detections that land on Van GT are 'ignored' for Car eval (the
    neighbour-class rule): adding them at ANY score — above, between, or
    below every real score — must not move any Car AP."""
    g, d = _perfect_scene(n_gt=30, seed=2)
    # Van GTs well away from the Car GTs (easy-valid heights)
    van_boxes = [(1500 + 120 * i, 100, 1560 + 120 * i, 170)
                 for i in range(6)]
    g_van = g + [_obj(type_="Van", bbox=b,
                      loc=(100.0 + 3 * i, 1.65, 30.0), ry=0.3)
                 for i, b in enumerate(van_boxes)]
    base = _eval_bbox(g_van, d)
    for score in (0.999, 0.5, 0.011):
        d_extra = d + [_obj(bbox=b, loc=(100.0 + 3 * i, 1.65, 30.0),
                            ry=0.3, score=score)
                       for i, b in enumerate(van_boxes)]
        _results_equal(base, _eval_bbox(g_van, d_extra))


def test_dontcare_zone_detections_neutral_at_any_score():
    """Detections mostly inside a DontCare region (intersection over
    DETECTION area > class threshold) are discarded, at any score."""
    g, d = _perfect_scene(n_gt=30, seed=4)
    dc = (3000, 80, 3400, 200)
    g_dc = g + [_obj(type_="DontCare", bbox=dc, dims=(-1, -1, -1),
                     loc=(-1000, -1000, -1000), ry=-10, alpha=-10,
                     trunc=-1, occ=-1)]
    base = _eval_bbox(g_dc, d)
    for score in (0.999, 0.4, 0.02):
        inside = [_obj(bbox=(3050 + 60 * i, 100, 3100 + 60 * i, 160),
                       loc=(400.0, 1.65, 120.0), score=score)
                  for i in range(4)]
        _results_equal(base, _eval_bbox(g_dc, d + inside))
    # control: the same boxes WITHOUT the DontCare GT are FPs and DO
    # move the AP — the neutrality above is the DontCare rule, not
    # insensitivity
    inside = [_obj(bbox=(3050 + 60 * i, 100, 3100 + 60 * i, 160),
                   loc=(400.0, 1.65, 120.0), score=0.999)
              for i in range(4)]
    moved = _eval_bbox(g, d + inside)
    clean = _eval_bbox(g, d)
    assert (moved["Car"]["bbox"]["moderate"]
            < clean["Car"]["bbox"]["moderate"] - 1.0)


def test_world_rigid_motion_invariance_bev_3d():
    """Translating every object in the road plane, or rotating the whole
    scene about the camera Y axis, preserves every pairwise rotated IoU —
    all BEV/3D APs must be bit-identical (2D boxes untouched, so the
    difficulty gate sees the same heights)."""
    g, d = _mixed_scene()
    base = _eval_bbox(g, d, metrics=("bev", "3d"))

    def move(line, dx, dz, phi):
        parts = line.split()
        x, y, z = (float(parts[11]), float(parts[12]), float(parts[13]))
        ry = float(parts[14])
        c, s = np.cos(phi), np.sin(phi)
        x, z = c * x + s * z, -s * x + c * z
        parts[11] = f"{x + dx:.6f}"
        parts[12] = f"{y:.6f}"
        parts[13] = f"{z + dz:.6f}"
        parts[14] = f"{ry + phi:.6f}"
        return " ".join(parts)

    for dx, dz, phi in [(7.5, -12.0, 0.0), (0.0, 0.0, 0.7),
                        (-3.0, 25.0, -1.2)]:
        got = _eval_bbox([move(x, dx, dz, phi) for x in g],
                         [move(x, dx, dz, phi) for x in d],
                         metrics=("bev", "3d"))
        for metric in ("bev", "3d"):
            for diff in eval3d.DIFFICULTY_NAMES:
                assert got["Car"][metric][diff] == pytest.approx(
                    base["Car"][metric][diff], abs=1e-6), (
                    metric, diff, dx, dz, phi)
