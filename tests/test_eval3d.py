"""KITTI devkit-semantics evaluator (utils/eval3d.py).

Geometry is checked exactly (analytic cases) and against an independent
Monte-Carlo point-sampling oracle; the AP protocol is checked through
behavioural goldens that pin the devkit rules: difficulty gating,
neighbour-class ignores (Van for Car), DontCare FP suppression, AOS.
"""

import os

import numpy as np
import pytest

from ground_plane_polling_tpu.utils import eval3d


# --- helpers ---------------------------------------------------------------

def _mc_intersection(ca, cb, n=200_000, seed=0):
    """Monte-Carlo area of intersection of two convex quads."""
    rng = np.random.default_rng(seed)
    allc = np.concatenate([ca, cb])
    lo, hi = allc.min(0), allc.max(0)
    pts = rng.uniform(lo, hi, size=(n, 2))

    def inside(c, p):
        c = eval3d._ccw(c)
        ok = np.ones(len(p), bool)
        for i in range(4):
            a, b = c[i], c[(i + 1) % 4]
            cross = ((b[0] - a[0]) * (p[:, 1] - a[1])
                     - (b[1] - a[1]) * (p[:, 0] - a[0]))
            ok &= cross >= 0
        return ok

    frac = np.mean(inside(ca, pts) & inside(cb, pts))
    return frac * np.prod(hi - lo)


def _obj(type_="Car", bbox=(0, 0, 100, 100), dims=(1.5, 1.6, 4.0),
         loc=(0, 1.65, 20.0), ry=0.0, alpha=0.0, score=None,
         trunc=0.0, occ=0):
    score_s = "" if score is None else f" {score:.4f}"
    return (f"{type_} {trunc:.2f} {occ} {alpha:.4f} "
            f"{bbox[0]:.2f} {bbox[1]:.2f} {bbox[2]:.2f} {bbox[3]:.2f} "
            f"{dims[0]:.2f} {dims[1]:.2f} {dims[2]:.2f} "
            f"{loc[0]:.2f} {loc[1]:.2f} {loc[2]:.2f} {ry:.4f}" + score_s)


def _parse_lines(lines):
    import io
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".txt",
                                     delete=False) as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))
        path = f.name
    try:
        return eval3d.parse_label_file(path)
    finally:
        os.unlink(path)


# --- geometry ---------------------------------------------------------------

def test_axis_aligned_intersection_exact():
    a = eval3d.rotated_rect_corners(np.array([[0.0, 0.0]]),
                                    np.array([0.0]),
                                    np.array([[4.0, 2.0]]))[0]
    b = eval3d.rotated_rect_corners(np.array([[2.0, 1.0]]),
                                    np.array([0.0]),
                                    np.array([[4.0, 2.0]]))[0]
    # overlap region: x in [0,2] z in [0,1] -> area 2
    assert np.isclose(eval3d.rect_intersection_area(a, b), 2.0)


def test_unit_square_45deg_octagon():
    a = eval3d.rotated_rect_corners(np.zeros((1, 2)), np.array([0.0]),
                                    np.ones((1, 2)))[0]
    b = eval3d.rotated_rect_corners(np.zeros((1, 2)),
                                    np.array([np.pi / 4]),
                                    np.ones((1, 2)))[0]
    inter = eval3d.rect_intersection_area(a, b)
    assert np.isclose(inter, 2 * (np.sqrt(2) - 1), atol=1e-9)


def test_disjoint_and_contained():
    a = eval3d.rotated_rect_corners(np.zeros((1, 2)), np.array([0.3]),
                                    np.array([[4.0, 2.0]]))[0]
    far = eval3d.rotated_rect_corners(np.array([[100.0, 0.0]]),
                                      np.array([1.0]),
                                      np.array([[4.0, 2.0]]))[0]
    small = eval3d.rotated_rect_corners(np.zeros((1, 2)),
                                        np.array([0.3 + np.pi / 7]),
                                        np.array([[0.5, 0.5]]))[0]
    assert eval3d.rect_intersection_area(a, far) == 0.0
    # `small` fits entirely inside `a` -> intersection == its own area
    assert np.isclose(eval3d.rect_intersection_area(a, small),
                      eval3d.polygon_area(small), atol=1e-9)


@pytest.mark.parametrize("seed", [1, 2, 3, 4])
def test_intersection_matches_monte_carlo(seed):
    rng = np.random.default_rng(seed)
    loc = rng.uniform(-2, 2, size=(2, 2))
    ry = rng.uniform(-np.pi, np.pi, size=2)
    lw = rng.uniform(0.5, 4.0, size=(2, 2))
    corners = eval3d.rotated_rect_corners(loc, ry, lw)
    exact = eval3d.rect_intersection_area(corners[0], corners[1])
    mc = _mc_intersection(corners[0], corners[1], seed=seed)
    assert np.isclose(exact, mc, rtol=0.03, atol=0.02)


def test_rigid_motion_invariance():
    rng = np.random.default_rng(7)
    loc = rng.uniform(-2, 2, size=(2, 2))
    ry = rng.uniform(-np.pi, np.pi, size=2)
    lw = rng.uniform(0.5, 4.0, size=(2, 2))
    base = eval3d.rotated_rect_corners(loc, ry, lw)
    a0 = eval3d.rect_intersection_area(base[0], base[1])
    # a shared rigid motion (rotate locations AND headings by the same
    # angle, then translate) must leave the intersection area unchanged
    R = np.array([[np.cos(0.9), np.sin(0.9)], [-np.sin(0.9), np.cos(0.9)]])
    loc_r = loc @ R.T + np.array([3.0, -2.0])
    rigid = eval3d.rotated_rect_corners(loc_r, ry + 0.9, lw)
    a2 = eval3d.rect_intersection_area(rigid[0], rigid[1])
    assert np.isclose(a0, a2, atol=1e-9)


def test_3d_overlap_height_term():
    def d(loc_y, h):
        return {"ry": np.zeros(1), "loc": np.array([[0.0, loc_y, 10.0]]),
                "dims": np.array([[h, 2.0, 4.0]])}
    # identical boxes -> IoU 1
    m = eval3d.overlap_3d_matrix(d(1.6, 1.6), d(1.6, 1.6))
    assert np.isclose(m[0, 0], 1.0)
    # same footprint, half vertical overlap: spans [0,1.6] vs [0.8, 2.4]
    m = eval3d.overlap_3d_matrix(d(1.6, 1.6), d(2.4, 1.6))
    assert np.isclose(m[0, 0], 0.8 / (1.6 + 1.6 - 0.8))
    # stacked, touching -> 0
    m = eval3d.overlap_3d_matrix(d(1.6, 1.6), d(3.2, 1.6))
    assert m[0, 0] == 0.0


def test_bbox_overlap_criteria():
    a = np.array([[0.0, 0.0, 10.0, 10.0]])
    b = np.array([[5.0, 0.0, 15.0, 10.0]])
    iou = eval3d.bbox_overlap_matrix(a, b)[0, 0]
    assert np.isclose(iou, 50.0 / 150.0)
    # criterion 0: intersection / area_a
    assert np.isclose(eval3d.bbox_overlap_matrix(a, b, 0)[0, 0], 0.5)


# --- protocol ---------------------------------------------------------------

def _perfect_scene(n_gt=60, seed=0):
    """One big image worth of GTs + perfectly matching detections."""
    rng = np.random.default_rng(seed)
    lines_gt, lines_det = [], []
    for i in range(n_gt):
        x1 = 10 + 30 * i
        bbox = (x1, 100, x1 + 25, 160)          # height 60 -> easy-valid
        loc = (float(rng.uniform(-20, 20)), 1.65,
               float(rng.uniform(8, 60)))
        ry = float(rng.uniform(-np.pi, np.pi))
        alpha = float(rng.uniform(-np.pi, np.pi))
        dims = (1.5, 1.7, 4.2)
        lines_gt.append(_obj(bbox=bbox, dims=dims, loc=loc, ry=ry,
                             alpha=alpha))
        lines_det.append(_obj(bbox=bbox, dims=dims, loc=loc, ry=ry,
                              alpha=alpha, score=0.99 - 0.005 * i))
    return lines_gt, lines_det


def test_perfect_detections_ap_near_100():
    g, d = _perfect_scene()
    res = eval3d.evaluate_kitti_3d([_parse_lines(g)], [_parse_lines(d)],
                                   metrics=("bbox", "bev", "3d"),
                                   ap_mode="40")
    for metric in ("bbox", "bev", "3d", "aos"):
        for diff in eval3d.DIFFICULTY_NAMES:
            assert res["Car"][metric][diff] > 95.0, (metric, diff, res)
    res11 = eval3d.evaluate_kitti_3d([_parse_lines(g)], [_parse_lines(d)],
                                     metrics=("bbox",), ap_mode="11")
    assert res11["Car"]["bbox"]["moderate"] > 90.0


def test_false_positives_reduce_ap():
    g, d = _perfect_scene(n_gt=50)
    # add 25 confident FPs far from everything
    for i in range(25):
        d.append(_obj(bbox=(3000 + 40 * i, 100, 3025 + 40 * i, 160),
                      loc=(500 + i, 1.65, 200.0), score=0.999))
    res = eval3d.evaluate_kitti_3d([_parse_lines(g)], [_parse_lines(d)],
                                   metrics=("bbox",), ap_mode="40")
    clean = eval3d.evaluate_kitti_3d([_parse_lines(g)],
                                     [_parse_lines(_perfect_scene(50)[1])],
                                     metrics=("bbox",), ap_mode="40")
    assert (res["Car"]["bbox"]["moderate"]
            < clean["Car"]["bbox"]["moderate"] - 5.0)


def test_aos_flipped_alpha():
    g, d = _perfect_scene(n_gt=50)
    flipped = []
    for line in d:
        parts = line.split()
        parts[3] = f"{float(parts[3]) + np.pi:.4f}"
        flipped.append(" ".join(parts))
    res = eval3d.evaluate_kitti_3d([_parse_lines(g)],
                                   [_parse_lines(flipped)],
                                   metrics=("bbox",), ap_mode="40")
    # 2D AP unaffected, orientation similarity ~0
    assert res["Car"]["bbox"]["moderate"] > 95.0
    assert res["Car"]["aos"]["moderate"] < 2.0


def test_difficulty_gating_small_boxes():
    # GT box height 30 px: ignored for easy (<=40), valid for mod/hard
    g = [_obj(bbox=(100, 100, 140, 130))]
    d = [_obj(bbox=(100, 100, 140, 130), score=0.9)]
    gt, det = _parse_lines(g), _parse_lines(d)
    ig_easy, _, _, n_easy = eval3d._clean_data("Car", gt, det, 0)
    ig_mod, _, _, n_mod = eval3d._clean_data("Car", gt, det, 1)
    assert n_easy == 0 and ig_easy[0] == 1     # ignored, not removed
    assert n_mod == 1 and ig_mod[0] == 0
    # the matching det must NOT become an easy FP. (ap_mode="11": with a
    # single GT only recall sample 0 fills, and R40 skips sample 0 by
    # definition — the devkit's small-N behaviour, reproduced faithfully.)
    res = eval3d.evaluate_kitti_3d([gt], [det], metrics=("bbox",),
                                   ap_mode="11")
    assert np.isnan(res["Car"]["bbox"]["easy"])   # no valid easy GT
    assert res["Car"]["bbox"]["moderate"] > 0.0


def test_occlusion_truncation_gating():
    g = [_obj(occ=2, bbox=(0, 0, 50, 60)),       # hard-only by occlusion
         _obj(trunc=0.4, bbox=(100, 0, 150, 60))]  # hard-only by truncation
    gt = _parse_lines(g)
    det = _parse_lines([])
    for diff, expected in [(0, 0), (1, 0), (2, 2)]:
        _, _, _, n = eval3d._clean_data("Car", gt, det, diff)
        assert n == expected


def test_van_is_ignored_for_car():
    # One Car GT detected + one detection on a Van: the Van det must be
    # absorbed (no FP), giving the same AP as without it.
    g = [_obj(bbox=(0, 0, 50, 60)),
         _obj(type_="Van", bbox=(200, 0, 250, 60))]
    d_clean = [_obj(bbox=(0, 0, 50, 60), score=0.9)]
    d_van = d_clean + [_obj(bbox=(200, 0, 250, 60), score=0.95)]
    r_clean = eval3d.evaluate_kitti_3d([_parse_lines(g)],
                                       [_parse_lines(d_clean)],
                                       metrics=("bbox",))
    r_van = eval3d.evaluate_kitti_3d([_parse_lines(g)],
                                     [_parse_lines(d_van)],
                                     metrics=("bbox",))
    assert (r_clean["Car"]["bbox"]["moderate"]
            == r_van["Car"]["bbox"]["moderate"])


def test_dontcare_suppresses_fp():
    g = [_obj(bbox=(0, 0, 50, 60)),
         _obj(type_="DontCare", bbox=(200, 0, 260, 60), dims=(-1, -1, -1),
              loc=(-1000, -1000, -1000), ry=-10, alpha=-10)]
    d = [_obj(bbox=(0, 0, 50, 60), score=0.9),
         _obj(bbox=(205, 5, 255, 58), score=0.95)]   # inside DontCare
    d_fp = [_obj(bbox=(0, 0, 50, 60), score=0.9),
            _obj(bbox=(500, 5, 550, 58), score=0.95)]  # plain FP
    # ap_mode="11" — single-GT scene, see test_difficulty_gating note
    r_dc = eval3d.evaluate_kitti_3d([_parse_lines(g)], [_parse_lines(d)],
                                    metrics=("bbox",), ap_mode="11")
    r_fp = eval3d.evaluate_kitti_3d([_parse_lines(g)],
                                    [_parse_lines(d_fp)],
                                    metrics=("bbox",), ap_mode="11")
    assert (r_dc["Car"]["bbox"]["moderate"]
            > r_fp["Car"]["bbox"]["moderate"])


# --- analytic protocol goldens ----------------------------------------------
# Hand-computed AP/AOS values that pin the devkit protocol constants
# (41-point threshold grid, [::4] 11-point sampling, right-max envelope,
# DontCare discard, Van-neighbour ignore, AOS normalisation) to exact
# numbers — not just directions. Each scenario is small enough to trace
# by hand; the expected value derivations are in the comments.

_G1 = (0, 0, 100, 100)      # 100 px tall -> counted at every difficulty
_G2 = (200, 0, 300, 100)
_G3 = (400, 0, 500, 100)


def _eval_bbox(gt_lines, det_lines, mode):
    r = eval3d.evaluate_kitti_3d([_parse_lines(gt_lines)],
                                 [_parse_lines(det_lines)],
                                 metrics=("bbox",), ap_mode=mode)
    return r["Car"]


def test_analytic_two_tp_one_fp():
    """2 TPs (0.9, 0.8) + 1 FP (0.85): thresholds [0.9, 0.8];
    precision = [1, 2/3]; AP_11 = 100*(1/11) (only sample 0 of 0,4,..,40
    is nonzero), AP_40 = 100*(2/3)/40. Pins the threshold grid, the
    strict `score < t` cut (the 0.85 FP is inactive at t=0.9), and that
    11pt/R40 genuinely differ."""
    g = [_obj(bbox=_G1), _obj(bbox=_G2)]
    d = [_obj(bbox=_G1, score=0.9), _obj(bbox=_G2, score=0.8),
         _obj(bbox=_G3, score=0.85)]
    assert _eval_bbox(g, d, "11")["bbox"]["easy"] == pytest.approx(
        100.0 / 11.0, rel=1e-12)
    assert _eval_bbox(g, d, "40")["bbox"]["easy"] == pytest.approx(
        100.0 * (2.0 / 3.0) / 40.0, rel=1e-12)


def test_analytic_five_tp_pins_11pt_sampling():
    """5 TPs, no FP: thresholds at every score, precision 1 on slots 0-4,
    0 beyond. AP_11 samples slots [0,4,...,40] -> exactly two nonzero ->
    100*2/11; AP_40 = 100*4/40. A different 11-point stride or an
    off-by-one in the envelope changes both."""
    g = [_obj(bbox=(i * 200, 0, i * 200 + 100, 100)) for i in range(5)]
    d = [_obj(bbox=(i * 200, 0, i * 200 + 100, 100), score=0.9 - 0.1 * i)
         for i in range(5)]
    assert _eval_bbox(g, d, "11")["bbox"]["easy"] == pytest.approx(
        200.0 / 11.0, rel=1e-12)
    assert _eval_bbox(g, d, "40")["bbox"]["easy"] == pytest.approx(10.0,
                                                                   rel=1e-12)


def test_analytic_dontcare_discard_exact():
    """The 0.85 det sits exactly on a DontCare box (intersection/det-area
    = 1 > 0.7) -> removed from the FP count: precision [1, 1] instead of
    [1, 2/3] -> AP_40 = 100*1/40 = 2.5 exactly."""
    g = [_obj(bbox=_G1), _obj(bbox=_G2),
         _obj(type_="DontCare", bbox=_G3, dims=(-1, -1, -1),
              loc=(-1000, -1000, -1000), ry=-10, alpha=-10)]
    d = [_obj(bbox=_G1, score=0.9), _obj(bbox=_G2, score=0.8),
         _obj(bbox=_G3, score=0.85)]
    assert _eval_bbox(g, d, "40")["bbox"]["easy"] == pytest.approx(
        2.5, rel=1e-12)
    assert _eval_bbox(g, d, "11")["bbox"]["easy"] == pytest.approx(
        100.0 / 11.0, rel=1e-12)


def test_analytic_van_neighbour_ignore_exact():
    """A Car det matching a Van GT is absorbed (neither TP nor FP):
    AP_40 = 2.5 as if the det did not exist. Control: the same det on a
    Pedestrian GT (removed class for Car) counts as FP -> 100*(2/3)/40."""
    d = [_obj(bbox=_G1, score=0.9), _obj(bbox=_G2, score=0.8),
         _obj(bbox=_G3, score=0.85)]
    g_van = [_obj(bbox=_G1), _obj(bbox=_G2), _obj(type_="Van", bbox=_G3)]
    g_ped = [_obj(bbox=_G1), _obj(bbox=_G2),
             _obj(type_="Pedestrian", bbox=_G3)]
    assert _eval_bbox(g_van, d, "40")["bbox"]["easy"] == pytest.approx(
        2.5, rel=1e-12)
    assert _eval_bbox(g_ped, d, "40")["bbox"]["easy"] == pytest.approx(
        100.0 * (2.0 / 3.0) / 40.0, rel=1e-12)


def test_analytic_aos_exact():
    """2 TPs with alpha errors pi/2 (similarity 0.5) and pi (0.0):
    aos = [0.5/1, 0.5/2] -> after envelope [0.5, 0.25];
    AOS_11 = 100*0.5/11, AOS_40 = 100*0.25/40 = 0.625, while
    AP_40 = 2.5 (precision stays 1). Pins the (1+cos)/2 kernel and the
    tp+fp normalisation."""
    g = [_obj(bbox=_G1, alpha=0.0), _obj(bbox=_G2, alpha=0.0)]
    d = [_obj(bbox=_G1, score=0.9, alpha=-np.pi / 2),
         _obj(bbox=_G2, score=0.8, alpha=np.pi)]
    r11, r40 = _eval_bbox(g, d, "11"), _eval_bbox(g, d, "40")
    # rel 1e-4: _obj writes alpha with 4 decimals, so cos(pi/2) lands at
    # ~-3.7e-6 rather than 0
    assert r11["aos"]["easy"] == pytest.approx(100.0 * 0.5 / 11.0, rel=1e-4)
    assert r40["aos"]["easy"] == pytest.approx(0.625, rel=1e-4)
    assert r40["bbox"]["easy"] == pytest.approx(2.5, rel=1e-12)


def test_analytic_bev_3d_axis_convention():
    """ry=0 => length along camera x. A det shifted +0.5 m in x on a
    (h2, w2, l4) box has BEV IoU 7/9 > 0.7 (TP); +1.0 m gives 0.6 < 0.7
    (FP, AP 0). If width/length axes were swapped the 0.5 m shift would
    give 0.6 and the first assert fails. 3D: same footprint, det bottom
    face lifted 0.2 m -> vertical overlap 1.8/2 -> IoU 14.4/17.6 > 0.7
    (TP); lifted 0.8 m -> 9.6/22.4 < 0.7 (FP)."""
    def scene(dx=0.0, dy=0.0):
        g = [_obj(bbox=_G1, dims=(2, 2, 4), loc=(0, 1.65, 10), ry=0.0)]
        d = [_obj(bbox=_G1, dims=(2, 2, 4), loc=(dx, 1.65 - dy, 10),
                  ry=0.0, score=0.9)]
        return [_parse_lines(g)], [_parse_lines(d)]

    def ap(metric, dx=0.0, dy=0.0):
        gt, det = scene(dx, dy)
        r = eval3d.evaluate_kitti_3d(gt, det, metrics=(metric,),
                                     ap_mode="11")
        return r["Car"][metric]["easy"]

    one_tp = 100.0 / 11.0   # single threshold, precision 1 at slot 0
    assert ap("bev", dx=0.5) == pytest.approx(one_tp, rel=1e-12)
    assert ap("bev", dx=1.0) == 0.0
    assert ap("3d", dy=0.2) == pytest.approx(one_tp, rel=1e-12)
    assert ap("3d", dy=0.8) == 0.0


def test_get_thresholds_properties():
    scores = np.linspace(0.99, 0.01, 200)
    t = eval3d._get_thresholds(scores, 200)
    assert len(t) <= eval3d.N_SAMPLE_PTS
    assert np.all(np.diff(t) <= 0)
    assert t[0] == scores.max()


def test_cli_end_to_end(tmp_path):
    gt_dir, det_dir = tmp_path / "gt", tmp_path / "det"
    gt_dir.mkdir()
    det_dir.mkdir()
    g, d = _perfect_scene(n_gt=45)
    # split across 3 "images"; leave one det file missing
    for i in range(3):
        (gt_dir / f"{i:06d}.txt").write_text(
            "\n".join(g[i * 15:(i + 1) * 15]) + "\n")
        if i < 2:
            (det_dir / f"{i:06d}.txt").write_text(
                "\n".join(d[i * 15:(i + 1) * 15]) + "\n")
    from ground_plane_polling_tpu.bin.evaluate_3d import main
    res = main([str(gt_dir), str(det_dir), "--metrics", "bbox", "3d",
                "--json", str(tmp_path / "out.json")])
    assert set(res["Car"]) == {"bbox", "3d", "aos"}
    # 1/3 of GT undetected -> recall caps at ~2/3
    assert 30.0 < res["Car"]["bbox"]["moderate"] < 80.0
    assert (tmp_path / "out.json").exists()


def test_kitti_writer_output_feeds_evaluator(tmp_path):
    """write_kitti_file (the run-network output path) -> evaluate-3d:
    a detection written from a known pose must score AP 100 against a GT
    row built from the same pose."""
    from ground_plane_polling_tpu.utils.kitti_writer import write_kitti_file

    boxes = np.array([[100.0, 100.0, 220.0, 180.0]] * 45)
    boxes[:, [0, 2]] += 125 * np.arange(45)[:, None]
    scores = np.linspace(0.99, 0.55, 45)
    rng = np.random.default_rng(3)
    locations = np.stack([rng.uniform(-15, 15, 45),
                          np.full(45, 1.62),
                          rng.uniform(8, 50, 45)], axis=1)
    angles = np.stack([np.zeros(45), rng.uniform(-np.pi, np.pi, 45),
                       np.zeros(45)], axis=1)
    dimensions = np.tile([1.5, 1.7, 4.2], (45, 1))
    det_dir, gt_dir = tmp_path / "det", tmp_path / "gt"
    det_dir.mkdir()
    gt_dir.mkdir()
    write_kitti_file(det_dir / "000000.txt", boxes, scores, locations,
                     angles, dimensions, image_hw=(4000, 8000))
    det = eval3d.parse_label_file(str(det_dir / "000000.txt"))
    assert det["score"][0] == pytest.approx(0.99)
    # GT = the parsed det rows without scores (same 15 leading fields),
    # with trunc/occ zeroed (the writer emits -1 placeholders)
    lines = []
    for ln in (det_dir / "000000.txt").read_text().splitlines():
        p = ln.split()
        p[1], p[2] = "0.00", "0"
        lines.append(" ".join(p[:15]))
    (gt_dir / "000000.txt").write_text("\n".join(lines) + "\n")
    gt = eval3d.parse_label_file(str(gt_dir / "000000.txt"))
    res = eval3d.evaluate_kitti_3d([gt], [det],
                                   metrics=("bbox", "bev", "3d"))
    for metric in ("bbox", "bev", "3d", "aos"):
        assert res["Car"][metric]["moderate"] == pytest.approx(100.0), metric


def test_case_insensitive_classes():
    # the devkit compares types with strcasecmp: 'car'/'CAR' rows must
    # score identically to 'Car'
    g, d = _perfect_scene(n_gt=50)
    g_lower = [ln.replace("Car ", "car ", 1) for ln in g]
    d_upper = [ln.replace("Car ", "CAR ", 1) for ln in d]
    ref = eval3d.evaluate_kitti_3d([_parse_lines(g)], [_parse_lines(d)],
                                   metrics=("bbox",))
    mixed = eval3d.evaluate_kitti_3d([_parse_lines(g_lower)],
                                     [_parse_lines(d_upper)],
                                     metrics=("bbox",))
    assert (ref["Car"]["bbox"]["moderate"]
            == mixed["Car"]["bbox"]["moderate"] > 95.0)


def test_cli_json_is_valid_with_empty_buckets(tmp_path):
    # an empty difficulty bucket is NaN in-process but must serialize as
    # null (bare NaN is not valid JSON)
    gt_dir, det_dir = tmp_path / "gt", tmp_path / "det"
    gt_dir.mkdir()
    det_dir.mkdir()
    # height-30 GT: no valid easy bucket
    (gt_dir / "000000.txt").write_text(_obj(bbox=(100, 100, 140, 130))
                                       + "\n")
    (det_dir / "000000.txt").write_text(
        _obj(bbox=(100, 100, 140, 130), score=0.9) + "\n")
    from ground_plane_polling_tpu.bin.evaluate_3d import main
    out = tmp_path / "r.json"
    main([str(gt_dir), str(det_dir), "--metrics", "bbox",
          "--json", str(out)])
    import json
    # (json.loads itself tolerates bare NaN — the real guards are the
    # None value and the absence of the NaN token below)
    parsed = json.loads(out.read_text())
    assert parsed["Car"]["bbox"]["easy"] is None
    assert "NaN" not in out.read_text()


def test_kitti_writer_per_row_class_names(tmp_path):
    """Multi-class models: write_kitti_file accepts a per-detection name
    sequence (single string = reference single-class behaviour)."""
    from ground_plane_polling_tpu.utils.kitti_writer import write_kitti_file

    kw = dict(
        boxes=np.array([[10.0, 10, 60, 60], [100.0, 10, 150, 60]]),
        scores=np.array([0.9, 0.8]),
        locations=np.array([[0.0, 1.6, 12.0], [3.0, 1.6, 20.0]]),
        angles=np.zeros((2, 3)),
        dimensions=np.tile([1.5, 1.7, 4.2], (2, 1)),
        image_hw=(400, 1300),
    )
    p = tmp_path / "multi.txt"
    write_kitti_file(p, class_name=["Car", "Pedestrian"], **kw)
    types = [ln.split()[0] for ln in p.read_text().splitlines()]
    assert types == ["Car", "Pedestrian"]
    write_kitti_file(p, class_name="Car", **kw)
    assert [ln.split()[0] for ln in p.read_text().splitlines()] == \
        ["Car", "Car"]
    with pytest.raises(ValueError, match="sequence length"):
        write_kitti_file(p, class_name=["Car"], **kw)
