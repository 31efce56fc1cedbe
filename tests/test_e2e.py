"""End-to-end tests: train a few steps on the synthetic fixture via the CLI
code paths, convert, run inference, inspect outputs."""

import json
import os

import numpy as np
import pytest

from .fixtures import make_synthetic_kitti


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    return make_synthetic_kitti(str(tmp_path_factory.mktemp("kitti_e2e")))


@pytest.fixture(scope="module")
def trained(kitti_root, tmp_path_factory):
    """Train the tiny backbone for 2 short epochs through bin.train.main."""
    out = tmp_path_factory.mktemp("train_out")
    from ground_plane_polling_tpu.bin.train import main

    state = main([
        "--backbone", "tiny",
        "--batch-size", "2",
        "--epochs", "2",
        "--steps", "2",
        "--image-min-side", "96",
        "--image-max-side", "320",
        "--snapshot-path", str(out / "snapshots"),
        "--log-path", str(out / "log.jsonl"),
        "--random-transform",
        "kitti", kitti_root,
    ])
    return kitti_root, str(out), state


def test_train_cli_produces_checkpoints_and_logs(trained):
    _, out, state = trained
    assert int(state.step) == 4
    snaps = os.listdir(os.path.join(out, "snapshots"))
    assert len(snaps) == 2
    with open(os.path.join(out, "log.jsonl")) as f:
        records = [json.loads(l) for l in f]
    assert len(records) == 2
    assert {"loss", "classification", "regression", "mAP"} <= set(records[0])


def test_convert_and_run_network(trained, tmp_path):
    kitti_root, out, _ = trained
    from ground_plane_polling_tpu.bin.convert_model import main as convert
    from ground_plane_polling_tpu.bin.run_network import main as run_net
    from ground_plane_polling_tpu.training.checkpoint import latest_checkpoint

    ckpt = latest_checkpoint(os.path.join(out, "snapshots"))
    weights = str(tmp_path / "model.npz")
    convert([ckpt, weights, "--backbone", "tiny"])
    assert os.path.exists(weights)
    cfg = json.load(open(weights + ".json"))
    assert cfg["backbone"] == "tiny" and cfg["nms"] is True

    out_dir = str(tmp_path / "results")
    run_net([
        weights,
        os.path.join(kitti_root, "val", "images"),
        os.path.join(kitti_root, "val", "calibs"),
        os.path.join(kitti_root, "road_planes_database.mat"),
        out_dir,
        "--kitti", "--save-images", "--no-bf16",
        # a 2-epoch tiny model's top scores hover around the 0.05
        # default; the devkit-loop check below needs at least one
        # written row, so keep every detection the filter emits
        "--score-threshold", "0.0",
    ])
    root = os.path.join(out_dir, "model")
    full = os.listdir(os.path.join(root, "outputs", "full"))
    assert len(full) == 1 and full[0].endswith(".mat")
    kitti_out = os.listdir(os.path.join(root, "outputs", "kitti"))
    assert len(kitti_out) == 1
    # composite image written and stacked 2x height
    comps = os.listdir(os.path.join(root, "images", "composite"))
    assert len(comps) == 1
    import scipy.io

    mat = scipy.io.loadmat(
        os.path.join(root, "outputs", "full", full[0]))
    for key in ["boxes", "keypoints", "scores", "locations", "angles",
                "dimensions", "residuals"]:
        assert key in mat

    # close the devkit loop: the KITTI txt output must evaluate under the
    # official-metric CLI (gpp-tpu-evaluate-3d) against the raw GT labels
    # — format + protocol compatibility with REAL network output (the
    # reference's users run the external C++ devkit on these same files)
    from ground_plane_polling_tpu.bin.evaluate_3d import main as eval3d_cli

    det_dir = os.path.join(root, "outputs", "kitti")
    gt_dir = str(tmp_path / "gt3d")
    os.makedirs(gt_dir)
    import shutil

    for f in kitti_out:
        src = os.path.join(kitti_root, "_raw_labels", f)
        assert os.path.exists(src), f"no raw GT for output {f}"
        shutil.copy(src, os.path.join(gt_dir, f))
    # the det file must actually parse to rows and the GT must gate in
    # (the fixture Car is 130 px tall, occ 0, trunc 0 -> valid at every
    # difficulty), so bbox APs are real numbers — an all-NaN result
    # would mean the writer/evaluator format contract broke
    from ground_plane_polling_tpu.utils.eval3d import parse_label_file

    det_rows = parse_label_file(os.path.join(det_dir, kitti_out[0]))
    assert len(det_rows["type"]) > 0
    res = eval3d_cli([gt_dir, det_dir, "--ap-mode", "11"])
    for metric in ("bbox", "bev", "3d", "aos"):
        for diff, v in res["Car"][metric].items():
            assert np.isnan(v) or 0.0 <= v <= 100.0, (metric, diff, v)
    assert not np.isnan(res["Car"]["bbox"]["moderate"])


def test_evaluate_cli(trained, tmp_path):
    kitti_root, out, _ = trained
    from ground_plane_polling_tpu.bin.convert_model import main as convert
    from ground_plane_polling_tpu.bin.evaluate import main as evaluate
    from ground_plane_polling_tpu.training.checkpoint import latest_checkpoint

    ckpt = latest_checkpoint(os.path.join(out, "snapshots"))
    weights = str(tmp_path / "m.npz")
    convert([ckpt, weights, "--backbone", "tiny"])
    mean_ap, errors = evaluate([
        weights, kitti_root, "--subset", "val",
        "--image-min-side", "96", "--image-max-side", "320",
    ])
    assert 0.0 <= mean_ap <= 1.0
    assert set(errors) == {"keypoint_error", "height_error", "width_error",
                           "length_error"}


def test_evaluate_cli_int8(trained, tmp_path):
    """--int8 N --int8-percentile Q through the real CLI: calibrates on
    the first N val images, runs the conv trunk int8, returns sane
    metrics (accuracy parity with float is measured on-chip —
    docs/PERFORMANCE.md sessions I/J — not asserted on a tiny model).
    Tiny eval resolution: XLA CPU has no vectorized int8-conv path, so
    this runs ~10x slower per pixel than the float evals."""
    kitti_root, out, _ = trained
    from ground_plane_polling_tpu.bin.convert_model import main as convert
    from ground_plane_polling_tpu.bin.evaluate import main as evaluate
    from ground_plane_polling_tpu.training.checkpoint import latest_checkpoint

    ckpt = latest_checkpoint(os.path.join(out, "snapshots"))
    weights = str(tmp_path / "mq.npz")
    convert([ckpt, weights, "--backbone", "tiny"])
    mean_ap, errors = evaluate([
        weights, kitti_root, "--subset", "val",
        "--image-min-side", "32", "--image-max-side", "96",
        "--int8", "2", "--int8-percentile", "99.9",
    ])
    assert 0.0 <= mean_ap <= 1.0
    assert all(np.isfinite(v) for v in errors.values())


@pytest.mark.slow
def test_evaluate_cli_fuse_towers_identical(trained, tmp_path):
    """--fuse-towers must reproduce the eval metrics exactly."""
    kitti_root, out, _ = trained
    from ground_plane_polling_tpu.bin.convert_model import main as convert
    from ground_plane_polling_tpu.bin.evaluate import main as evaluate
    from ground_plane_polling_tpu.training.checkpoint import latest_checkpoint

    ckpt = latest_checkpoint(os.path.join(out, "snapshots"))
    weights = str(tmp_path / "mf.npz")
    convert([ckpt, weights, "--backbone", "tiny"])
    base_ap, base_errors = evaluate([
        weights, kitti_root, "--subset", "val",
        "--image-min-side", "96", "--image-max-side", "320",
    ])
    fused_ap, fused_errors = evaluate([
        weights, kitti_root, "--subset", "val",
        "--image-min-side", "96", "--image-max-side", "320",
        "--fuse-towers",
    ])
    assert fused_ap == pytest.approx(base_ap, abs=1e-6)
    for k in base_errors:
        assert fused_errors[k] == pytest.approx(base_errors[k], abs=1e-4)


def test_debug_cli(trained, tmp_path):
    kitti_root, _, _ = trained
    from ground_plane_polling_tpu.bin.debug import main as debug

    out = str(tmp_path / "dbg")
    debug(["--out", out, "--limit", "1", "--anchors", "kitti", kitti_root])
    files = os.listdir(out)
    assert len(files) == 1 and files[0].endswith(".png")


@pytest.mark.slow
def test_train_cli_data_parallel(kitti_root, tmp_path):
    """--data-parallel over the 8 virtual CPU devices through the CLI."""
    import jax

    assert jax.device_count() >= 8
    from ground_plane_polling_tpu.bin.train import main

    state = main([
        "--backbone", "tiny",
        "--batch-size", "8",
        "--epochs", "1",
        "--steps", "1",
        "--image-min-side", "96",
        "--image-max-side", "320",
        "--no-snapshots",
        "--no-evaluation",
        "--data-parallel",
        "--log-path", str(tmp_path / "log.jsonl"),
        "kitti", kitti_root,
    ])
    assert int(state.step) == 1


def test_prepare_data_cli(tmp_path):
    """Exercise label-prep + split end-to-end with a fabricated devkit."""
    from ground_plane_polling_tpu.bin.prepare_data import main as prep
    from .fixtures import P2, _calib_text, _raw_label

    raw = tmp_path / "raw"
    for d in ["label_2", "calib", "image_2", "devkit/mapping"]:
        os.makedirs(raw / d, exist_ok=True)

    from PIL import Image

    n = 4
    mapping_lines = []
    rand = []
    for i in range(n):
        name = f"{i:06d}"
        with open(raw / "label_2" / f"{name}.txt", "w") as f:
            f.write(_raw_label("Car", 0.4, (10, 10, 100, 100),
                               (1.5, 1.7, 4.2), (0.0, 1.65, 10.0), 0.5) + "\n")
        with open(raw / "calib" / f"{name}.txt", "w") as f:
            f.write(_calib_text())
        Image.new("RGB", (64, 32)).save(raw / "image_2" / f"{name}.png")
        # two drives: 0001 (val: 09_26 id<=15) and 0093 (train)
        drive = "0001" if i % 2 == 0 else "0093"
        mapping_lines.append(f"2011_09_26 2011_09_26_drive_{drive}_sync "
                             f"{i:010d}")
        rand.append(str(i + 1))
    with open(raw / "devkit/mapping/train_mapping.txt", "w") as f:
        f.write("\n".join(mapping_lines) + "\n")
    with open(raw / "devkit/mapping/train_rand.txt", "w") as f:
        f.write(",".join(rand))

    out = str(tmp_path / "prepared")
    prep(["--label-dir", str(raw / "label_2"),
          "--calib-dir", str(raw / "calib"),
          "--image-dir", str(raw / "image_2"),
          "--devkit-dir", str(raw / "devkit"),
          "--output-dir", out])
    assert len(os.listdir(os.path.join(out, "val", "images"))) == 2
    assert len(os.listdir(os.path.join(out, "train", "images"))) == 2
    # labels are 20-field modified labels
    lab_dir = os.path.join(out, "train", "labels")
    row = open(os.path.join(lab_dir, os.listdir(lab_dir)[0])).readline()
    assert len(row.split()) == 20


def test_serve_cli(trained, tmp_path):
    """Micro-batching serve CLI: --once over the val split, fixed batch
    with repeat-padding, one KITTI txt per real image."""
    kitti_root, out, _ = trained
    from ground_plane_polling_tpu.bin.convert_model import main as convert
    from ground_plane_polling_tpu.bin.serve import main as serve

    snaps = os.path.join(out, "snapshots")
    latest = sorted(os.listdir(snaps))[-1]
    model_out = str(tmp_path / "serve_model.npz")
    convert([os.path.join(snaps, latest), model_out, "--backbone", "tiny"])

    out_dir = str(tmp_path / "served")
    n = serve([
        model_out,
        os.path.join(kitti_root, "val", "images"),
        os.path.join(kitti_root, "val", "calibs"),
        os.path.join(kitti_root, "road_planes_database.mat"),
        out_dir, "--batch-size", "2", "--once", "--no-bf16",
    ])
    stems = [f.rsplit(".", 1)[0]
             for f in os.listdir(os.path.join(kitti_root, "val", "images"))]
    assert n == len(stems)
    for stem in stems:
        assert os.path.exists(os.path.join(out_dir, stem + ".txt"))


def test_serve_once_drains_backlog_beyond_intake_cap(trained, tmp_path):
    """A pre-existing backlog larger than the per-round intake cap must
    fully drain under --once (the cap bounds per-round HBM staging, not
    the total; a capped first round must not be the last)."""
    import shutil

    kitti_root, out, _ = trained
    from ground_plane_polling_tpu.bin.convert_model import main as convert
    from ground_plane_polling_tpu.bin.serve import _intake_cap
    from ground_plane_polling_tpu.bin.serve import main as serve

    snaps = os.path.join(out, "snapshots")
    latest = sorted(os.listdir(snaps))[-1]
    model_out = str(tmp_path / "serve_model.npz")
    convert([os.path.join(snaps, latest), model_out, "--backbone", "tiny"])

    # replicate the 2 val images into a 6-stem backlog > cap(batch=1)=4
    src_img = os.path.join(kitti_root, "val", "images")
    src_cal = os.path.join(kitti_root, "val", "calibs")
    img_dir, cal_dir = tmp_path / "backlog_img", tmp_path / "backlog_cal"
    img_dir.mkdir(), cal_dir.mkdir()
    srcs = sorted(os.listdir(src_img))
    n_backlog = 6
    assert n_backlog > _intake_cap(1, 0)
    for i in range(n_backlog):
        src = srcs[i % len(srcs)]
        ext = src.rsplit(".", 1)[1]
        stem = f"{i:06d}"
        shutil.copy(os.path.join(src_img, src), img_dir / f"{stem}.{ext}")
        shutil.copy(os.path.join(src_cal, src.rsplit(".", 1)[0] + ".txt"),
                    cal_dir / f"{stem}.txt")

    out_dir = str(tmp_path / "served_backlog")
    n = serve([
        model_out, str(img_dir), str(cal_dir),
        os.path.join(kitti_root, "road_planes_database.mat"),
        out_dir, "--batch-size", "1", "--once", "--no-bf16",
        "--poll-interval", "0",
    ])
    assert n == n_backlog
    for i in range(n_backlog):
        assert os.path.exists(os.path.join(out_dir, f"{i:06d}.txt"))


@pytest.mark.slow
def test_run_network_fuse_towers_identical(trained, tmp_path):
    """--fuse-towers (block-diagonal cls+dim tower) produces identical
    KITTI-format detections through the real CLI."""
    kitti_root, out, _ = trained
    from ground_plane_polling_tpu.bin.convert_model import main as convert
    from ground_plane_polling_tpu.bin.run_network import main as run_net
    from ground_plane_polling_tpu.training.checkpoint import latest_checkpoint

    ckpt = latest_checkpoint(os.path.join(out, "snapshots"))
    weights = str(tmp_path / "model.npz")
    convert([ckpt, weights, "--backbone", "tiny"])

    outputs = {}
    for name, extra in (("plain", []), ("fused", ["--fuse-towers"])):
        out_dir = str(tmp_path / f"results_{name}")
        run_net([
            weights,
            os.path.join(kitti_root, "val", "images"),
            os.path.join(kitti_root, "val", "calibs"),
            os.path.join(kitti_root, "road_planes_database.mat"),
            out_dir, "--kitti", "--no-bf16", *extra,
        ])
        kdir = os.path.join(out_dir, "model", "outputs", "kitti")
        (fn,) = os.listdir(kdir)
        outputs[name] = open(os.path.join(kdir, fn)).read()

    # numeric comparison with tolerance (the fusion is exact math but conv
    # reduction order may differ by ulps across XLA versions; same policy
    # as the module-level equality tests)
    import numpy as np
    rows_a = [r.split() for r in outputs["plain"].strip().splitlines()]
    rows_b = [r.split() for r in outputs["fused"].strip().splitlines()]
    assert len(rows_a) == len(rows_b)
    for ra, rb in zip(rows_a, rows_b):
        assert ra[0] == rb[0]  # class name
        np.testing.assert_allclose(np.array(ra[1:], float),
                                   np.array(rb[1:], float),
                                   rtol=1e-4, atol=1e-4)


def test_convert_model_sidecar_from_weights(tmp_path):
    """convert-model must describe the WEIGHTS in the output sidecar:
    input-sidecar backbone propagates and num_classes is inferred from
    the classification head width, not CLI defaults."""
    import jax
    import jax.numpy as jnp

    from ground_plane_polling_tpu.bin.convert_model import main as convert
    from ground_plane_polling_tpu.models import build_detector
    from ground_plane_polling_tpu.training.checkpoint import export_params

    model = build_detector("tiny", num_classes=2)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 96, 3), jnp.float32))
    src = str(tmp_path / "src.npz")
    export_params(src, variables)
    with open(src + ".json", "w") as f:
        json.dump({"backbone": "tiny", "num_classes": 2}, f)

    dst = str(tmp_path / "dst.npz")
    convert([src, dst])                       # no --backbone/--num-classes
    cfg = json.load(open(dst + ".json"))
    assert cfg["backbone"] == "tiny"
    assert cfg["num_classes"] == 2

    with pytest.raises(ValueError, match="contradicts"):
        convert([src, str(tmp_path / "bad.npz"), "--num-classes", "3"])

    # the serving-filter config survives reconversion too (a no-NMS
    # export must not silently regain NMS from CLI defaults), and an
    # explicit flag still wins; a STALE sidecar num_classes loses to the
    # weights-inferred value
    with open(src + ".json", "w") as f:
        json.dump({"backbone": "tiny", "num_classes": 1,   # stale (is 2)
                   "nms": False,
                   "orientation_specific_filter": True}, f)
    dst2 = str(tmp_path / "dst2.npz")
    convert([src, dst2])
    cfg2 = json.load(open(dst2 + ".json"))
    assert cfg2["nms"] is False
    assert cfg2["orientation_specific_filter"] is True
    assert cfg2["num_classes"] == 2            # weights outrank sidecar
    dst3 = str(tmp_path / "dst3.npz")
    convert([src, dst3, "--nms"])
    assert json.load(open(dst3 + ".json"))["nms"] is True


@pytest.mark.slow
def test_train_cli_data_parallel_fused(kitti_root, tmp_path):
    """bin.train --data-parallel on the 8-device CPU mesh, with the fused
    default: exercises the CLI's make_global_raw_batch placement + the
    sharded fused step end-to-end (the library-level equivalents are
    covered by dryrun_multichip and test_distributed)."""
    import jax

    if jax.device_count() < 2:
        pytest.skip("needs the multi-device CPU env (conftest)")
    from ground_plane_polling_tpu.bin.train import main

    out = tmp_path / "dp_out"
    out.mkdir()
    state = main([
        "--backbone", "tiny",
        "--batch-size", str(jax.device_count()),
        "--epochs", "1",
        "--steps", "2",
        "--image-min-side", "96",
        "--image-max-side", "320",
        "--data-parallel",
        "--no-evaluation",
        "--snapshot-path", str(out / "snapshots"),
        "--log-path", str(out / "log.jsonl"),
        "--random-transform",
        "kitti", kitti_root,
    ])
    assert int(state.step) == 2
    records = [json.loads(l) for l in open(out / "log.jsonl")]
    assert np.isfinite(records[-1]["loss"])


def test_run_network_batched_identical(trained, tmp_path):
    """run-network --batch N writes per-image outputs identical to --batch 1
    (shape-bucketed grouping + remainder padding must not leak across rows).
    Reference analog of the batched loop: the strictly per-image loop at
    /root/reference/keras_retinanet_3D/bin/run_network.py:90-135.

    Labels must be BIT-equal across batch sizes; scores to one float32 ulp
    (batched-conv reduction order reaches the sigmoid). Boxes/keypoints at
    2e-3 px are the row-mixup guard (distinct frames differ by pixels). On
    this fixture every detection is a disqualified near-horizon noise hit
    (untrained model), where back-projection amplifies the ulp noise to
    ~0.1 m — and some rays land km-scale — so 3D fields use
    conditioning-aware atol+rtol still far below the spread between
    distinct rows (a mixup still fails)."""
    import shutil

    from PIL import Image

    kitti_root, out, _ = trained
    from ground_plane_polling_tpu.bin.convert_model import main as convert
    from ground_plane_polling_tpu.bin.run_network import main as run_net
    from ground_plane_polling_tpu.training.checkpoint import latest_checkpoint

    ckpt = latest_checkpoint(os.path.join(out, "snapshots"))
    weights = str(tmp_path / "model.npz")
    convert([ckpt, weights, "--backbone", "tiny"])

    # three DISTINCT frames (so cross-row contamination would show) sharing
    # one calib: the fixture val image plus two pixel-permuted copies
    img_src_dir = os.path.join(kitti_root, "val", "images")
    (src_name,) = os.listdir(img_src_dir)
    arr = np.asarray(Image.open(os.path.join(img_src_dir, src_name)))
    calib_src = os.path.join(kitti_root, "val", "calibs",
                             src_name.rsplit(".", 1)[0] + ".txt")
    img_dir = tmp_path / "images"
    cal_dir = tmp_path / "calibs"
    img_dir.mkdir()
    cal_dir.mkdir()
    for i, a in enumerate([arr, np.roll(arr, 7, axis=1), arr[::-1]]):
        Image.fromarray(np.ascontiguousarray(a)).save(
            img_dir / f"{i:06d}.png")
        shutil.copy(calib_src, cal_dir / f"{i:06d}.txt")

    import scipy.io

    mats = {}
    for b in (1, 2, 4):  # b2: full pair + padded remainder; b4: all padded
        odir = str(tmp_path / f"res_b{b}")
        run_net([
            weights, str(img_dir), str(cal_dir),
            os.path.join(kitti_root, "road_planes_database.mat"),
            odir, "--kitti", "--no-bf16",
            "--image-min-side", "96", "--image-max-side", "320",
            "--score-threshold", "0.0", "--batch", str(b),
        ])
        mdir = os.path.join(odir, "model", "outputs", "full")
        kdir = os.path.join(odir, "model", "outputs", "kitti")
        assert sorted(os.listdir(kdir)) == [f"{i:06d}.txt" for i in range(3)]
        mats[b] = {fn: scipy.io.loadmat(os.path.join(mdir, fn))
                   for fn in sorted(os.listdir(mdir))}

    # threaded host prep is a pure host-side reordering: same batch size
    # must give BIT-identical outputs to the serial prep path
    odir_t = str(tmp_path / "res_b2_threads")
    run_net([
        weights, str(img_dir), str(cal_dir),
        os.path.join(kitti_root, "road_planes_database.mat"),
        odir_t, "--kitti", "--no-bf16",
        "--image-min-side", "96", "--image-max-side", "320",
        "--score-threshold", "0.0", "--batch", "2", "--prep-threads", "3",
    ])
    mdir_t = os.path.join(odir_t, "model", "outputs", "full")
    for fn, m2 in mats[2].items():
        mt = scipy.io.loadmat(os.path.join(mdir_t, fn))
        for key in ("scores", "labels", "boxes", "keypoints", "locations",
                    "angles", "dimensions", "residuals"):
            np.testing.assert_array_equal(m2[key], mt[key],
                                          err_msg=f"threads {fn} {key}")

    assert set(mats[1]) == set(mats[2]) == set(mats[4])
    assert len(mats[1]) == 3
    # the three frames genuinely differ (otherwise row mixups are invisible)
    sigs = [tuple(np.round(m["scores"].ravel()[:5], 6))
            for m in mats[1].values()]
    assert len(set(sigs)) == 3
    for b in (2, 4):
        for fn, m1 in mats[1].items():
            mb = mats[b][fn]
            np.testing.assert_allclose(m1["scores"], mb["scores"],
                                       atol=1e-6, rtol=0,
                                       err_msg=f"b{b} {fn} scores")
            np.testing.assert_array_equal(m1["labels"], mb["labels"],
                                          err_msg=f"b{b} {fn} labels")
            # angles/3D carry the amplified noise (distinct rows differ by
            # ~radians / ~meters, so these still catch any mixup); rtol
            # covers near-horizon rays that back-project to km-scale points
            for key, atol, rtol in (("boxes", 2e-3, 0), ("keypoints", 2e-3, 0),
                                    ("residuals", 1e-3, 0),
                                    ("angles", 2e-2, 0),
                                    ("keypoints3d", 0.5, 2e-3),
                                    ("locations", 0.5, 2e-3),
                                    ("dimensions", 0.5, 2e-3)):
                np.testing.assert_allclose(
                    m1[key], mb[key], atol=atol, rtol=rtol,
                    err_msg=f"b{b} {fn} {key}")
