"""Mesh-sharded inference/eval must match the single-device path exactly.

The reference's multi-GPU story covered training only
(/root/reference/keras_retinanet_3D/bin/train.py:100-104); batch-parallel
inference over a device mesh is the TPU-native extension. These tests run
on the 8-virtual-CPU-device mesh from conftest.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ground_plane_polling_tpu.inference import make_detect_fn
from ground_plane_polling_tpu.models import build_detector
from ground_plane_polling_tpu.parallel import data_parallel_mesh

from .fixtures import make_synthetic_kitti

IMG = (64, 64)
N_PLANES = 16


def _inputs(batch, rng):
    images = rng.uniform(-1, 1, (batch, *IMG, 3)).astype(np.float32)
    P = np.array([[720.0, 0.0, 620.0, 0.0],
                  [0.0, 720.0, 190.0, 0.0],
                  [0.0, 0.0, 1.0, 0.0]])
    P_inv = np.tile(np.linalg.pinv(P)[None], (batch, 1, 1)).astype(np.float32)
    planes = np.stack([
        rng.uniform(-0.05, 0.05, N_PLANES),
        np.ones(N_PLANES),
        rng.uniform(-0.05, 0.05, N_PLANES),
        rng.uniform(-2.5, -1.0, N_PLANES),
    ], axis=1)
    planes = np.tile(planes[None], (batch, 1, 1)).astype(np.float32)
    return images, P_inv, planes


@pytest.mark.slow
def test_sharded_detect_matches_single(rng):
    assert jax.device_count() >= 8
    model = build_detector("tiny")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *IMG, 3), jnp.float32))
    images, P_inv, planes = _inputs(8, rng)

    single = make_detect_fn(model, IMG, with_pose=True)
    sharded = make_detect_fn(model, IMG, with_pose=True,
                             mesh=data_parallel_mesh(8))

    a = single(variables, images, P_inv, planes)
    b = sharded(variables, images, P_inv, planes)

    np.testing.assert_array_equal(np.asarray(a.labels), np.asarray(b.labels))
    np.testing.assert_array_equal(np.asarray(a.orientations),
                                  np.asarray(b.orientations))
    for field in ("boxes", "dims", "scores", "keypoints", "residuals",
                  "locations", "angles"):
        np.testing.assert_allclose(
            np.asarray(getattr(a, field)), np.asarray(getattr(b, field)),
            rtol=1e-5, atol=1e-5, err_msg=field)


@pytest.mark.slow
def test_sharded_evaluate_matches_single(tmp_path):
    """evaluate_model(mesh=...) groups same-shape images into sharded
    batches (padding the short final group) and must reproduce the batch-1
    sweep bit-for-bit on the bucketed AP/error outputs."""
    from ground_plane_polling_tpu.data.kitti import KittiDataset
    from ground_plane_polling_tpu.data.pipeline import KittiLoader
    from ground_plane_polling_tpu.training.loop import evaluate_model
    from ground_plane_polling_tpu.training.train import (create_train_state,
                                                         make_optimizer)

    root = make_synthetic_kitti(str(tmp_path / "kitti"), n_images=6)
    ds = KittiDataset(root, "train")  # 5 images: one full group of 4 + 1
    loader = KittiLoader(ds, batch_size=1, image_min_side=128,
                         image_max_side=448, shuffle=False)

    model = build_detector("tiny", num_classes=ds.num_classes)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, *loader.image_shape, 3), jnp.float32))
    state = create_train_state(variables, make_optimizer())

    kwargs = dict(num_classes=ds.num_classes, score_threshold=0.0)
    ap1, err1, buckets1 = evaluate_model(model, state, loader, **kwargs)
    # mirror bin/evaluate.py --data-parallel: the variables tree is
    # committed replicated over the mesh BEFORE the sweep (one upload,
    # matching make_detect_fn's replicated in_sharding)
    from jax.sharding import NamedSharding, PartitionSpec

    mesh = data_parallel_mesh(4)
    placed = jax.device_put({"params": variables["params"],
                             "frozen": variables.get("frozen", {})},
                            NamedSharding(mesh, PartitionSpec()))
    state2 = state._replace(params=placed["params"], frozen=placed["frozen"])
    ap2, err2, buckets2 = evaluate_model(model, state2, loader,
                                         mesh=mesh, **kwargs)

    assert ap1 == pytest.approx(ap2, abs=1e-6)
    for k in err1:
        assert err1[k] == pytest.approx(err2[k], abs=1e-5)
    assert buckets1.keys() == buckets2.keys()
    for k in buckets1:
        assert buckets1[k][1] == buckets2[k][1]
        assert buckets1[k][0] == pytest.approx(buckets2[k][0], abs=1e-6)


@pytest.mark.slow
def test_spatial_sharded_detect_matches_single(rng):
    """shard_spatial: the image WIDTH is sharded over the mesh (GSPMD
    spatial partitioning of the conv trunk with automatic halo exchange)
    — single-image latency scaling with identical outputs."""
    assert jax.device_count() >= 8
    img = (64, 128)  # width divides the 8-device mesh
    model = build_detector("tiny")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *img, 3), jnp.float32))
    images = rng.uniform(-1, 1, (1, *img, 3)).astype(np.float32)
    P = np.array([[720.0, 0.0, 620.0, 0.0],
                  [0.0, 720.0, 190.0, 0.0],
                  [0.0, 0.0, 1.0, 0.0]])
    P_inv = np.linalg.pinv(P)[None].astype(np.float32)
    planes = np.stack([
        rng.uniform(-0.05, 0.05, N_PLANES),
        np.ones(N_PLANES),
        rng.uniform(-0.05, 0.05, N_PLANES),
        rng.uniform(-2.5, -1.0, N_PLANES),
    ], axis=1)[None].astype(np.float32)

    single = make_detect_fn(model, img, with_pose=True)
    spatial = make_detect_fn(model, img, with_pose=True,
                             mesh=data_parallel_mesh(8), shard_spatial=True)

    a = single(variables, images, P_inv, planes)
    b = spatial(variables, images, P_inv, planes)

    np.testing.assert_array_equal(np.asarray(a.labels), np.asarray(b.labels))
    np.testing.assert_array_equal(np.asarray(a.orientations),
                                  np.asarray(b.orientations))
    for field in ("boxes", "dims", "scores", "keypoints", "residuals",
                  "locations", "angles"):
        np.testing.assert_allclose(
            np.asarray(getattr(a, field)), np.asarray(getattr(b, field)),
            rtol=1e-4, atol=1e-4, err_msg=field)


@pytest.mark.slow
def test_pallas_polling_sharded_matches_jnp(rng):
    """Pallas polling under the mesh (interpret mode on CPU; compiled
    Mosaic on real chips) must match the jnp einsum-chain polling on the
    same sharded batch — the serving config at >=1024 planes. This is the
    slow-lane twin of dryrun_multichip's GPP_DRYRUN_FULL Pallas stage."""
    assert jax.device_count() >= 8
    model = build_detector("tiny")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *IMG, 3), jnp.float32))
    images, P_inv, planes = _inputs(8, rng)
    mesh = data_parallel_mesh(8)

    plain = make_detect_fn(model, IMG, with_pose=True, mesh=mesh)
    pallas = make_detect_fn(model, IMG, with_pose=True, mesh=mesh,
                            use_pallas_polling=True)

    a = plain(variables, images, P_inv, planes)
    b = pallas(variables, images, P_inv, planes)
    np.testing.assert_allclose(np.asarray(b.residuals),
                               np.asarray(a.residuals),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(a.orientations),
                                  np.asarray(b.orientations))


@pytest.mark.slow
def test_int8_ptq_sharded_matches_single(rng):
    """int8-PTQ inference (jaxpr-interceptor quantization,
    models/quantize.py) must compose with pjit sharding: sharded int8
    scores match single-device int8 scores exactly, and stay within the
    PTQ tolerance of the unquantized path. Slow-lane twin of
    dryrun_multichip's GPP_DRYRUN_FULL int8 stage."""
    from ground_plane_polling_tpu.models.quantize import collect_scales

    assert jax.device_count() >= 8
    model = build_detector("tiny")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *IMG, 3), jnp.float32))
    images, P_inv, planes = _inputs(8, rng)

    scales = collect_scales(lambda v, im: model.apply(v, im),
                            [(variables, jnp.asarray(images))],
                            percentile=99.9)
    single_q = make_detect_fn(model, IMG, with_pose=True,
                              quant_scales=scales)
    sharded_q = make_detect_fn(model, IMG, with_pose=True,
                               mesh=data_parallel_mesh(8),
                               quant_scales=scales)
    plain = make_detect_fn(model, IMG, with_pose=True)

    a = single_q(variables, images, P_inv, planes)
    b = sharded_q(variables, images, P_inv, planes)
    ref = plain(variables, images, P_inv, planes)
    np.testing.assert_allclose(np.asarray(a.scores), np.asarray(b.scores),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b.scores),
                               np.asarray(ref.scores), atol=0.05)


@pytest.mark.slow
def test_eval_batch_matches_batch1(tmp_path):
    """Single-device eval batching (eval_batch>1) must reproduce the
    batch-1 sweep exactly (same grouping/pad/mask machinery as the mesh
    path, no mesh)."""
    from ground_plane_polling_tpu.data.kitti import KittiDataset
    from ground_plane_polling_tpu.data.pipeline import KittiLoader
    from ground_plane_polling_tpu.training.loop import evaluate_model
    from ground_plane_polling_tpu.training.train import (create_train_state,
                                                         make_optimizer)
    from .fixtures import make_synthetic_kitti

    root = make_synthetic_kitti(str(tmp_path / "kitti"), n_images=6)
    ds = KittiDataset(root, "train")  # 5 images: one group of 3 + 2
    loader = KittiLoader(ds, batch_size=1, image_min_side=128,
                         image_max_side=448, shuffle=False)

    model = build_detector("tiny", num_classes=ds.num_classes)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, *loader.image_shape, 3), jnp.float32))
    state = create_train_state(variables, make_optimizer())

    kwargs = dict(num_classes=ds.num_classes, score_threshold=0.0)
    ap1, err1, buckets1 = evaluate_model(model, state, loader, **kwargs)
    ap3, err3, buckets3 = evaluate_model(model, state, loader,
                                         eval_batch=3, **kwargs)
    assert ap1 == pytest.approx(ap3, abs=1e-6)
    for k in err1:
        assert err1[k] == pytest.approx(err3[k], abs=1e-5)
    assert buckets1.keys() == buckets3.keys()
    for k in buckets1:  # per-bucket APs and counts, not just the mean
        assert buckets1[k][1] == buckets3[k][1]
        assert buckets1[k][0] == pytest.approx(buckets3[k][0], abs=1e-6)
