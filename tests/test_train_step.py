"""Train-step tests: loss decreases, clipnorm semantics, sharded DP step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ground_plane_polling_tpu.models import build_detector
from ground_plane_polling_tpu.ops import anchors as anchor_ops
from ground_plane_polling_tpu.parallel import data_parallel_mesh, shard_batch
from ground_plane_polling_tpu.training.train import (
    TrainState, clip_per_tensor_norm, create_train_state, make_optimizer,
    make_sharded_train_step, make_train_step)

IMG = (64, 64)


def _tiny_batch(batch=1):
    n = anchor_ops.num_anchors_for_shape(IMG)
    rng = np.random.RandomState(0)
    b = {
        "image": rng.uniform(-1, 1, (batch, *IMG, 3)).astype(np.float32),
        "labels": np.zeros((batch, n, 8), np.float32),
        "regression": np.zeros((batch, n, 13), np.float32),
        "regression_dim": np.zeros((batch, n, 4), np.float32),
    }
    b["labels"][:, :6, 1] = 1.0
    b["regression"][:, :6, :12] = 0.5
    b["regression"][:, :6, 12] = 1.0
    b["regression_dim"][:, :6, :3] = 0.3
    b["regression_dim"][:, :6, 3] = 1.0
    return b


def _tiny_raw_batch(batch=1):
    """Raw-layout batch (KittiLoader raw_batches=True) for the fused step."""
    rng = np.random.RandomState(0)
    n_ann, n_ign = 4, 2
    raw = {
        "key": np.asarray(jax.random.PRNGKey(3)),
        "images": rng.randint(0, 256, (batch, *IMG, 3)).astype(np.uint8),
        "annotations": np.zeros((batch, n_ann, 17), np.float32),
        "ann_mask": np.zeros((batch, n_ann), bool),
        "ignores": np.zeros((batch, n_ign, 4), np.float32),
        "ignore_mask": np.zeros((batch, n_ign), bool),
        "valid": np.ones((batch,), bool),
        "sizes": np.tile(np.asarray(IMG, np.float32), (batch, 1)),
    }
    raw["annotations"][:, 0, :4] = [8.0, 8.0, 40.0, 40.0]
    raw["annotations"][:, 0, 4:12] = [8, 40, 24, 40, 40, 40, 24, 8]
    raw["annotations"][:, 0, 12:15] = [1.5, 1.7, 4.2]
    raw["ann_mask"][:, 0] = True
    return raw


def test_loss_decreases_over_steps():
    model = build_detector("tiny")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *IMG, 3), jnp.float32))
    tx = make_optimizer()
    # gentle lr so the descent is monotone-ish
    state = create_train_state(variables, tx, learning_rate=2e-4)
    step = make_train_step(model, tx)
    batch = _tiny_batch()
    losses = []
    for _ in range(6):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    # SGD on a fresh random net is noisy; require clear net progress
    assert min(losses[-3:]) < losses[0]
    assert int(state.step) == 6


def test_clip_per_tensor_norm():
    tx = clip_per_tensor_norm(0.001)
    grads = {"a": jnp.ones(100) * 10.0, "b": jnp.full(4, 1e-6)}
    clipped, _ = tx.update(grads, tx.init(grads))
    # large tensor clipped to norm 0.001, small one untouched
    np.testing.assert_allclose(
        float(jnp.linalg.norm(clipped["a"])), 0.001, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(clipped["b"]), 1e-6, rtol=1e-5)


def test_freeze_backbone_zeroes_backbone_updates():
    model = build_detector("tiny")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *IMG, 3), jnp.float32))
    tx = make_optimizer(freeze_backbone=True)
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx)
    new_state, _ = step(state, _tiny_batch())
    # backbone params unchanged; at least one head param changed
    bb_before = jax.tree_util.tree_leaves(state.params["backbone"])
    # state was donated; rebuild from a fresh init for comparison
    variables2 = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, *IMG, 3), jnp.float32))
    bb_before = jax.tree_util.tree_leaves(variables2["params"]["backbone"])
    bb_after = jax.tree_util.tree_leaves(new_state.params["backbone"])
    for a, b in zip(bb_before, bb_after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    head_before = jax.tree_util.tree_leaves(variables2["params"]["regression"])
    head_after = jax.tree_util.tree_leaves(new_state.params["regression"])
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(head_before, head_after))


@pytest.mark.slow
def test_sharded_train_step_8_devices():
    assert jax.device_count() >= 8, "conftest must provide 8 cpu devices"
    model = build_detector("tiny")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *IMG, 3), jnp.float32))
    tx = make_optimizer()
    state = create_train_state(variables, tx)
    mesh = data_parallel_mesh(8)
    with mesh:
        batch = shard_batch(mesh, _tiny_batch(batch=8))
        step = make_sharded_train_step(model, tx, mesh)
        state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


@pytest.mark.slow
def test_sharded_matches_single_device():
    """DP over 8 devices must equal the single-device step on the same batch.

    Uses plain SGD (identity transform + lr scaling): Adam's step-1 update is
    ~lr*sign(g), so float reduction-order noise near g=0 flips signs and
    makes a bitwise comparison meaningless.
    """
    import optax

    model = build_detector("tiny")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *IMG, 3), jnp.float32))
    tx = optax.identity()
    batch = _tiny_batch(batch=8)

    s1 = create_train_state(variables, tx, learning_rate=1e-3)
    step1 = make_train_step(model, tx)
    s1, m1 = step1(s1, batch)

    variables2 = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, *IMG, 3), jnp.float32))
    s2 = create_train_state(variables2, tx, learning_rate=1e-3)
    mesh = data_parallel_mesh(8)
    with mesh:
        step8 = make_sharded_train_step(model, tx, mesh)
        s2, m8 = step8(s2, shard_batch(mesh, batch))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-6)


@pytest.mark.slow
def test_remat_gradients_match():
    """remat=True (jax.checkpoint on backbone blocks) must not change the
    computed gradients — only the memory/recompute schedule."""
    import optax

    from ground_plane_polling_tpu.training.train import compute_losses

    img = (64, 64)
    n_anchors = anchor_ops.num_anchors_for_shape(img)
    base = build_detector("resnet50")
    remat = build_detector("resnet50", remat=True)
    variables = base.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, *img, 3), jnp.float32))

    batch = {
        "image": np.random.RandomState(0).uniform(
            -1, 1, (1, *img, 3)).astype(np.float32),
        "labels": np.zeros((1, n_anchors, 8), np.float32),
        "regression": np.zeros((1, n_anchors, 13), np.float32),
        "regression_dim": np.zeros((1, n_anchors, 4), np.float32),
    }
    batch["labels"][:, :3, 2] = 1.0
    batch["regression"][:, :3, 12] = 1.0
    batch["regression_dim"][:, :3, 3] = 1.0

    def grads(model):
        def loss_fn(params):
            total, _ = compute_losses(model, params, variables["frozen"],
                                      batch)
            return total
        return jax.grad(loss_fn)(variables["params"])

    g1 = grads(base)
    g2 = grads(remat)
    flat1 = jax.tree_util.tree_leaves(g1)
    flat2 = jax.tree_util.tree_leaves(g2)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_fused_prepare_matches_two_stage(tmp_path):
    """make_fused_train_step (augment+targets fused into the step, one
    device dispatch) must match prepare-then-step exactly: same loader
    seed -> same PRNG key path -> identical batches -> identical update."""
    import optax

    from ground_plane_polling_tpu.data.kitti import KittiDataset
    from ground_plane_polling_tpu.data.pipeline import KittiLoader
    from ground_plane_polling_tpu.training.train import make_fused_train_step

    from .fixtures import make_synthetic_kitti

    root = make_synthetic_kitti(str(tmp_path / "kitti"))
    ds = KittiDataset(root, "train")
    mk = dict(batch_size=2, image_min_side=48, image_max_side=128,
              augment=True, shuffle=False)
    l_two = KittiLoader(ds, **mk)
    l_raw = KittiLoader(ds, raw_batches=True, **mk)
    shape = l_two.image_shape

    tx = optax.identity()

    def fresh_state():
        variables = build_detector("tiny").init(
            jax.random.PRNGKey(0), jnp.zeros((1, *shape, 3), jnp.float32))
        return create_train_state(variables, tx, learning_rate=1e-3)

    s_two = fresh_state()
    s_raw = fresh_state()
    step_two = make_train_step(model=build_detector("tiny"), tx=tx)
    step_raw = make_fused_train_step(build_detector("tiny"), tx,
                                     ds.num_classes, augment=True)

    n = 0
    for b_two, b_raw in zip(l_two.epoch(prefetch=0), l_raw.epoch(prefetch=0)):
        assert isinstance(b_raw, dict) and "images" in b_raw
        assert b_raw["images"].dtype == np.uint8
        s_two, m_two = step_two(s_two, b_two)
        s_raw, m_raw = step_raw(s_raw, b_raw)
        np.testing.assert_allclose(float(m_two["loss"]),
                                   float(m_raw["loss"]), rtol=1e-5)
        n += 1
    assert n >= 1
    for a, b in zip(jax.tree_util.tree_leaves(s_two.params),
                    jax.tree_util.tree_leaves(s_raw.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-7)
