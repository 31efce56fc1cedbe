"""Slow end-to-end learning validation (env-gated; ~8 min on CPU).

Overfits the tiny backbone on the 2-image synthetic fixture and checks the
evaluation sweep reports near-perfect AP on the training images — proving
target assignment, losses, gradients, decode, NMS, polling, and the
bucketed evaluator are mutually consistent.

Run with: GPP_RUN_SLOW=1 python -m pytest tests/test_overfit_slow.py -q
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("GPP_RUN_SLOW"),
    reason="slow end-to-end learning test; set GPP_RUN_SLOW=1")


def test_overfit_reaches_full_ap(tmp_path):
    import jax
    import jax.numpy as jnp

    from .fixtures import make_synthetic_kitti
    from ground_plane_polling_tpu.data.kitti import KittiDataset
    from ground_plane_polling_tpu.data.pipeline import KittiLoader
    from ground_plane_polling_tpu.models import build_detector
    from ground_plane_polling_tpu.training.loop import evaluate_model
    from ground_plane_polling_tpu.training.train import (
        create_train_state, make_optimizer, make_train_step)

    root = make_synthetic_kitti(str(tmp_path), n_images=3)
    ds = KittiDataset(root, "train")
    loader = KittiLoader(ds, batch_size=2, image_min_side=128,
                         image_max_side=448, pad_multiple=64, shuffle=False)
    model = build_detector("tiny")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *loader.image_shape, 3)))
    tx = make_optimizer()
    state = create_train_state(variables, tx, learning_rate=1e-3)
    step = make_train_step(model, tx)

    batch = next(iter(loader.epoch(prefetch=0)))
    for _ in range(150):
        state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))

    eval_loader = KittiLoader(ds, batch_size=1, image_min_side=128,
                              image_max_side=448, pad_multiple=64,
                              shuffle=False)
    mean_ap, errors, _ = evaluate_model(model, state, eval_loader,
                                        num_classes=1)
    assert mean_ap >= 0.99, mean_ap
    assert errors["height_error"] < 0.3
    assert errors["width_error"] < 0.3
    assert errors["length_error"] < 0.5
