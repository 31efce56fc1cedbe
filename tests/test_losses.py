"""Golden tests for the three detection losses."""

import numpy as np

from ground_plane_polling_tpu.training import losses


def test_focal_hand_computed():
    # 1 batch, 3 anchors, C=1 (8 cols). anchor0 positive, anchor1 negative,
    # anchor2 ignored.
    labels = np.full((1, 3, 8), 0.0, np.float32)
    labels[0, 0, 2] = 1.0
    labels[0, 2, :] = -1.0
    probs = np.full((1, 3, 8), 0.3, np.float32)
    probs[0, 0, 2] = 0.9

    a, g = 0.25, 2.0
    total = 0.0
    # anchor0: col2 positive, 7 cols negative
    total += a * (1 - 0.9) ** g * -np.log(0.9)
    total += 7 * (1 - a) * 0.3**g * -np.log(0.7)
    # anchor1: 8 negative cols
    total += 8 * (1 - a) * 0.3**g * -np.log(0.7)
    # anchor2 ignored: nothing
    want = total / 1.0  # one positive anchor

    got = float(losses.focal(labels, probs))
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_focal_no_positives_normalizer_one():
    labels = np.zeros((1, 4, 8), np.float32)
    probs = np.full((1, 4, 8), 0.2, np.float32)
    want = 32 * 0.75 * 0.2**2 * -np.log(0.8)
    got = float(losses.focal(labels, probs))
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_smooth_l1_piecewise():
    sigma = 3.0
    s2 = sigma * sigma
    y_true = np.zeros((1, 2, 13), np.float32)
    y_true[0, 0, 12] = 1.0  # only anchor0 contributes
    y_true[0, 1, 12] = 0.0
    y_pred = np.zeros((1, 2, 12), np.float32)
    y_pred[0, 0, 0] = 0.05   # |x| < 1/9  -> quadratic
    y_pred[0, 0, 1] = 0.5    # |x| >= 1/9 -> linear
    y_pred[0, 1, :] = 99.0   # masked out

    want = (0.5 * s2 * 0.05**2 + (0.5 - 0.5 / s2)) / 1.0
    got = float(losses.smooth_l1(y_true, y_pred))
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_smooth_l1_all_masked_is_zero():
    y_true = np.zeros((1, 3, 13), np.float32)
    y_pred = np.ones((1, 3, 12), np.float32)
    assert float(losses.smooth_l1(y_true, y_pred)) == 0.0


def test_smooth_l1_dim_full_vs_height_only():
    s2 = 9.0
    # N=2 anchors, C=1
    y_true = np.zeros((1, 2, 4), np.float32)
    y_true[0, 0, 3] = 1.0
    y_pred = np.zeros((1, 2, 3), np.float32)
    y_pred[0, 0] = [0.05, 0.2, 0.3]

    full = float(losses.smooth_l1_dim(y_true, y_pred))
    want_full = (0.5 * s2 * 0.05**2 + (0.2 - 0.5 / s2) + (0.3 - 0.5 / s2))
    np.testing.assert_allclose(full, want_full, rtol=1e-5)

    # the reference-compat mode penalizes only the height component
    h_only = float(losses.smooth_l1_dim(y_true, y_pred, compat_height_only=True))
    np.testing.assert_allclose(h_only, 0.5 * s2 * 0.05**2, rtol=1e-5)


def test_dim_loss_multiclass_rows():
    # N=1 anchor, C=2: y_pred (1,1,6) reshapes to two per-class rows
    y_true = np.zeros((1, 2, 4), np.float32)
    y_true[0, 1, 3] = 1.0  # class-1 row positive
    y_true[0, 1, :3] = [0.0, 0.0, 0.0]
    y_pred = np.zeros((1, 1, 6), np.float32)
    y_pred[0, 0, 3:] = [0.05, 0.05, 0.05]  # class-1 triple
    got = float(losses.smooth_l1_dim(y_true, y_pred))
    np.testing.assert_allclose(got, 3 * 0.5 * 9.0 * 0.05**2, rtol=1e-5)
