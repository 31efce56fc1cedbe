"""The fixpoint NMS must match the serial greedy loop on every input."""

import jax.numpy as jnp
import numpy as np

from ground_plane_polling_tpu.ops.filtering import (
    _greedy_nms, _greedy_nms_serial)


def _serial(boxes, scores, max_out, thr):
    return _greedy_nms_serial(jnp.asarray(boxes), jnp.asarray(scores),
                              max_out, thr)


def _random_candidates(rng, k, crowded=False):
    n_clusters = 5 if crowded else k
    cx = rng.uniform(50, 400, n_clusters)
    cy = rng.uniform(50, 200, n_clusters)
    idx = rng.randint(0, n_clusters, k)
    x1 = cx[idx] + rng.uniform(-15, 15, k)
    y1 = cy[idx] + rng.uniform(-15, 15, k)
    w = rng.uniform(40, 90, k)
    h = rng.uniform(40, 90, k)
    boxes = np.stack([x1, y1, x1 + w, y1 + h], 1).astype(np.float32)
    scores = np.sort(rng.uniform(0.05, 1.0, k).astype(np.float32))[::-1]
    # some invalid tail candidates
    scores[-k // 8:] = -np.inf
    return boxes, scores.copy()


def _check(rng, k, max_out, crowded):
    boxes, scores = _random_candidates(rng, k, crowded)
    i1, v1, s1 = map(np.asarray, _greedy_nms(boxes, scores, max_out, 0.5))
    i2, v2, s2 = map(np.asarray,
                     _serial(boxes, scores, max_out, 0.5))
    assert (v1 == v2).all()
    np.testing.assert_array_equal(i1[v1], i2[v2])
    np.testing.assert_allclose(s1[v1], s2[v2], rtol=1e-6)


def test_sparse_candidates(rng):
    for _ in range(5):
        _check(rng, 128, 32, crowded=False)


def test_crowded_clusters(rng):
    """Deep suppression chains: many overlapping boxes per cluster."""
    for _ in range(5):
        _check(rng, 160, 40, crowded=True)


def test_all_invalid(rng):
    boxes = rng.uniform(0, 100, (16, 4)).astype(np.float32)
    scores = np.full(16, -np.inf, np.float32)
    idx, valid, score = map(np.asarray, _greedy_nms(boxes, scores, 8, 0.5))
    assert not valid.any()


def test_chain_suppression_exactness():
    """A suppresses B, B would suppress C: greedy keeps A and C."""
    boxes = np.array([
        [0, 0, 100, 100],     # A (best)
        [30, 0, 130, 100],    # B: IoU(A,B) ~ 0.54 -> suppressed by A
        [60, 0, 160, 100],    # C: IoU(A,C) ~ 0.25, IoU(B,C) ~ 0.54 -> kept
    ], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    idx, valid, _ = map(np.asarray, _greedy_nms(boxes, scores, 3, 0.5))
    assert valid.tolist() == [True, True, False]
    assert idx[:2].tolist() == [0, 2]
