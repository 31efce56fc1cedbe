"""Parity test: Pallas polling kernel vs the jnp reference implementation
(interpret mode on CPU; compiled Mosaic on TPU)."""

import numpy as np
import pytest

from ground_plane_polling_tpu.kernels.polling_pallas import (
    fit_road_planes_pallas)
from ground_plane_polling_tpu.ops.polling import fit_road_planes

from .test_polling import P_INV, _boxes_from_kp, _scene


def _random_case(rng, b=2, d=16, p=40):
    """Plausible random detections + plane DB."""
    boxes = np.full((b, d, 12), -1.0, np.float32)
    dims = np.zeros((b, d, 3), np.float32)
    orients = rng.randint(0, 4, (b, d)).astype(np.int32)
    for bi in range(b):
        for di in range(d):
            h = rng.uniform(1.3, 1.8)
            w = rng.uniform(1.5, 2.0)
            l = rng.uniform(3.5, 4.8)
            kp2, _ = _scene(h, w, l,
                            y_ground=rng.uniform(1.4, 1.9),
                            depth=rng.uniform(8.0, 30.0))
            kp2 = kp2 + rng.normal(0, 2.0, 8)  # pixel noise
            boxes[bi, di, 4:] = kp2
            dims[bi, di] = (h, w, l)
    planes = np.stack([
        rng.uniform(-0.05, 0.05, p),
        np.ones(p),
        rng.uniform(-0.05, 0.05, p),
        rng.uniform(-2.2, -1.2, p),
    ], axis=1)
    P_inv = np.tile(P_INV[None], (b, 1, 1)).astype(np.float32)
    return (boxes, dims, orients, P_inv,
            np.tile(planes[None], (b, 1, 1)).astype(np.float32))


def test_pallas_matches_jnp(rng):
    args = _random_case(rng)
    ref = fit_road_planes(*args)
    got = fit_road_planes_pallas(*args)
    np.testing.assert_allclose(np.asarray(got.residuals),
                               np.asarray(ref.residuals), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.keyplanes),
                               np.asarray(ref.keyplanes), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.keypoints),
                               np.asarray(ref.keypoints), rtol=1e-3,
                               atol=1e-3)


@pytest.mark.parametrize("b", [4, 8])
def test_pallas_batch_parity(rng, b):
    """Parity holds at serving batch sizes (batch folded into the grid)."""
    args = _random_case(rng, b=b, d=12, p=40)
    ref = fit_road_planes(*args)
    got = fit_road_planes_pallas(*args)
    np.testing.assert_allclose(np.asarray(got.residuals),
                               np.asarray(ref.residuals), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.keyplanes),
                               np.asarray(ref.keyplanes), rtol=1e-5,
                               atol=1e-6)


def test_pallas_distinct_planes_per_batch_element(rng):
    """Each batch element must poll against ITS OWN plane database (the
    batch-folded grid indexes planes by the batch coordinate)."""
    boxes, dims, orients, P_inv, planes = _random_case(rng, b=2, d=8, p=24)
    # give element 1 a very different database
    planes = planes.copy()
    planes[1, :, 3] = planes[1, :, 3] * 3.0
    args = (boxes, dims, orients, P_inv, planes)
    ref = fit_road_planes(*args)
    got = fit_road_planes_pallas(*args)
    np.testing.assert_allclose(np.asarray(got.residuals),
                               np.asarray(ref.residuals), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.keyplanes),
                               np.asarray(ref.keyplanes), rtol=1e-5,
                               atol=1e-6)


def test_pallas_single_call_regardless_of_batch():
    """Program size must not grow with B: exactly one pallas_call in the
    jaxpr at any batch size (the old implementation unrolled B calls)."""
    import jax

    rng = np.random.RandomState(0)
    for b in (1, 8):
        args = _random_case(rng, b=b, d=8, p=24)
        jaxpr = jax.make_jaxpr(fit_road_planes_pallas.__wrapped__)(*args)
        n_calls = sum(1 for eqn in jaxpr.jaxpr.eqns
                      if eqn.primitive.name == "pallas_call")
        assert n_calls == 1, (b, n_calls)


def test_pallas_unpadded_sizes(rng):
    """Sizes that don't divide the tile shapes still work via padding."""
    args = _random_case(rng, b=1, d=5, p=13)
    ref = fit_road_planes(*args)
    got = fit_road_planes_pallas(*args)
    np.testing.assert_allclose(np.asarray(got.residuals),
                               np.asarray(ref.residuals), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.keyplanes),
                               np.asarray(ref.keyplanes), rtol=1e-5,
                               atol=1e-6)
