"""int8 PTQ (models/quantize.py): interceptor correctness, calibration,
and the quantized end-to-end detect path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ground_plane_polling_tpu.models import build_detector
from ground_plane_polling_tpu.models import quantize as q


@pytest.fixture(scope="module")
def tiny():
    model = build_detector("tiny", num_classes=1, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, 48, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0)
    fn = lambda v, im: model.apply(v, im)
    return model, variables, fn


def _images(n=2, hw=(48, 64), seed=0):
    rng = np.random.RandomState(seed)
    return [jnp.asarray(rng.uniform(-128, 128, (1, *hw, 3)), jnp.float32)
            for _ in range(n)]


def test_interceptor_identity(tiny):
    """Intercepting with a pass-through callback reproduces the forward
    exactly — the evaluator itself adds no numerics."""
    _, variables, fn = tiny
    im = _images(1)[0]

    def passthrough(site, eqn, invals):
        return eqn.primitive.bind(*invals, **eqn.params)

    got = q._intercept(fn, passthrough)(variables, im)
    ref = fn(variables, im)
    for k in ref:
        np.testing.assert_array_equal(np.asarray(ref[k]), np.asarray(got[k]))


def test_calibration_counts_and_scales(tiny):
    _, variables, fn = tiny
    ims = _images(3)
    n = q.count_convs(fn, variables, ims[0])
    assert n > 0
    scales = q.collect_scales(fn, [(variables, im) for im in ims])
    assert scales.shape == (n,)
    assert (scales > 0).all()
    # running max: a superset of batches can only raise scales
    scales1 = q.collect_scales(fn, [(variables, ims[0])])
    assert (scales >= scales1 - 1e-12).all()


def test_percentile_calibration(tiny):
    """percentile=100 reproduces absmax exactly; lower percentiles can
    only tighten (never widen) each site's range, and the quantized
    forward under a mild clip stays within the absmax error bound."""
    _, variables, fn = tiny
    ims = _images(3)
    absmax = q.collect_scales(fn, [(variables, im) for im in ims])
    p100 = q.collect_scales(fn, [(variables, im) for im in ims],
                            percentile=100.0)
    np.testing.assert_array_equal(absmax, p100)
    p999 = q.collect_scales(fn, [(variables, im) for im in ims],
                            percentile=99.9)
    assert (p999 <= absmax + 1e-12).all()
    assert (p999 > 0).all()

    qfn = jax.jit(q.quantize_apply(fn, p999))
    ref = fn(variables, ims[0])
    got = qfn(variables, ims[0])
    for k in ref:
        r = np.asarray(ref[k], np.float32)
        g = np.asarray(got[k], np.float32)
        denom = max(float(np.abs(r).max()), 1e-6)
        # uniform random inputs have no outliers, so a 99.9% clip COSTS
        # accuracy here (~8%) — this bound checks mechanics, not benefit;
        # the benefit is measured on the real activation distribution
        # (docs/PERFORMANCE.md)
        assert np.abs(r - g).max() / denom < 0.15, k


def test_quantized_forward_close(tiny):
    """int8 trunk stays within a few percent of the bf16 forward."""
    _, variables, fn = tiny
    ims = _images(3)
    scales = q.collect_scales(fn, [(variables, im) for im in ims])
    qfn = jax.jit(q.quantize_apply(fn, scales))
    ref = fn(variables, ims[0])
    got = qfn(variables, ims[0])
    for k in ref:
        r = np.asarray(ref[k], np.float32)
        g = np.asarray(got[k], np.float32)
        denom = max(float(np.abs(r).max()), 1e-6)
        assert np.abs(r - g).max() / denom < 0.08, k


def test_quantized_detect_fn(tiny):
    """make_detect_fn(quant_scales=...) runs the full pipeline and yields
    detections consistent with the float path on a fresh-init model."""
    from ground_plane_polling_tpu.inference import make_detect_fn

    model, variables, fn = tiny
    ims = _images(2)
    scales = q.collect_scales(fn, [(variables, im) for im in ims])

    planes = jnp.asarray(
        np.tile(np.array([[0.0, 1.0, 0.0, -1.5]]), (16, 1))[None],
        jnp.float32)
    P = np.array([[700.0, 0, 32, 0], [0, 700.0, 24, 0], [0, 0, 1, 0]])
    P_inv = jnp.asarray(np.linalg.pinv(P)[None], jnp.float32)

    kw = dict(num_classes=1, with_pose=True, score_threshold=1e-4)
    f32_fn = make_detect_fn(model, (48, 64), **kw)
    q_fn = make_detect_fn(model, (48, 64), quant_scales=scales, **kw)

    ref = f32_fn(variables, ims[0], P_inv, planes)
    got = q_fn(variables, ims[0], P_inv, planes)
    assert np.asarray(got.scores).shape == np.asarray(ref.scores).shape
    # fresh init: every anchor scores the prior prob; both paths keep the
    # same count and near-identical scores
    n_ref = int((np.asarray(ref.scores) > -1).sum())
    n_got = int((np.asarray(got.scores) > -1).sum())
    assert n_got == n_ref
    np.testing.assert_allclose(np.asarray(got.scores),
                               np.asarray(ref.scores), atol=5e-3)


def test_detector_quantize_api(tiny):
    """GPPDetector.quantize switches the cached fns to int8."""
    from ground_plane_polling_tpu.inference import GPPDetector

    det = GPPDetector("tiny", num_classes=1, score_threshold=1e-4)
    det.init(jax.random.PRNGKey(0), (48, 64))
    ims = _images(1)
    planes = np.tile(np.array([[0.0, 1.0, 0.0, -1.5]]), (16, 1))
    P = np.array([[700.0, 0, 32, 0], [0, 700.0, 24, 0], [0, 0, 1, 0]])
    P_inv = jnp.asarray(np.linalg.pinv(P)[None], jnp.float32)

    out_f = det(ims[0], P_inv, jnp.asarray(planes[None], jnp.float32))
    scales = det.quantize(ims)
    assert det._fns == {}
    out_q = det(ims[0], P_inv, jnp.asarray(planes[None], jnp.float32))
    assert np.asarray(out_q.scores).shape == np.asarray(out_f.scores).shape
    assert scales.shape[0] == q.count_convs(
        lambda v, im: det.model.apply(v, im), det.variables, ims[0])

    # the documented way back to float — assigning .quant_scales = None —
    # must invalidate the compiled int8 fns (regression: the cache key
    # omits quant state, so a stale entry would silently serve int8)
    det.quant_scales = None
    assert det._fns == {}
    out_f2 = det(ims[0], P_inv, jnp.asarray(planes[None], jnp.float32))
    np.testing.assert_array_equal(np.asarray(out_f2.scores),
                                  np.asarray(out_f.scores))


def test_quantize_composes_with_fused_towers():
    """The jaxpr interceptor sees the block-diagonal fused cls+dim tower
    like any other conv graph: the quantized fused forward stays within
    the int8 error bound of the float fused forward (the combination
    GPP_BENCH_FUSE=1 + GPP_BENCH_INT8=1 serves; measured on-chip in
    docs/PERFORMANCE.md session K)."""
    from ground_plane_polling_tpu.models import fuse_detector_params

    base = build_detector("tiny", num_classes=1, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, 48, 64, 3), jnp.float32)
    variables = fuse_detector_params(base.init(jax.random.PRNGKey(0), x0))
    model = build_detector("tiny", num_classes=1, dtype=jnp.bfloat16,
                           fuse_cls_dim=True)
    fn = lambda v, im: model.apply(v, im)
    ims = _images(2)
    scales = q.collect_scales(fn, [(variables, im) for im in ims])
    qfn = jax.jit(q.quantize_apply(fn, scales))
    ref = fn(variables, ims[0])
    got = qfn(variables, ims[0])
    for k in ref:
        r = np.asarray(ref[k], np.float32)
        g = np.asarray(got[k], np.float32)
        denom = max(float(np.abs(r).max()), 1e-6)
        assert np.abs(r - g).max() / denom < 0.08, k
