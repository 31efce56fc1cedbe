"""Post-training int8 quantization (PTQ) for serving.

TPU v5e MXU throughput doubles in int8 (measured on this chip:
~144-175 TFLOP/s bf16 vs ~312-530 TOP/s int8 for the ResNet-shaped 3x3
convs, docs/PERFORMANCE.md), so the conv trunk — backbone + FPN + head
towers, which is where the forward's FLOPs live — can run int8 x int8 ->
int32 with float dequantization fused behind each conv.

Mechanically this is a jaxpr interceptor, not a model rewrite: the flax
forward is traced once, and every `conv_general_dilated` equation is
replaced by

    quantize(x; s_x)  ->  int8 conv  ->  y_int32 * (s_x * s_w[c])

with per-tensor activation scales `s_x` from calibration (absmax over
calibration batches, recorded per conv SITE — head convs shared across
FPN levels get one scale per level) and per-output-channel symmetric
weight scales `s_w` computed at trace time. Everything else in the graph
(bias adds, relus, BN folds, the detection pipeline) is untouched and
still runs in the model dtype, so the transform composes with jit / pjit
/ sharding like any other function.

No reference analog: the reference serves f32 Keras (run_network.py);
this is a TPU-native serving extension. Accuracy cost is measured, not
assumed — see tests/test_quantize.py and docs/PERFORMANCE.md.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

try:  # jax >= 0.4.33 moved Literal to jax.extend.core
    from jax.extend.core import Literal
except ImportError:  # pragma: no cover
    from jax.core import Literal

__all__ = ["count_convs", "make_calibration_fn", "collect_scales",
           "collect_scales_uint8", "quantize_apply"]

_EPS = 1e-8


def _sub_jaxprs(eqn):
    """(closed_jaxpr, ...) for primitives that carry one, else ()."""
    name = eqn.primitive.name
    if name in ("pjit", "closed_call"):
        return (eqn.params["jaxpr"],)
    if name == "custom_jvp_call":
        return (eqn.params["call_jaxpr"],)
    if name == "custom_vjp_call_jaxpr":
        return (eqn.params["fun_jaxpr"],)
    if name == "remat2" or name == "checkpoint":
        import jax.core as _core

        return (_core.ClosedJaxpr(eqn.params["jaxpr"], ()),)
    return ()


def _eval_jaxpr(jaxpr, consts, args, conv_cb, counter):
    """Evaluate `jaxpr`, dispatching each conv_general_dilated equation to
    `conv_cb(site_index, eqn, invals)`; recurses into sub-jaxprs so convs
    under custom_jvp/pjit wrappers are still intercepted."""
    env = {}

    def read(v):
        return v.val if isinstance(v, Literal) else env[v]

    def write(v, val):
        env[v] = val

    for v, c in zip(jaxpr.constvars, consts):
        write(v, c)
    for v, a in zip(jaxpr.invars, args):
        write(v, a)

    for eqn in jaxpr.eqns:
        invals = [read(v) for v in eqn.invars]
        if eqn.primitive.name == "conv_general_dilated":
            site = counter[0]
            counter[0] += 1
            outs = [conv_cb(site, eqn, invals)]
        else:
            subs = _sub_jaxprs(eqn)
            if subs:
                (sub,) = subs
                outs = _eval_jaxpr(sub.jaxpr, sub.consts, invals, conv_cb,
                                   counter)
            else:
                outs = eqn.primitive.bind(*invals, **eqn.params)
                if not eqn.primitive.multiple_results:
                    outs = [outs]
        for v, o in zip(eqn.outvars, outs):
            write(v, o)
    return [read(v) for v in jaxpr.outvars]


def _intercept(fn, conv_cb):
    """Wrap `fn` so each conv equation goes through `conv_cb`."""

    def wrapped(*args):
        closed = jax.make_jaxpr(fn)(*args)
        flat = jax.tree_util.tree_leaves(args)
        out_flat = _eval_jaxpr(closed.jaxpr, closed.consts, flat, conv_cb,
                               [0])
        out_tree = jax.tree_util.tree_structure(jax.eval_shape(fn, *args))
        return jax.tree_util.tree_unflatten(out_tree, out_flat)

    return wrapped


def count_convs(fn, *args) -> int:
    """Number of conv sites `quantize_apply` would intercept."""
    closed = jax.make_jaxpr(fn)(*args)
    n = [0]

    def visit(jaxpr):
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == "conv_general_dilated":
                n[0] += 1
            for sub in _sub_jaxprs(eqn):
                visit(sub.jaxpr)

    visit(closed.jaxpr)
    return n[0]


def make_calibration_fn(fn, percentile: float = 100.0) -> Callable:
    """Jittable stats pass: returns per-conv-site input absmax (f32 (S,)).

    calib(*args) -> (S,) array; take the elementwise running max over
    calibration batches and feed the result to `quantize_apply`.

    `percentile` < 100 clips each site's range to that percentile of
    |x| instead of the absolute max — outlier activations (a handful of
    pixels) otherwise stretch the int8 grid and waste resolution on
    values that never recur (standard PTQ practice; the accuracy sweep
    is in docs/PERFORMANCE.md).
    """

    def stat(x):
        ax = jnp.abs(x).astype(jnp.float32)
        if percentile >= 100.0:
            return jnp.max(ax)
        return jnp.percentile(ax.reshape(-1), percentile)

    def calib(*args):
        maxes = []

        def cb(site, eqn, invals):
            maxes.append(stat(invals[0]))
            return eqn.primitive.bind(*invals, **eqn.params)

        _intercept(fn, cb)(*args)
        return jnp.stack(maxes)

    return calib


def collect_scales(fn, batches: Sequence,
                   percentile: float = 100.0) -> np.ndarray:
    """Run the calibration pass over `batches` (tuples of fn args) and
    return per-site int8 activation scales (absmax / 127, or the
    `percentile`-clipped range — see make_calibration_fn).

    Cross-batch aggregation: absmax takes the running max (the true
    absmax of the pooled data); percentile stats take the MEAN of the
    per-batch percentiles — a max would converge back toward absmax as
    calibration batches grow (the max of N per-batch p99.9s approaches
    the worst image's tail), silently undoing the clip the flag asks
    for. The mean is a stable estimator of the pooled percentile under
    the i.i.d.-batches assumption that calibration already makes."""
    calib = jax.jit(make_calibration_fn(fn, percentile=percentile))
    stats = [np.asarray(calib(*args)) for args in batches]
    if percentile >= 100.0:
        agg = np.maximum.reduce(stats)
    else:
        agg = np.mean(stats, axis=0)
    return np.maximum(agg, _EPS) / 127.0


def collect_scales_uint8(model, variables, canvases,
                         percentile: float = 100.0) -> np.ndarray:
    """Calibrate from network canvases in the serving CLIs' upload
    convention: uint8 means RAW BGR (cast + caffe-mean subtraction applied
    here, matching the device_preprocess path); float means already
    host-preprocessed (used as-is). Then `collect_scales`."""
    from ..data.kitti import BGR_MEAN

    batches = []
    for c in canvases:
        raw = np.asarray(c)
        im = raw.astype(np.float32)
        if raw.dtype == np.uint8:
            im = im - BGR_MEAN
        if im.ndim == 3:
            im = im[None]
        batches.append((variables, jnp.asarray(im)))
    return collect_scales(lambda v, im: model.apply(v, im), batches,
                          percentile=percentile)


def quantize_apply(fn, scales) -> Callable:
    """Return `fn` with every conv running int8 x int8 -> int32.

    `scales`: per-site activation scales from `collect_scales`. The
    returned callable is jit/pjit-compatible (scales are baked in as
    constants, so XLA folds the quantize/dequantize chains).
    """
    scales = np.asarray(scales, np.float32)

    def cb(site, eqn, invals):
        x, w = invals
        out_dtype = eqn.outvars[0].aval.dtype
        dn = eqn.params["dimension_numbers"]
        s_x = float(scales[site])

        x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                      -127.0, 127.0).astype(jnp.int8)
        # per-output-channel symmetric weight scale; rhs_spec[0] is the
        # out-feature dim of the kernel
        o_dim = dn.rhs_spec[0]
        reduce_dims = tuple(d for d in range(w.ndim) if d != o_dim)
        s_w = jnp.maximum(
            jnp.max(jnp.abs(w.astype(jnp.float32)), axis=reduce_dims),
            _EPS) / 127.0
        s_w_b = jnp.expand_dims(s_w, reduce_dims)
        w8 = jnp.clip(jnp.round(w.astype(jnp.float32) / s_w_b),
                      -127.0, 127.0).astype(jnp.int8)

        params = dict(eqn.params)
        params["preferred_element_type"] = jnp.int32
        y32 = eqn.primitive.bind(x8, w8, **params)

        # broadcast s_w along the OUTPUT feature dim
        c_dim = dn.out_spec[1]
        shape = [1] * y32.ndim
        shape[c_dim] = s_w.shape[0]
        deq = s_x * s_w.reshape(shape)
        return (y32.astype(jnp.float32) * deq).astype(out_dtype)

    return _intercept(fn, cb)
