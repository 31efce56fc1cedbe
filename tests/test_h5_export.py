"""h5 weight-exporter tests (the reverse interop direction).

1. Round-trip: flax variables -> reference-layout h5 -> load_reference_h5
   must reproduce the exact tree.
2. Keras-populate: load the exported h5 into the real reference Keras
   graph (the same replica test_h5_import validates against) and assert
   the Keras forward matches our flax forward — a model trained in this
   framework works in the reference ecosystem.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ground_plane_polling_tpu.models.h5_export import export_reference_h5
from ground_plane_polling_tpu.models.h5_import import load_reference_h5

from .test_h5_import import (HW, NUM_ANCHORS, NUM_CLASSES, STAGES,
                             build_reference_model)

keras = pytest.importorskip("keras")


def _tiny_variables(rng):
    """Random flax variables for the tiny-stage resnet detector."""
    from ground_plane_polling_tpu.models import GPPRetinaNet
    from ground_plane_polling_tpu.models.resnet import ResNetBackbone

    model = GPPRetinaNet(
        backbone_fn=lambda: ResNetBackbone(stage_sizes=STAGES,
                                           name="backbone"),
        num_classes=NUM_CLASSES)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, HW, HW, 3), jnp.float32))

    def randomize(x, counter=[0]):
        counter[0] += 1
        r = np.random.RandomState(1000 + counter[0])
        if x.ndim == 1 and "var" not in str(x.dtype):
            return jnp.asarray(r.uniform(0.5, 1.5, x.shape), x.dtype)
        return jnp.asarray(r.normal(0, 0.05, x.shape), x.dtype)

    variables = jax.tree.map(randomize, dict(variables))
    # variances must be positive
    def fix_var(tree):
        if isinstance(tree, dict):
            return {k: (jnp.abs(v) + 0.5 if k == "var" else fix_var(v))
                    for k, v in tree.items()}
        return tree
    return model, fix_var(variables)


def test_export_import_roundtrip(tmp_path):
    model, variables = _tiny_variables(np.random.RandomState(3))
    path = str(tmp_path / "export.h5")
    export_reference_h5(variables, path, stage_sizes=STAGES)

    back = load_reference_h5(path, stage_sizes=STAGES)
    flat_a = jax.tree_util.tree_flatten_with_path(dict(variables))[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    assert len(flat_a) == len(flat_b)
    b = dict(flat_b)
    for k, va in flat_a:
        np.testing.assert_array_equal(np.asarray(va), np.asarray(b[k]),
                                      err_msg=str(k))


def test_exported_h5_populates_keras_reference(tmp_path):
    """Load the exported h5 into the real Keras reference graph THROUGH
    KERAS'S OWN LOADER (load_weights(by_name=True) — the same call the
    reference uses for weight files, ref bin/train.py:349-352); forwards
    must agree (reverse of test_forward_parity_with_keras_reference)."""
    model, variables = _tiny_variables(np.random.RandomState(4))
    path = str(tmp_path / "export.h5")
    export_reference_h5(variables, path, stage_sizes=STAGES)

    kmodel = build_reference_model()
    kmodel.load_weights(path, by_name=True)

    rng = np.random.RandomState(5)
    x = rng.uniform(-1, 1, (1, HW, HW, 3)).astype(np.float32)
    k_reg, k_dim, k_cls = kmodel.predict(x, verbose=0)
    ours = model.apply(variables, jnp.asarray(x))

    def assert_close_to_scale(a, b, rel=1e-4):
        # float32 accumulation-order differences (oneDNN vs XLA convs)
        # scale with the activation magnitude, so tolerance does too
        tol = rel * max(np.max(np.abs(b)), 1.0)
        np.testing.assert_allclose(np.asarray(a), b, atol=tol, rtol=0)

    assert_close_to_scale(ours["regression"], k_reg)
    assert_close_to_scale(ours["regression_dim"], k_dim)
    assert_close_to_scale(ours["classification"], k_cls, rel=1e-3)


def test_convert_model_cli_to_h5(tmp_path):
    """npz -> h5 -> npz through the CLI: the round trip preserves weights."""
    from ground_plane_polling_tpu.bin.convert_model import main as convert
    from ground_plane_polling_tpu.training.checkpoint import (export_params,
                                                              import_params)
    import jax
    from ground_plane_polling_tpu.models import build_detector

    model = build_detector("resnet50", num_classes=NUM_CLASSES)
    variables = model.init(jax.random.PRNGKey(1),
                           jnp.zeros((1, HW, HW, 3), jnp.float32))
    npz_in = str(tmp_path / "in.npz")
    export_params(npz_in, variables)

    h5_out = str(tmp_path / "out.h5")
    convert([npz_in, h5_out, "--backbone", "resnet50"])

    npz_back = str(tmp_path / "back.npz")
    convert([h5_out, npz_back, "--backbone", "resnet50"])
    back = import_params(npz_back)

    flat_a = jax.tree_util.tree_flatten_with_path(dict(variables))[0]
    flat_b = dict(jax.tree_util.tree_flatten_with_path(back)[0])
    for k, va in flat_a:
        np.testing.assert_array_equal(np.asarray(va),
                                      np.asarray(flat_b[k]), err_msg=str(k))
