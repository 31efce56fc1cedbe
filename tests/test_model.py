"""Model forward-pass shape and init-semantics tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ground_plane_polling_tpu.models import build_detector, backbone_registry
from ground_plane_polling_tpu.ops import anchors as A

IMG = (128, 160)  # small but exercises all 5 pyramid levels


def _init_and_run(name, img=IMG, num_classes=1):
    model = build_detector(name, num_classes=num_classes)
    x = jnp.zeros((1, *img, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    return variables, out


def test_resnet50_output_shapes():
    _, out = _init_and_run("resnet50")
    n = A.num_anchors_for_shape(IMG)
    assert out["regression"].shape == (1, n, 12)
    assert out["regression_dim"].shape == (1, n, 3)
    assert out["classification"].shape == (1, n, 8)


def test_multiclass_shapes():
    _, out = _init_and_run("resnet50", num_classes=3)
    n = A.num_anchors_for_shape(IMG)
    assert out["regression_dim"].shape == (1, n, 9)
    assert out["classification"].shape == (1, n, 24)


def test_prior_probability_init():
    """Zero classification kernel + prior bias => sigmoid outputs ~0.01."""
    _, out = _init_and_run("resnet50")
    cls = np.asarray(out["classification"])
    np.testing.assert_allclose(cls, 0.01, rtol=1e-3)


def test_frozen_collection_excluded_from_params():
    model = build_detector("resnet50")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    assert "frozen" in variables  # BN stats live outside trainable params
    leaves = jax.tree_util.tree_leaves(variables["params"])
    frozen_leaves = jax.tree_util.tree_leaves(variables["frozen"])
    assert len(leaves) > 0 and len(frozen_leaves) > 0


def test_registry_contains_all_families():
    reg = backbone_registry()
    for name in ["resnet50", "resnet101", "resnet152", "vgg16", "vgg19",
                 "densenet121", "densenet169", "densenet201",
                 "mobilenet224_1.0"]:
        assert name in reg


# densenet variants are the heaviest inits on this 1-CPU box (~25-40 s
# each); their coverage moves to the slow lane, vgg/mobilenet keep the
# default-lane multi-family signal
_DN_SLOW = pytest.param("densenet121", marks=pytest.mark.slow)


@pytest.mark.parametrize("name", ["vgg16", _DN_SLOW, "mobilenet224_1.0"])
def test_alt_backbones_forward(name):
    _, out = _init_and_run(name, img=(64, 64))
    n = A.num_anchors_for_shape((64, 64))
    assert out["regression"].shape == (1, n, 12)
    assert np.isfinite(np.asarray(out["regression"])).all()


@pytest.mark.parametrize("name", ["vgg16", _DN_SLOW, "mobilenet224_1.0",
                                  "resnet50"])
def test_head_count_matches_anchor_grid_odd_size(name):
    """Pooling must ceil-divide like the anchor grid (the reference needed
    per-backbone shape callbacks for this, utils/anchors.py:104-137; here
    SAME-padded pooling keeps every backbone on the ceil-div convention)."""
    img = (72, 104)  # not a multiple of 32
    _, out = _init_and_run(name, img=img)
    assert out["regression"].shape[1] == A.num_anchors_for_shape(img)


def test_jit_forward_consistency():
    model = build_detector("resnet50")
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    eager = model.apply(variables, x)
    jitted = jax.jit(model.apply)(variables, x)
    np.testing.assert_allclose(
        np.asarray(eager["regression"]), np.asarray(jitted["regression"]),
        rtol=2e-4, atol=1e-5,
    )


def test_pack_levels_matches_unpacked():
    """pack_levels=True (P4..P7 packed into one canvas per head, gap pixels
    re-zeroed every tower layer) must reproduce the per-level head outputs —
    same params, same math, different conv scheduling."""
    import numpy as np

    from ground_plane_polling_tpu.models import build_detector

    img = (128, 192)  # multi-size pyramid incl. odd tail shapes
    base = build_detector("tiny")
    packed = build_detector("tiny", pack_levels=True)
    x = jnp.asarray(
        np.random.RandomState(0).uniform(-1, 1, (2, *img, 3)), jnp.float32)
    variables = base.init(jax.random.PRNGKey(0), x)

    # heads init with random tower kernels but zero/constant biases; perturb
    # every bias so the gap re-zeroing is actually load-bearing
    def perturb(tree, key=[0]):
        def f(p):
            key[0] += 1
            r = np.random.RandomState(key[0])
            return p + jnp.asarray(r.normal(0, 0.05, p.shape), p.dtype)
        return jax.tree.map(f, tree)

    params = dict(variables["params"])
    for head in ("classification", "regression", "regression_dim"):
        params[head] = perturb(variables["params"][head])
    variables = {**variables, "params": params}

    out_a = base.apply(variables, x)
    out_b = packed.apply(variables, x)
    for k in out_a:
        np.testing.assert_allclose(
            np.asarray(out_b[k]), np.asarray(out_a[k]),
            rtol=1e-5, atol=1e-5, err_msg=k)


def test_fuse_cls_dim_matches_split_heads():
    """fuse_cls_dim=True (cls+dim heads as one block-diagonal 384-wide
    tower, see heads.FusedClsDimHead) must reproduce the split-head outputs
    exactly after the fuse_detector_params weight transform."""
    from ground_plane_polling_tpu.models import fuse_detector_params

    img = (128, 192)
    base = build_detector("tiny")
    fused = build_detector("tiny", fuse_cls_dim=True)
    x = jnp.asarray(
        np.random.RandomState(1).uniform(-1, 1, (2, *img, 3)), jnp.float32)
    variables = base.init(jax.random.PRNGKey(0), x)

    # perturb all head params so zero-init kernels/biases are load-bearing
    def perturb(tree, key=[100]):
        def f(p):
            key[0] += 1
            r = np.random.RandomState(key[0])
            return p + jnp.asarray(r.normal(0, 0.05, p.shape), p.dtype)
        return jax.tree.map(f, tree)

    params = dict(variables["params"])
    for head in ("classification", "regression", "regression_dim"):
        params[head] = perturb(variables["params"][head])
    variables = {**variables, "params": params}

    out_a = base.apply(variables, x)
    out_b = fused.apply(fuse_detector_params(variables), x)
    for k in out_a:
        np.testing.assert_allclose(
            np.asarray(out_b[k]), np.asarray(out_a[k]),
            rtol=1e-5, atol=1e-5, err_msg=k)

    # param-tree sanity: fused tree swaps the two head subtrees for one
    fv = fuse_detector_params(variables)
    assert "clsdim" in fv["params"]
    assert "classification" not in fv["params"]
    assert "regression_dim" not in fv["params"]


def test_fuse_cls_dim_with_pack_levels():
    """Fusion composes with the packed-canvas scheduling."""
    from ground_plane_polling_tpu.models import fuse_detector_params

    img = (128, 192)
    base = build_detector("tiny")
    fused = build_detector("tiny", fuse_cls_dim=True, pack_levels=True)
    x = jnp.asarray(
        np.random.RandomState(2).uniform(-1, 1, (1, *img, 3)), jnp.float32)
    variables = base.init(jax.random.PRNGKey(0), x)

    def perturb(tree, key=[200]):
        def f(p):
            key[0] += 1
            r = np.random.RandomState(key[0])
            return p + jnp.asarray(r.normal(0, 0.05, p.shape), p.dtype)
        return jax.tree.map(f, tree)

    params = dict(variables["params"])
    for head in ("classification", "regression", "regression_dim"):
        params[head] = perturb(variables["params"][head])
    variables = {**variables, "params": params}

    out_a = base.apply(variables, x)
    out_b = fused.apply(fuse_detector_params(variables), x)
    for k in out_a:
        np.testing.assert_allclose(
            np.asarray(out_b[k]), np.asarray(out_a[k]),
            rtol=1e-4, atol=2e-5, err_msg=k)


def test_fused_head_init_matches_prior_prob():
    """A freshly-initialised fused model must score anchors at the 0.01
    prior like the split heads (the fused out-conv's bias carries the
    prior on the classification channels, zeros on the dim channels)."""
    model = build_detector("tiny", fuse_cls_dim=True)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(out["classification"]), 0.01, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["regression_dim"]), 0.0,
                               atol=1e-6)


def test_fuse_detector_params_idempotent_and_validating():
    from ground_plane_polling_tpu.models import fuse_detector_params

    model = build_detector("tiny")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32))
    fused = fuse_detector_params(variables)
    again = fuse_detector_params(fused)  # no-op, not a KeyError
    assert "clsdim" in again["params"]
    with pytest.raises(ValueError, match="head subtrees"):
        fuse_detector_params({"params": {"backbone": {}}})


@pytest.mark.slow
@pytest.mark.parametrize("name", ["resnet101", "resnet152"])
def test_deep_resnet_forward(name):
    """The deep resnet variants must actually RUN (registry membership and
    h5 name-mapping were tested, the forward never was): BASELINE config 5
    is a resnet50/101/152 sweep."""
    _, out = _init_and_run(name, img=(64, 64))
    n = A.num_anchors_for_shape((64, 64))
    assert out["regression"].shape == (1, n, 12)
    assert out["classification"].shape == (1, n, 8)
    assert np.isfinite(np.asarray(out["classification"])).all()
