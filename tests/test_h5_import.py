"""h5 weight-importer tests.

Strategy: rebuild the reference's exact Keras graph (keras_resnet backbone +
FPN + the three submodels, same layer names, same ZeroPadding/valid-conv
stem, reference models/retinanet.py:24-205) in the installed Keras, randomize
its weights, serialize them into a Keras-2.2-layout h5 fixture with h5py,
import that h5 with our importer, and assert the flax forward pass reproduces
the Keras forward pass. This exercises the full chain the reference-
checkpoint interop depends on: h5 group layout, layer-name mapping, the five
parallel regression-conv fusion, frozen-BN stats, and conv padding semantics.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ground_plane_polling_tpu.models import GPPRetinaNet
from ground_plane_polling_tpu.models.h5_import import (
    _resnet_trees, load_reference_h5, merge_backbone, read_keras_h5)
from ground_plane_polling_tpu.models.resnet import ResNetBackbone

keras = pytest.importorskip("keras")

STAGES = (1, 1, 1, 1)
HW = 64
NUM_CLASSES = 1
NUM_ANCHORS = 12


# ---------------------------------------------------------------------------
# reference graph replica (exact layer names, exact padding semantics)
# ---------------------------------------------------------------------------

def _bottleneck(x, filters, stage, block, numerical=False):
    L = keras.layers
    stage_char = str(stage + 2)
    block_char = (f"b{block}" if (block > 0 and numerical)
                  else chr(ord("a") + block))
    stride = 1 if (block != 0 or stage == 0) else 2
    p = f"{stage_char}{block_char}"

    y = L.Conv2D(filters, 1, strides=stride, use_bias=False,
                 name=f"res{p}_branch2a")(x)
    y = L.BatchNormalization(epsilon=1e-5, name=f"bn{p}_branch2a")(y)
    y = L.Activation("relu")(y)
    y = L.ZeroPadding2D(1)(y)
    y = L.Conv2D(filters, 3, use_bias=False, name=f"res{p}_branch2b")(y)
    y = L.BatchNormalization(epsilon=1e-5, name=f"bn{p}_branch2b")(y)
    y = L.Activation("relu")(y)
    y = L.Conv2D(filters * 4, 1, use_bias=False, name=f"res{p}_branch2c")(y)
    y = L.BatchNormalization(epsilon=1e-5, name=f"bn{p}_branch2c")(y)
    if block == 0:
        s = L.Conv2D(filters * 4, 1, strides=stride, use_bias=False,
                     name=f"res{p}_branch1")(x)
        s = L.BatchNormalization(epsilon=1e-5, name=f"bn{p}_branch1")(s)
    else:
        s = x
    return L.Activation("relu")(L.Add()([y, s]))


def _backbone(inp, stage_sizes):
    L = keras.layers
    x = L.ZeroPadding2D(3, name="padding_conv1")(inp)
    x = L.Conv2D(64, 7, strides=2, use_bias=False, name="conv1")(x)
    x = L.BatchNormalization(epsilon=1e-5, name="bn_conv1")(x)
    x = L.Activation("relu")(x)
    x = L.MaxPooling2D(3, strides=2, padding="same", name="pool1")(x)
    outs = []
    for stage, (n, f) in enumerate(zip(stage_sizes, (64, 128, 256, 512))):
        for b in range(n):
            x = _bottleneck(x, f, stage, b)
        outs.append(x)
    return outs[1], outs[2], outs[3]


def _fpn(c3, c4, c5, feature_size=512):
    L = keras.layers
    up = functools.partial(L.UpSampling2D, 2, interpolation="nearest")
    p5 = L.Conv2D(feature_size, 1, padding="same", name="C5_reduced")(c5)
    p5_up = up(name="P5_upsampled")(p5)
    p5 = L.Conv2D(feature_size, 3, padding="same", name="P5")(p5)
    p4 = L.Conv2D(feature_size, 1, padding="same", name="C4_reduced")(c4)
    p4 = L.Add(name="P4_merged")([p5_up, p4])
    p4_up = up(name="P4_upsampled")(p4)
    p4 = L.Conv2D(feature_size, 3, padding="same", name="P4")(p4)
    p3 = L.Conv2D(feature_size, 1, padding="same", name="C3_reduced")(c3)
    p3 = L.Add(name="P3_merged")([p4_up, p3])
    p3 = L.Conv2D(feature_size, 3, padding="same", name="P3")(p3)
    p6 = L.Conv2D(feature_size, 3, strides=2, padding="same", name="P6")(c5)
    p7 = L.Conv2D(feature_size, 3, strides=2, padding="same",
                  name="P7")(L.Activation("relu", name="C6_relu")(p6))
    return [p3, p4, p5, p6, p7]


def _classification_submodel(num_classes, num_anchors, feature_size=512):
    L = keras.layers
    inp = keras.Input(shape=(None, None, feature_size))
    x = inp
    for i in range(4):
        x = L.Conv2D(256, 3, padding="same", activation="relu",
                     name=f"pyramid_classification_{i}")(x)
    x = L.Conv2D(num_classes * num_anchors * 8, 3, padding="same",
                 name="pyramid_classification")(x)
    x = L.Reshape((-1, 8 * num_classes))(x)
    x = L.Activation("sigmoid")(x)
    return keras.Model(inp, x, name="classification_submodel")


def _regression_submodel(num_anchors, feature_size=512):
    L = keras.layers
    inp = keras.Input(shape=(None, None, feature_size))
    x = inp
    for i in range(4):
        x = L.Conv2D(512, 3, padding="same", activation="relu",
                     name=f"pyramid_regression_{i}")(x)
    outs = []
    for i, k in enumerate([4, 2, 2, 2, 2], start=1):
        o = L.Conv2D(num_anchors * k, 3, padding="same",
                     name=f"pyramid_regression_op{i}")(x)
        outs.append(L.Reshape((-1, k))(o))
    x = L.Concatenate(axis=-1, name="pyramid_regression")(outs)
    return keras.Model(inp, x, name="regression_submodel")


def _regression_dim_submodel(num_classes, num_anchors, feature_size=512):
    L = keras.layers
    inp = keras.Input(shape=(None, None, feature_size))
    x = inp
    for i in range(4):
        x = L.Conv2D(128, 3, padding="same", activation="relu",
                     name=f"pyramid_regression_dim_{i}")(x)
    x = L.Conv2D(num_classes * num_anchors * 3, 3, padding="same",
                 name="pyramid_regression_dim")(x)
    x = L.Reshape((-1, 3 * num_classes))(x)
    return keras.Model(inp, x, name="regression_dim_submodel")


def build_reference_model(stage_sizes=STAGES, hw=HW,
                          num_classes=NUM_CLASSES, num_anchors=NUM_ANCHORS):
    L = keras.layers
    inp = keras.Input(shape=(hw, hw, 3))
    c3, c4, c5 = _backbone(inp, stage_sizes)
    features = _fpn(c3, c4, c5)
    submodels = [
        ("regression", _regression_submodel(num_anchors)),
        ("regression_dim", _regression_dim_submodel(num_classes, num_anchors)),
        ("classification", _classification_submodel(num_classes, num_anchors)),
    ]
    outputs = [
        L.Concatenate(axis=1, name=name)([m(f) for f in features])
        for name, m in submodels
    ]
    return keras.Model(inp, outputs)


def _randomize_weights(model, rng):
    """Random small conv kernels and non-trivial BN statistics everywhere."""
    def walk(layer):
        if isinstance(layer, keras.Model):
            for sub in layer.layers:
                walk(sub)
            return
        ws = layer.get_weights()
        if not ws:
            return
        if isinstance(layer, keras.layers.BatchNormalization):
            c = ws[0].shape[0]
            layer.set_weights([
                rng.uniform(0.5, 1.5, c).astype(np.float32),
                rng.normal(0, 0.1, c).astype(np.float32),
                rng.normal(0, 0.1, c).astype(np.float32),
                rng.uniform(0.5, 1.5, c).astype(np.float32),
            ])
        else:
            layer.set_weights([
                rng.normal(0, 0.05, w.shape).astype(np.float32)
                for w in ws
            ])
    walk(model)


def _weight_names(layer):
    if isinstance(layer, keras.layers.BatchNormalization):
        return ["gamma", "beta", "moving_mean", "moving_variance"]
    if isinstance(layer, keras.layers.DepthwiseConv2D):
        return ["depthwise_kernel", "bias"][:len(layer.get_weights())]
    n = len(layer.get_weights())
    return ["kernel", "bias"][:n]


def write_keras22_h5(path, model, rename=None):
    """Serialize weights in the Keras 2.2 full-model h5 layout:
    model_weights/<top layer>/<owning layer>/<weight>:0 (nested submodels
    store their inner layers one group deeper, exactly like the reference's
    trained checkpoints). `rename` maps Keras-3 layer names back to their
    Keras-2 spellings (e.g. densenet 'conv1_conv' -> 'conv1/conv')."""
    import h5py

    rename = rename or {}

    with h5py.File(path, "w") as f:
        mw = f.create_group("model_weights")
        for layer in model.layers:
            if isinstance(layer, keras.Model):
                g = mw.create_group(rename.get(layer.name, layer.name))
                for sub in layer.layers:
                    name = rename.get(sub.name, sub.name)
                    for n, w in zip(_weight_names(sub), sub.get_weights()):
                        g.create_dataset(f"{name}/{n}:0", data=w)
            elif layer.get_weights():
                name = rename.get(layer.name, layer.name)
                g = mw.require_group(name)
                for n, w in zip(_weight_names(layer), layer.get_weights()):
                    g.create_dataset(f"{name}/{n}:0", data=w)


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def reference_setup(tmp_path_factory):
    rng = np.random.RandomState(7)
    model = build_reference_model()
    _randomize_weights(model, rng)
    path = tmp_path_factory.mktemp("h5") / "reference.h5"
    write_keras22_h5(str(path), model)
    return model, str(path)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_read_keras_h5_layout(reference_setup):
    _, path = reference_setup
    layers = read_keras_h5(path)
    assert "conv1" in layers and "kernel" in layers["conv1"]
    assert layers["bn_conv1"].keys() >= {"gamma", "beta", "moving_mean",
                                         "moving_variance"}
    # nested submodel layers resolve by their own names
    assert "pyramid_classification_0" in layers
    assert "pyramid_regression_op5" in layers


def test_forward_parity_with_keras_reference(reference_setup):
    keras_model, path = reference_setup
    variables = load_reference_h5(path, stage_sizes=STAGES)

    flax_model = GPPRetinaNet(
        backbone_fn=functools.partial(
            ResNetBackbone, stage_sizes=STAGES, name="backbone"),
        num_classes=NUM_CLASSES, num_anchors=NUM_ANCHORS)

    rng = np.random.RandomState(3)
    image = rng.uniform(-1, 1, (1, HW, HW, 3)).astype(np.float32)

    reg_k, dim_k, cls_k = [np.asarray(t) for t in
                           keras_model(image, training=False)]
    out = flax_model.apply(variables, jnp.asarray(image))

    def assert_close_to_scale(ours, theirs, rel=1e-4):
        # float32 accumulation-order differences (oneDNN vs XLA convs)
        # scale with the activation magnitude, so tolerance does too
        tol = rel * max(np.max(np.abs(theirs)), 1.0)
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=tol,
                                   rtol=0)

    assert_close_to_scale(out["regression"], reg_k)
    assert_close_to_scale(out["regression_dim"], dim_k)
    assert_close_to_scale(out["classification"], cls_k, rel=1e-3)


def test_backbone_only_merge(reference_setup):
    _, path = reference_setup
    imported = load_reference_h5(path, stage_sizes=STAGES,
                                 backbone_only=True)
    assert set(imported["params"]) == {"backbone"}

    flax_model = GPPRetinaNet(
        backbone_fn=functools.partial(
            ResNetBackbone, stage_sizes=STAGES, name="backbone"),
        num_classes=NUM_CLASSES, num_anchors=NUM_ANCHORS)
    init = flax_model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, HW, HW, 3), jnp.float32))
    merged = merge_backbone(init, imported)

    got = merged["params"]["backbone"]["conv1"]["kernel"]
    want = imported["params"]["backbone"]["conv1"]["kernel"]
    np.testing.assert_array_equal(np.asarray(got), want)
    # heads keep their fresh init
    fresh = init["params"]["classification"]["cls_out"]["bias"]
    kept = merged["params"]["classification"]["cls_out"]["bias"]
    np.testing.assert_array_equal(np.asarray(kept), np.asarray(fresh))
    # frozen BN stats come from the file
    np.testing.assert_array_equal(
        np.asarray(merged["frozen"]["backbone"]["bn1"]["mean"]),
        imported["frozen"]["backbone"]["bn1"]["mean"])


@pytest.fixture(scope="module")
def resnet50_h5(tmp_path_factory):
    model = build_reference_model(stage_sizes=(3, 4, 6, 3))
    path = tmp_path_factory.mktemp("h5_r50") / "resnet50.h5"
    write_keras22_h5(str(path), model)
    return str(path)


def test_resnet50_structure_matches_model(resnet50_h5):
    """Importer output must be tree-identical (names + shapes) to a real
    resnet50 model init — verified via eval_shape, no FLOPs."""
    variables = load_reference_h5(resnet50_h5, backbone="resnet50")

    from ground_plane_polling_tpu.models import build_detector
    flax_model = build_detector("resnet50", num_classes=NUM_CLASSES)
    shapes = jax.eval_shape(
        flax_model.init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, HW, HW, 3), jnp.float32))

    got = jax.tree.map(lambda x: x.shape, variables)
    want = jax.tree.map(lambda x: x.shape, dict(shapes))
    assert got == want


def test_convert_model_cli_from_h5(resnet50_h5, tmp_path):
    """gpp-tpu-convert-model accepts a reference .h5 directly and produces
    the standard npz + JSON sidecar artifact."""
    from ground_plane_polling_tpu.bin import convert_model
    from ground_plane_polling_tpu.training.checkpoint import import_params

    out = str(tmp_path / "converted.npz")
    convert_model.main([resnet50_h5, out, "--backbone", "resnet50"])

    variables = import_params(out)
    assert "backbone" in variables["params"]
    assert "cls_out" in variables["params"]["classification"]
    assert "bn1" in variables["frozen"]["backbone"]
    src = load_reference_h5(resnet50_h5, backbone="resnet50")
    np.testing.assert_array_equal(
        variables["params"]["regression"]["box_out"]["kernel"],
        src["params"]["regression"]["box_out"]["kernel"])


_FAMILIES = {
    # family: (keras.applications ctor kwargs, C3/C4/C5 keras layer names,
    #          our registry name)
    "vgg16": ({}, ["block3_pool", "block4_pool", "block5_pool"], "vgg16"),
    "mobilenet": ({"alpha": 1.0},
                  ["conv_pw_5_relu", "conv_pw_11_relu", "conv_pw_13_relu"],
                  "mobilenet224_1.0"),
    "densenet121": ({}, ["conv3_block12_concat", "conv4_block24_concat",
                         "conv5_block16_concat"], "densenet121"),
}


@pytest.mark.parametrize(
    "family",
    ["vgg16", "mobilenet",
     # densenet import parity costs ~40 s on this 1-CPU box -> slow lane
     pytest.param("densenet121", marks=pytest.mark.slow)])
def test_backbone_import_matches_keras_applications(family, tmp_path):
    """VGG / MobileNet / DenseNet h5 import: features C3/C4/C5 from our
    flax backbone must reproduce keras.applications' (the reference's
    actual backbone implementations) on the same randomized weights."""
    kwargs, out_layers, registry_name = _FAMILIES[family]
    ctor = {"vgg16": keras.applications.VGG16,
            "mobilenet": keras.applications.MobileNet,
            "densenet121": keras.applications.DenseNet121}[family]
    kmodel = ctor(weights=None, include_top=False,
                  input_shape=(64, 64, 3), **kwargs)
    _randomize_weights(kmodel, np.random.RandomState(11))

    # Keras 3 forbids '/' in names; the reference's Keras 2 h5s use the
    # slashed densenet stem names — write the fixture with those.
    rename = {"conv1_conv": "conv1/conv", "conv1_bn": "conv1/bn"} \
        if family == "densenet121" else {}
    path = str(tmp_path / f"{family}.h5")
    write_keras22_h5(path, kmodel, rename=rename)

    imported = load_reference_h5(path, backbone=registry_name,
                                 backbone_only=True)
    variables = {"params": imported["params"]["backbone"]}
    if "frozen" in imported:
        variables["frozen"] = imported["frozen"]["backbone"]

    from ground_plane_polling_tpu.models import backbone_registry
    module = backbone_registry()[registry_name](dtype=jnp.float32)

    rng = np.random.RandomState(5)
    image = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    ours = module.apply(variables, jnp.asarray(image))

    probe = keras.Model(
        kmodel.inputs, [kmodel.get_layer(n).output for n in out_layers])
    theirs = [np.asarray(t) for t in probe(image, training=False)]

    for level, (a, b) in enumerate(zip(ours, theirs)):
        scale = max(float(np.max(np.abs(b))), 1.0)
        np.testing.assert_allclose(
            np.asarray(a), b, atol=2e-4 * scale, rtol=0,
            err_msg=f"{family} C{level + 3}")


def test_numerical_block_names_resolve():
    """keras_resnet's resnet101/152 mid stages use 'b1', 'b2', ... block
    names (numerical_names mode); the importer must probe both spellings."""
    rng = np.random.RandomState(0)

    def conv(cin, cout):
        return {"kernel": rng.normal(size=(1, 1, cin, cout)).astype(np.float32)}

    def bn(c):
        return {"gamma": np.ones(c, np.float32),
                "beta": np.zeros(c, np.float32),
                "moving_mean": np.zeros(c, np.float32),
                "moving_variance": np.ones(c, np.float32)}

    layers = {"conv1": conv(3, 64), "bn_conv1": bn(64)}
    stage_sizes = (1, 3, 1, 1)
    for stage, n in enumerate(stage_sizes):
        s = str(stage + 2)
        numerical = stage == 1
        for b in range(n):
            ch = (f"b{b}" if (b > 0 and numerical) else chr(ord("a") + b))
            f = 64 * 2 ** stage
            for br, (ci, co) in {"branch2a": (f, f), "branch2b": (f, f),
                                 "branch2c": (f, 4 * f)}.items():
                layers[f"res{s}{ch}_{br}"] = conv(ci, co)
                layers[f"bn{s}{ch}_{br}"] = bn(co)
            if b == 0:
                layers[f"res{s}{ch}_branch1"] = conv(f, 4 * f)
                layers[f"bn{s}{ch}_branch1"] = bn(4 * f)

    params, frozen = _resnet_trees(layers, stage_sizes)
    # stage2 of ours == keras stage 3, blocks a, b1, b2
    assert "stage2_block3" in params
    np.testing.assert_array_equal(
        params["stage2_block3"]["conv1"]["kernel"],
        layers["res3b2_branch2a"]["kernel"])
    assert "conv_proj" in params["stage2_block1"]
    assert "bn_proj" in frozen["stage2_block1"]


def test_fuse_towers_on_h5_imported_weights(resnet50_h5):
    """fuse_detector_params must accept an h5-imported tree (same head
    subtree names as a flax init) and produce the fused structure with
    the right shapes."""
    from ground_plane_polling_tpu.models import (build_detector,
                                                 fuse_detector_params)

    variables = load_reference_h5(resnet50_h5, backbone="resnet50")
    fused = fuse_detector_params(variables)
    flax_model = build_detector("resnet50", num_classes=NUM_CLASSES,
                                fuse_cls_dim=True)
    shapes = jax.eval_shape(
        flax_model.init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, HW, HW, 3), jnp.float32))
    got = jax.tree.map(lambda x: x.shape, fused)
    want = jax.tree.map(lambda x: x.shape, dict(shapes))
    assert got == want
