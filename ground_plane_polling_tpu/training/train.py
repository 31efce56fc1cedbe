"""Training step: loss assembly, optimizer, and the sharded train_step.

Mirrors the reference's compile/fit configuration
(/root/reference/keras_retinanet_3D/bin/train.py:113-120): the three losses
are summed (focal classification + smooth-L1 box/keypoint + smooth-L1 dims)
and optimized with Adam(lr=1e-5) with per-tensor gradient-norm clipping at
0.001 (keras `clipnorm` clips each gradient tensor independently — note this
is NOT optax's global-norm clip).

TPU-native structure: one jit-compiled train_step over a data-parallel mesh;
the batch arrives sharded on the 'data' axis, parameters/optimizer state are
replicated, and XLA inserts the gradient all-reduce (psum over ICI)
automatically from the sharding annotations.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..parallel.mesh import batch_sharding, replicated_sharding
from . import losses

__all__ = ["TrainState", "clip_per_tensor_norm", "make_optimizer",
           "create_train_state", "make_train_step",
           "make_sharded_train_step", "make_fused_train_step"]


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    frozen: Any      # frozen BN statistics (never updated)
    opt_state: Any
    lr: jax.Array    # current learning rate (a traced scalar, so the
                     # reduce-on-plateau callback can change it without
                     # recompiling the train step)


def clip_per_tensor_norm(max_norm: float) -> optax.GradientTransformation:
    """Clip each gradient leaf to L2 norm <= max_norm (keras clipnorm)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def clip(g):
            norm = jnp.linalg.norm(g.ravel())
            scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
            return g * scale

        return jax.tree_util.tree_map(clip, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(learning_rate=1e-5, clipnorm: float = 0.001,
                   freeze_backbone: bool = False):
    """Adam preconditioner with keras-style per-tensor clipnorm.

    The learning-rate scaling is applied in the train step from
    TrainState.lr (so the reduce-on-plateau callback can change it without
    recompiling); `learning_rate` here only sets the initial TrainState.lr
    via create_train_state's default. Optionally freezes the backbone like
    the reference's --freeze-backbone (bin/train.py:96,
    utils/model.py:18-28).
    """
    del learning_rate  # carried in TrainState.lr; kept for API clarity
    tx = optax.chain(
        clip_per_tensor_norm(clipnorm),
        optax.scale_by_adam(),
    )
    if freeze_backbone:
        def label_fn(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: "frozen"
                if path and getattr(path[0], "key", None) == "backbone"
                else "trainable",
                params,
            )
        tx = optax.multi_transform(
            {"trainable": tx, "frozen": optax.set_to_zero()}, label_fn)
    return tx


def create_train_state(variables, tx, learning_rate: float = 1e-5
                       ) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        frozen=variables.get("frozen", {}),
        opt_state=tx.init(params),
        lr=jnp.asarray(learning_rate, jnp.float32),
    )


def compute_losses(model, params, frozen, batch,
                   compat_height_only: bool = False):
    """Returns (total, dict of components). Batch keys: image, regression,
    regression_dim, labels (the ops.targets layout)."""
    out = model.apply({"params": params, "frozen": frozen}, batch["image"])
    l_box = losses.smooth_l1(batch["regression"], out["regression"])
    l_dim = losses.smooth_l1_dim(batch["regression_dim"],
                                 out["regression_dim"],
                                 compat_height_only=compat_height_only)
    l_cls = losses.focal(batch["labels"], out["classification"])
    total = l_box + l_dim + l_cls
    return total, {"loss": total, "regression": l_box,
                   "regression_dim": l_dim, "classification": l_cls}


def _step_body(model, tx, state: TrainState, batch,
               compat_height_only: bool):
    """Shared loss+grad+update body for every train-step variant."""

    def loss_fn(params):
        return compute_losses(model, params, state.frozen, batch,
                              compat_height_only)

    grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    updates = jax.tree_util.tree_map(lambda u: -state.lr * u, updates)
    params = optax.apply_updates(state.params, updates)
    new_state = TrainState(step=state.step + 1, params=params,
                           frozen=state.frozen, opt_state=opt_state,
                           lr=state.lr)
    return new_state, metrics


def make_train_step(model, tx, compat_height_only: bool = False):
    """Single-device / auto-sharded train step (jit once, reuse)."""

    def train_step(state: TrainState, batch):
        return _step_body(model, tx, state, batch, compat_height_only)

    return jax.jit(train_step, donate_argnums=(0,))


def make_sharded_train_step(model, tx, mesh,
                            compat_height_only: bool = False):
    """Data-parallel train step over `mesh`: batch sharded on 'data',
    state replicated. XLA lowers the implied gradient reduction to an
    all-reduce over ICI."""
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)

    def train_step(state: TrainState, batch):
        return _step_body(model, tx, state, batch, compat_height_only)

    return jax.jit(
        train_step,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_fused_train_step(model, tx, num_classes: Optional[int] = None,
                          augment: Optional[bool] = None,
                          augment_config=None,
                          compat_height_only: bool = False, mesh=None,
                          loader=None):
    """ONE jitted dispatch per step: device-side augmentation + anchor-
    target assignment (data.pipeline._device_prepare) fused INTO the
    forward/backward program.

    The two-stage path dispatches two device programs per step — the
    producer thread's _device_prepare and then the train step — which on
    a relay-attached chip costs two RPC round-trips and an intermediate
    f32 target buffer parked in HBM between them. Fused, the loader
    (KittiLoader(raw_batches=True)) ships the raw uint8 canvas + padded
    annotation arrays and XLA schedules upload, augmentation, target
    assignment, and the step as one program. Numerically identical to
    prepare-then-step (same PRNG key path; pinned by
    tests/test_train_step.py::test_fused_prepare_matches_two_stage).

    Raw batch keys (KittiLoader._make_batch raw layout): key, images,
    annotations, ann_mask, ignores, ignore_mask, valid, sizes.

    With `mesh`, the batch axis is sharded over 'data' like
    make_sharded_train_step (the per-example augmentation keys are
    derived from the replicated `key` inside the program).
    """
    from ..data.augment import AugmentConfig
    from ..data.pipeline import _device_prepare
    if loader is not None:
        # derive the prepare config from the loader feeding this step —
        # passing both independently lets augment/augment_config/
        # num_classes silently disagree with what the loader would have
        # used in two-stage mode. Explicit args alongside loader= are
        # rejected rather than silently overwritten.
        if not loader.raw_batches:
            raise ValueError(
                "make_fused_train_step(loader=...) needs "
                "KittiLoader(raw_batches=True); this loader would yield "
                "already-prepared batches")
        if (num_classes is not None or augment is not None
                or augment_config is not None):
            raise ValueError(
                "make_fused_train_step: pass EITHER loader= (config "
                "derived from it) OR explicit num_classes/augment/"
                "augment_config — not both")
        num_classes = loader.ds.num_classes
        augment = loader.augment
        augment_config = loader.augment_config
    if num_classes is None:
        raise ValueError("pass num_classes (or loader=) to "
                         "make_fused_train_step")
    if augment is None:
        augment = True
    if augment_config is None:
        augment_config = AugmentConfig()

    def train_step(state: TrainState, raw):
        batch = _device_prepare(
            raw["key"], raw["images"], raw["annotations"],
            raw["ann_mask"], raw["ignores"], raw["ignore_mask"],
            raw["valid"], raw["sizes"], num_classes=num_classes,
            do_augment=augment, config=augment_config,
            image_shape=tuple(raw["images"].shape[1:3]))
        return _step_body(model, tx, state, batch, compat_height_only)

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    raw_shardings = {"key": repl, "images": data, "annotations": data,
                     "ann_mask": data, "ignores": data,
                     "ignore_mask": data, "valid": data, "sizes": data}
    return jax.jit(
        train_step,
        in_shardings=(repl, raw_shardings),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
