"""Backbone registry + model factory.

Mirrors the reference's `models.backbone(name)` dispatch
(/root/reference/keras_retinanet_3D/models/__init__.py:42-56). Each entry maps
a backbone name to a constructor returning an (images -> (C3, C4, C5)) flax
module; `build_detector(name, ...)` assembles the full GPP-RetinaNet.
"""

from __future__ import annotations

import functools
from typing import Any

import jax.numpy as jnp

from .resnet import RESNET_STAGES, ResNetBackbone
from .retinanet import GPPRetinaNet

__all__ = ["backbone_registry", "build_detector", "fuse_detector_params",
           "GPPRetinaNet"]


def _resnet(name: str, dtype, remat: bool = False):
    return ResNetBackbone(stage_sizes=RESNET_STAGES[name], dtype=dtype,
                          remat=remat, name="backbone")


def backbone_registry():
    reg = {}
    for name in RESNET_STAGES:
        reg[name] = functools.partial(_resnet, name)
    # vgg / densenet / mobilenet variants are registered by their modules
    from . import vgg, densenet, mobilenet, tiny  # noqa: F401
    reg.update(vgg.REGISTRY)
    reg.update(densenet.REGISTRY)
    reg.update(mobilenet.REGISTRY)
    reg.update(tiny.REGISTRY)
    return reg


def build_detector(backbone: str = "resnet50", num_classes: int = 1,
                   dtype: Any = jnp.float32,
                   pack_levels: bool = False,
                   fuse_cls_dim: bool = False,
                   remat: bool = False) -> GPPRetinaNet:
    """remat rematerializes backbone blocks on the backward pass
    (jax.checkpoint) to trade FLOPs for training HBM; resnet family only.
    fuse_cls_dim runs the classification+dimension heads as one
    block-diagonal tower (inference-only; convert standard weights with
    fuse_detector_params)."""
    reg = backbone_registry()
    if backbone not in reg:
        raise ValueError(
            f"unknown backbone {backbone!r}; available: {sorted(reg)}")
    ctor = reg[backbone]
    if remat:
        if backbone not in RESNET_STAGES:
            raise ValueError("remat is implemented for the resnet family")
        backbone_fn = functools.partial(ctor, dtype=dtype, remat=True)
    else:
        backbone_fn = functools.partial(ctor, dtype=dtype)
    return GPPRetinaNet(
        backbone_fn=backbone_fn,
        num_classes=num_classes,
        dtype=dtype,
        pack_levels=pack_levels,
        fuse_cls_dim=fuse_cls_dim,
    )


def fuse_detector_params(variables):
    """Convert a standard detector param tree to the fuse_cls_dim layout.

    Replaces the 'classification' and 'regression_dim' head subtrees with
    one 'clsdim' subtree of block-diagonal kernels (exact weight-space
    transform — see heads.fuse_cls_dim_params). Other collections
    (batch_stats etc.) pass through untouched.
    """
    from .heads import fuse_cls_dim_params

    variables = dict(variables)
    params = dict(variables["params"])
    if "clsdim" in params:  # already fused
        return variables
    if "classification" not in params or "regression_dim" not in params:
        raise ValueError(
            "fuse_detector_params expects a standard detector tree with "
            "'classification' and 'regression_dim' head subtrees; got "
            f"{sorted(params)}")
    cls_p = params.pop("classification")
    dim_p = params.pop("regression_dim")
    params["clsdim"] = fuse_cls_dim_params(cls_p, dim_p)
    variables["params"] = params
    return variables
