"""Per-level prediction heads (shared across pyramid levels).

Three heads, matching the reference's submodels
(/root/reference/keras_retinanet_3D/models/retinanet.py:24-167):

  * classification: 4x conv(256)+relu, final conv -> A * 8C channels,
    zero-init kernel + prior-probability bias, sigmoid. Output layout per
    anchor is 8C = [sign-half 0 | sign-half 1], each half indexed 4*c + o.
  * box/keypoint regression: 4x conv(512)+relu, final conv -> A * 12.
    (The reference splits the final conv into five parallel convs of
    4+2+2+2+2 channels and concatenates; one A*12 conv spans the same
    function family with a single MXU matmul, so we fuse it.)
  * dimension regression: 4x conv(128)+relu, final conv -> A * 3C, layout
    per anchor (h, w, l) repeated per class.

All hidden convs use N(0, 0.01) kernels and zero bias like the reference.
Heads output (B, H*W*A, K) per level; callers concatenate over levels.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .common import PRIOR_PROB_BIAS

__all__ = ["ClassificationHead", "BoxRegressionHead", "DimRegressionHead",
           "FusedClsDimHead", "fuse_cls_dim_params"]

_normal01 = nn.initializers.normal(stddev=0.01)


def _tower(x, width, dtype, name_prefix, mask=None):
    """4x conv+relu tower; `mask` re-zeroes inter-level gap pixels so a
    packed multi-level canvas behaves exactly like per-level SAME padding
    (each level's border convs must read zeros, not the neighbouring
    level's bias-coloured gap)."""
    for i in range(4):
        x = nn.Conv(
            width, (3, 3), padding="SAME", dtype=dtype,
            kernel_init=_normal01, bias_init=nn.initializers.zeros,
            name=f"{name_prefix}_{i}",
        )(x)
        x = nn.relu(x)
        if mask is not None:
            x = x * mask
    return x


def _flatten_anchors(x, per_anchor):
    b, h, w, _ = x.shape
    return x.reshape(b, h * w * (x.shape[-1] // per_anchor), per_anchor)


class ClassificationHead(nn.Module):
    num_classes: int = 1
    num_anchors: int = 12
    width: int = 256
    prior: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, flatten: bool = True):
        x = _tower(x, self.width, self.dtype, "cls", mask=mask)
        out_ch = self.num_anchors * 8 * self.num_classes
        x = nn.Conv(
            out_ch, (3, 3), padding="SAME", dtype=self.dtype,
            kernel_init=nn.initializers.zeros, bias_init=PRIOR_PROB_BIAS,
            name="cls_out",
        )(x)
        if not flatten:
            return x  # raw logit map (caller slices/flattens/sigmoids)
        return self.finalize(x)

    def finalize(self, x):
        logits = _flatten_anchors(x, 8 * self.num_classes)
        return nn.sigmoid(logits.astype(jnp.float32))


class BoxRegressionHead(nn.Module):
    num_anchors: int = 12
    width: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, flatten: bool = True):
        x = _tower(x, self.width, self.dtype, "box", mask=mask)
        x = nn.Conv(
            self.num_anchors * 12, (3, 3), padding="SAME", dtype=self.dtype,
            kernel_init=_normal01, bias_init=nn.initializers.zeros,
            name="box_out",
        )(x)
        if not flatten:
            return x
        return self.finalize(x)

    def finalize(self, x):
        return _flatten_anchors(x, 12).astype(jnp.float32)


class DimRegressionHead(nn.Module):
    num_classes: int = 1
    num_anchors: int = 12
    width: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, flatten: bool = True):
        x = _tower(x, self.width, self.dtype, "dim", mask=mask)
        x = nn.Conv(
            self.num_anchors * 3 * self.num_classes, (3, 3), padding="SAME",
            dtype=self.dtype, kernel_init=_normal01,
            bias_init=nn.initializers.zeros, name="dim_out",
        )(x)
        if not flatten:
            return x
        return self.finalize(x)

    def finalize(self, x):
        return _flatten_anchors(x, 3 * self.num_classes).astype(jnp.float32)


class FusedClsDimHead(nn.Module):
    """Classification + dimension heads fused into ONE conv tower.

    Both heads read the SAME pyramid feature, so running them as a single
    (cls_width + dim_width)-wide tower with block-diagonal kernels is
    mathematically identical to running them separately (convolution is
    linear in channels; the off-diagonal blocks are zero, and ReLU is
    elementwise). The win on TPU: half the kernel launches per level, and
    one 384-wide conv keeps the MXU busier than a 256- and a 128-wide conv
    back to back (profiled at 34 / 20 TFLOP/s standalone vs 127 for the
    512-wide box tower — see docs/PERFORMANCE.md).

    FLOP cost of the zero blocks: layer 1 has none (it is a pure
    output-channel concat), layers 2-4 cost (256+128)^2 vs 256^2+128^2 =
    1.8x on those layers, ~+59 GFLOP of the ~600 GFLOP forward at
    512x1408 — worth it when the separate towers run >3x below roofline.

    Inference-only optimization: training and checkpoints keep the
    standard split-head tree; `fuse_cls_dim_params` converts weights.
    """

    num_classes: int = 1
    num_anchors: int = 12
    cls_width: int = 256
    dim_width: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, flatten: bool = True):
        width = self.cls_width + self.dim_width
        x = _tower(x, width, self.dtype, "clsdim", mask=mask)
        cls_ch = self.num_anchors * 8 * self.num_classes
        dim_ch = self.num_anchors * 3 * self.num_classes

        def out_bias_init(key, shape, dtype=jnp.float32):
            # match the split heads' init semantics: prior-probability bias
            # on the classification channels, zeros on the dim channels —
            # a freshly-initialised fused model must behave like a
            # freshly-initialised split model (scores ~prior, not 0.5)
            del key
            bias = jnp.zeros(shape, dtype)
            return bias.at[:cls_ch].set(PRIOR_PROB_BIAS(None, (cls_ch,),
                                                        dtype))

        def out_kernel_init(key, shape, dtype=jnp.float32):
            # block-diagonal like fuse_cls_dim_params: zeros on the
            # classification block (split cls_out uses zero kernels) and
            # normal(0.01) on the dim block reading the dim tower's
            # channels (split dim_out uses _normal01)
            kern = jnp.zeros(shape, dtype)
            dim_block = _normal01(
                key, (shape[0], shape[1], self.dim_width, dim_ch), dtype)
            return kern.at[:, :, self.cls_width:, cls_ch:].set(dim_block)

        x = nn.Conv(
            cls_ch + dim_ch, (3, 3), padding="SAME", dtype=self.dtype,
            kernel_init=out_kernel_init,
            bias_init=out_bias_init, name="clsdim_out",
        )(x)
        if not flatten:
            return x
        return self.finalize(x)

    def finalize(self, x):
        cls_ch = self.num_anchors * 8 * self.num_classes
        cls_map, dim_map = x[..., :cls_ch], x[..., cls_ch:]
        classification = nn.sigmoid(
            _flatten_anchors(cls_map, 8 * self.num_classes)
            .astype(jnp.float32))
        regression_dim = _flatten_anchors(
            dim_map, 3 * self.num_classes).astype(jnp.float32)
        return classification, regression_dim


def _block_diag_conv(k1, k2):
    """Block-diagonal 3x3 conv kernel: [[k1, 0], [0, k2]] over channels."""
    import numpy as np

    kh, kw, c1i, c1o = k1.shape
    _, _, c2i, c2o = k2.shape
    out = np.zeros((kh, kw, c1i + c2i, c1o + c2o), np.float32)
    out[:, :, :c1i, :c1o] = k1
    out[:, :, c1i:, c1o:] = k2
    return out


def fuse_cls_dim_params(cls_params, dim_params):
    """Weight-space transform: split cls/dim head params -> FusedClsDimHead.

    Layer 0 kernels concatenate along the output axis (both towers read the
    full pyramid feature); layers 1-3 and the output conv become
    block-diagonal. Exact — see FusedClsDimHead.
    """
    import numpy as np

    fused = {}
    for i in range(4):
        ck = np.asarray(cls_params[f"cls_{i}"]["kernel"], np.float32)
        dk = np.asarray(dim_params[f"dim_{i}"]["kernel"], np.float32)
        if i == 0:
            kernel = np.concatenate([ck, dk], axis=3)
        else:
            kernel = _block_diag_conv(ck, dk)
        bias = np.concatenate([
            np.asarray(cls_params[f"cls_{i}"]["bias"], np.float32),
            np.asarray(dim_params[f"dim_{i}"]["bias"], np.float32)])
        fused[f"clsdim_{i}"] = {"kernel": jnp.asarray(kernel),
                                "bias": jnp.asarray(bias)}
    fused["clsdim_out"] = {
        "kernel": jnp.asarray(_block_diag_conv(
            np.asarray(cls_params["cls_out"]["kernel"], np.float32),
            np.asarray(dim_params["dim_out"]["kernel"], np.float32))),
        "bias": jnp.asarray(np.concatenate([
            np.asarray(cls_params["cls_out"]["bias"], np.float32),
            np.asarray(dim_params["dim_out"]["bias"], np.float32)])),
    }
    return fused
