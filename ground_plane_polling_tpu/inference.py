"""End-to-end jitted inference: image -> 3D detections.

This is the TPU-native replacement for the reference's "prediction model"
graph (retinanet_bbox, /root/reference/keras_retinanet_3D/models/
retinanet.py:359-422): one pure function, traced once per static
(image shape, plane count) pair, covering

  backbone -> FPN -> heads -> sign-aware box decode -> dim decode
  -> filter/NMS/top-k -> ground-plane polling [-> pose solve].

Outputs mirror the reference's 8 prediction-model outputs
(boxes, dims, scores, labels, orientations, keypoints, keyplanes,
residuals), padded to `max_detections` with -1; pose outputs are optional
extras (the reference solves pose on the host per detection;
here it's device-side vectorized math in the same XLA program).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .models import build_detector
from .ops import anchors as anchor_ops
from .ops import box_coder
from .ops.filtering import (filter_detections_batch,
                            filter_detections_fused_batch)
from .ops.polling import fit_road_planes
from .ops.pose import solve_pose

__all__ = ["DetectionOutput", "decode_predictions", "make_detect_fn",
           "GPPDetector"]


class DetectionOutput(NamedTuple):
    boxes: jax.Array         # (B, M, 12)
    dims: jax.Array          # (B, M, 3)
    scores: jax.Array        # (B, M)
    labels: jax.Array        # (B, M) int32
    orientations: jax.Array  # (B, M) int32
    keypoints: jax.Array     # (B, M, 4, 3)
    keyplanes: jax.Array     # (B, M, 1, 4)
    residuals: jax.Array     # (B, M)
    locations: Optional[jax.Array] = None  # (B, M, 3) if with_pose
    angles: Optional[jax.Array] = None     # (B, M, 3) if with_pose
    pose_dims: Optional[jax.Array] = None  # (B, M, 3) if with_pose


def decode_predictions(raw, anchors, num_classes: int):
    """Raw head outputs -> decoded boxes (B, N, 12) and dims (B, N, 3C).

    The xm/xt side is recovered from the classification argmax: scores in
    the first 4C columns mean 'left of anchor centre'
    (reference layers/_misc.py:133-141).
    """
    cls = raw["classification"]
    if cls.shape[-1] != 8 * num_classes:
        raise ValueError(
            f"classification width {cls.shape[-1]} != 8*num_classes "
            f"({8 * num_classes}) — wrong num_classes for this model")
    half = cls.shape[-1] // 2
    sign = jnp.where(jnp.argmax(cls, axis=-1) < half, -1.0, 1.0)
    boxes = box_coder.decode_boxes(anchors[None], raw["regression"], sign)
    dims = box_coder.decode_dims(raw["regression_dim"])
    return boxes, dims


def make_detect_fn(
    model,
    image_shape,
    num_classes: int = 1,
    with_pose: bool = False,
    class_specific: bool = True,
    orientation_specific: bool = False,
    nms: bool = True,
    score_threshold: float = 0.05,
    max_detections: int = 100,
    nms_threshold: float = 0.5,
    pre_nms_top_k: int = 1024,
    use_pallas_polling="auto",
    fused_decode: bool = True,
    mesh=None,
    shard_spatial: bool = False,
    device_preprocess: bool = False,
    quant_scales=None,
):
    """Build the jitted detect function for a static padded image shape.

    Returned signature: detect(variables, images (B,H,W,3),
    P_inv (B,4,3), planes (B,P,4)) -> DetectionOutput.

    use_pallas_polling selects the VMEM-streaming Pallas kernel for the
    plane-polling stage (numerically identical). "auto" (default) uses it
    for plane databases of >= 1024 planes (one P_TILE): measured ~1.2x
    faster end-to-end at 1024 planes and ~1.75x at 21634 vs the XLA-fused
    formulation (tools/bench_variants.py); pass True/False to force.
    fused_decode defers box/dim decoding past the pre-NMS top-k so only
    ~1k candidates get decoded instead of every anchor (identical outputs).

    mesh: optional jax.sharding.Mesh with a 'data' axis. When given, the
    function is compiled SPMD: parameters replicated, the batch axis of
    images / P_inv / planes (and every output) sharded over the mesh —
    multi-chip serving/eval from the same program (the reference's
    multi_gpu_model covered training only; batch-parallel inference is the
    natural TPU extension). Batch must be divisible by the mesh size.

    shard_spatial (requires mesh): shard the image WIDTH over the mesh
    instead of the batch — single-image latency scaling. XLA GSPMD runs
    the conv trunk spatially partitioned (halo exchanges for the 3x3
    windows inserted automatically); the per-anchor flatten at the head
    outputs re-gathers, so the post-processing (filter/NMS/polling — a
    small fraction of the budget) runs replicated. Outputs are identical
    to the single-device program; batch may be any size (it stays
    unsharded). This has no reference analog — Keras multi_gpu_model
    cannot split one image across devices.

    quant_scales: per-conv-site int8 activation scales from
    models.quantize.collect_scales — runs the conv trunk int8 on the MXU
    (~2x the bf16 FLOP rate on v5e); see models/quantize.py.
    """
    anchors = jnp.asarray(anchor_ops.anchors_for_shape(image_shape))

    if quant_scales is not None:
        from .models.quantize import quantize_apply

        apply_fn = quantize_apply(
            lambda v, im: model.apply(v, im), quant_scales)
    else:
        apply_fn = lambda v, im: model.apply(v, im)

    def pick_poll_fn(n_planes: int):
        use = (n_planes >= 1024 if use_pallas_polling == "auto"
               else bool(use_pallas_polling))
        if use:
            from .kernels.polling_pallas import fit_road_planes_pallas
            return fit_road_planes_pallas
        return fit_road_planes

    filter_kwargs = dict(
        num_classes=num_classes,
        class_specific=class_specific,
        orientation_specific=orientation_specific,
        nms=nms,
        score_threshold=score_threshold,
        max_detections=max_detections,
        nms_threshold=nms_threshold,
        pre_nms_top_k=pre_nms_top_k,
    )

    def detect(variables, images, P_inv, planes) -> DetectionOutput:
        if device_preprocess:
            # images arrive as raw uint8 BGR; cast + caffe-mean subtraction
            # on device. The host resize is uint8-valued, so shipping uint8
            # is lossless and cuts the upload 4x (the reference preprocesses
            # on host, utils/image.py:36-62 — same arithmetic, moved).
            from .data.kitti import BGR_MEAN

            images = images.astype(jnp.float32) - jnp.asarray(BGR_MEAN)
        raw = apply_fn(variables, images)
        if fused_decode:
            det = filter_detections_fused_batch(
                anchors, raw["regression"], raw["regression_dim"],
                raw["classification"], **filter_kwargs)
        else:
            boxes, dims = decode_predictions(raw, anchors, num_classes)
            det = filter_detections_batch(
                boxes, dims, raw["classification"], **filter_kwargs)
        poll = pick_poll_fn(planes.shape[1])(
            det.boxes, det.dims, det.orientations, P_inv, planes)
        out = DetectionOutput(
            boxes=det.boxes, dims=det.dims, scores=det.scores,
            labels=det.labels, orientations=det.orientations,
            keypoints=poll.keypoints, keyplanes=poll.keyplanes,
            residuals=poll.residuals,
        )
        if with_pose:
            pose = solve_pose(poll.keypoints, jnp.maximum(det.orientations, 0),
                              det.dims)
            out = out._replace(locations=pose.locations, angles=pose.angles,
                               pose_dims=pose.dimensions)
        return out

    if mesh is None:
        if shard_spatial:
            raise ValueError("shard_spatial requires a mesh")
        return jax.jit(detect)

    from jax.sharding import NamedSharding, PartitionSpec as P

    replicated = NamedSharding(mesh, P())
    if shard_spatial:
        # images (B, H, W, 3): width over the mesh; everything else (and
        # all outputs) replicated — GSPMD partitions the conv trunk and
        # re-gathers at the head flatten.
        width_sharded = NamedSharding(mesh, P(None, None, "data", None))
        return jax.jit(
            detect,
            in_shardings=(replicated, width_sharded, replicated, replicated),
            out_shardings=replicated,
        )
    batched = NamedSharding(mesh, P("data"))
    return jax.jit(
        detect,
        in_shardings=(replicated, batched, batched, batched),
        out_shardings=batched,
    )


class GPPDetector:
    """Convenience wrapper bundling model + params + jitted detect fns.

    Detect functions are cached per (batch, image shape, plane count) so
    repeated calls at the same padded shapes reuse the compiled program.
    """

    def __init__(self, backbone: str = "resnet50", num_classes: int = 1,
                 dtype: Any = jnp.float32, fuse_towers: bool = False,
                 device_preprocess: bool = True, **filter_kwargs):
        """fuse_towers runs the cls+dim heads as one block-diagonal tower
        (exact same outputs, fewer/wider convs — see heads.FusedClsDimHead);
        weights loaded from standard checkpoints are converted on load.

        device_preprocess (default True) uploads raw uint8 BGR images and
        does the cast + caffe-mean subtraction on device — bit-identical
        (the host resize output is uint8-valued) with a 4x smaller
        host->device payload. Only affects detect_image / __call__ when
        given uint8 input; pass False to feed host-preprocessed f32."""
        self.model = build_detector(backbone, num_classes=num_classes,
                                    dtype=dtype, fuse_cls_dim=fuse_towers)
        self.backbone = backbone
        self.num_classes = num_classes
        self.fuse_towers = fuse_towers
        self.device_preprocess = device_preprocess
        self.filter_kwargs = filter_kwargs
        self.variables = None
        self._fns = {}
        self._quant_scales = None

    @property
    def quant_scales(self):
        """Per-conv-site int8 activation scales (None = float path)."""
        return self._quant_scales

    @quant_scales.setter
    def quant_scales(self, value):
        # assigning scales (or None) invalidates every compiled detect fn:
        # the quantization config is baked into the traced program, so a
        # stale cache would silently serve the previous config
        self._quant_scales = value
        self._fns.clear()

    def quantize(self, calib_images, percentile: float = 100.0):
        """Calibrate and enable the int8 conv trunk (models/quantize.py).

        calib_images: iterable of PREPROCESSED float32 (B, H, W, 3) network
        inputs (BGR, caffe means subtracted) — the same distribution the
        network sees at inference; a handful of representative images
        suffices. Shapes may vary between entries (the per-site scales are
        shape-independent). Subsequent calls run int8; pass None scales by
        setting .quant_scales = None to go back to float."""
        from .models.quantize import collect_scales

        if self.variables is None:
            raise RuntimeError("call .init() or load weights first")
        fn = lambda v, im: self.model.apply(v, im)
        self.quant_scales = collect_scales(
            fn, [(self.variables, jnp.asarray(im, jnp.float32))
                 for im in calib_images], percentile=percentile)
        return self.quant_scales

    def init(self, rng, image_shape):
        x = jnp.zeros((1, *image_shape, 3), jnp.float32)
        self.variables = self.model.init(rng, x)
        return self.variables

    def load(self, weights_path: str):
        """Load exported .npz inference weights (convert-model artifact) or
        a reference Keras .h5 checkpoint (mapped via models.h5_import)."""
        if weights_path.endswith((".h5", ".hdf5")):
            from .models.h5_import import load_reference_h5

            self.variables = load_reference_h5(weights_path,
                                               backbone=self.backbone)
        else:
            from .training.checkpoint import import_params

            self.variables = import_params(weights_path)
        if self.fuse_towers:
            from .models import fuse_detector_params

            self.variables = fuse_detector_params(self.variables)
        return self.variables

    def __call__(self, images, P_inv, planes, with_pose: bool = False):
        if self.variables is None:
            raise RuntimeError("call .init() or load weights first")
        # dtype check only — no np.asarray, which would pull a jax array
        # back to the host just to inspect it
        device_pre = (self.device_preprocess
                      and images.dtype == np.uint8)
        key = (images.shape[1:3], bool(with_pose), device_pre)
        if key not in self._fns:
            self._fns[key] = make_detect_fn(
                self.model, images.shape[1:3], num_classes=self.num_classes,
                with_pose=with_pose, device_preprocess=device_pre,
                quant_scales=self.quant_scales,
                **self.filter_kwargs)
        return self._fns[key](self.variables, images, P_inv, planes)

    def detect_image(self, image_bgr, P, planes, with_pose: bool = True,
                     min_side: int = 800, max_side: int = 1333,
                     pad_multiple: int = 32, score_threshold: float = 0.05):
        """Detect on one raw BGR image with a (3, 4) calibration.

        Handles the full host-side contract of the reference's
        run_network loop (resize to min/max side, calibration rescale,
        pinv, padding, and mapping boxes back to raw-image pixels).
        Returns a dict of numpy arrays for the detections above
        `score_threshold`.
        """
        from .data.kitti import preprocess_image, resize_scale
        from .data.pipeline import _resize_image

        # this threshold only post-filters rows the COMPILED filter kept;
        # candidates below the jitted filter's own score_threshold were
        # already dropped inside the program
        compiled_thr = self.filter_kwargs.get("score_threshold", 0.05)
        if score_threshold < compiled_thr:
            import warnings

            warnings.warn(
                f"detect_image score_threshold={score_threshold} is below "
                f"the compiled filter's threshold ({compiled_thr}); "
                "candidates in between were already dropped on device — "
                "build the detector with "
                f"score_threshold={score_threshold} to get them",
                stacklevel=2)

        image_bgr = np.asarray(image_bgr, np.float32)
        scale = resize_scale(image_bgr.shape[:2], min_side, max_side)
        resized = _resize_image(image_bgr, scale)
        ph = int(np.ceil(resized.shape[0] / pad_multiple)) * pad_multiple
        pw = int(np.ceil(resized.shape[1] / pad_multiple)) * pad_multiple
        if self.device_preprocess:
            from .data.pipeline import uint8_canvas

            net_in = uint8_canvas(resized, ph, pw)[None]
        else:
            padded = np.zeros((ph, pw, 3), np.float32)
            padded[: resized.shape[0], : resized.shape[1]] = resized
            net_in = preprocess_image(padded)[None]

        P_scaled = np.diag([scale, scale, 1.0]) @ np.asarray(P)
        P_inv = np.linalg.pinv(P_scaled)

        out = self(
            jnp.asarray(net_in),
            jnp.asarray(P_inv[None], jnp.float32),
            jnp.asarray(np.asarray(planes)[None], jnp.float32),
            with_pose=with_pose)

        keep = np.asarray(out.scores[0]) > score_threshold
        result = {
            "boxes": np.asarray(out.boxes[0])[keep] / scale,
            "dims": np.asarray(out.dims[0])[keep],
            "scores": np.asarray(out.scores[0])[keep],
            "labels": np.asarray(out.labels[0])[keep],
            "orientations": np.asarray(out.orientations[0])[keep],
            "keypoints3d": np.asarray(out.keypoints[0])[keep],
            "keyplanes": np.asarray(out.keyplanes[0])[keep],
            "residuals": np.asarray(out.residuals[0])[keep],
        }
        if with_pose:
            result["locations"] = np.asarray(out.locations[0])[keep]
            result["angles"] = np.asarray(out.angles[0])[keep]
            result["pose_dims"] = np.asarray(out.pose_dims[0])[keep]
        return result
