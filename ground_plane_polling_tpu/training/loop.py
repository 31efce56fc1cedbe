"""High-level training orchestration: epochs, eval callback, checkpoints,
LR plateau, metric logging.

Covers the reference's fit_generator + callback stack
(/root/reference/keras_retinanet_3D/bin/train.py:125-195,383-391 and
callbacks/eval.py): per-epoch validation mAP (averaged over present
class-orientation buckets) + keypoint/h/w/l L1 errors, per-epoch
checkpoints, ReduceLROnPlateau on the train loss, and JSONL metric logging
(the TensorBoard-equivalent artifact for this framework).
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Optional

import jax
import numpy as np

from ..inference import make_detect_fn
from ..utils.eval import (bucket_annotations, bucket_detections,
                          evaluate_detections)
from .checkpoint import (AsyncCheckpointSaver, prune_checkpoints,
                         save_checkpoint)
from .schedule import ReduceLROnPlateau
from .train import TrainState

__all__ = ["evaluate_model", "fit"]


def evaluate_model(model, state: TrainState, loader, num_classes: int = 1,
                   score_threshold: float = 0.05, max_detections: int = 100,
                   iou_threshold: float = 0.5, mesh=None,
                   eval_batch: int = 1, int8_calib: int = 0,
                   int8_percentile: float = 100.0,
                   **detect_kwargs):
    """Full validation sweep -> (mean_ap, errors dict, per-bucket APs).

    With `mesh`, images of the same padded shape are grouped into mesh-sized
    batches and the detect function runs SPMD with the batch axis sharded
    over the 'data' mesh axis (short final groups are padded by repeating
    the last item; the padding rows are discarded host-side). Results are
    identical to the batch-1 sweep — the reference's eval was strictly
    per-image (utils/eval.py:82-91); this is the TPU-native widening.

    Without a mesh, `eval_batch` groups same-shape images into
    single-device batches the same way (batch >= 4 measures ~30% higher
    throughput than batch 1 on the chip — docs/PERFORMANCE.md); results
    are identical.
    """
    detect_fns = {}
    # device_preprocess default: decided from the first item's image dtype
    # (uint8 -> device-side BGR-mean subtraction; float inputs are already
    # host-preprocessed and must NOT be mean-subtracted again). An explicit
    # caller kwarg wins — no duplicate-kwarg TypeError, no silent double
    # preprocessing.
    device_preprocess = detect_kwargs.pop("device_preprocess", None)

    def get_detect(shape, image_dtype):
        dp = device_preprocess
        if dp is None:
            dp = np.dtype(image_dtype) == np.uint8
            if not dp:
                import warnings
                warnings.warn(
                    "evaluate_model: float eval images are assumed to be "
                    "already preprocessed (device-side BGR-mean "
                    "subtraction disabled). If your loader yields RAW "
                    "float BGR images, pass device_preprocess=True.",
                    stacklevel=3)
        key = (shape, dp)
        if key not in detect_fns:
            detect_fns[key] = make_detect_fn(
                model, shape, num_classes=num_classes,
                score_threshold=score_threshold,
                max_detections=max_detections, mesh=mesh,
                device_preprocess=dp, **detect_kwargs)
        return detect_fns[key]

    variables = {"params": state.params, "frozen": state.frozen}

    if int8_calib:
        # int8 PTQ sweep: calibrate activation scales on the first
        # int8_calib eval images, then run the conv trunk int8
        # (models/quantize.py). Accuracy cost measured in
        # docs/PERFORMANCE.md; parity evals should stay float.
        import itertools

        from ..models.quantize import collect_scales_uint8

        canvases = [item["image"] for item in
                    itertools.islice(loader.eval_inputs(), int8_calib)]
        detect_kwargs["quant_scales"] = collect_scales_uint8(
            model, variables, canvases, percentile=int8_percentile)

    group_size = int(mesh.devices.size) if mesh is not None else \
        max(int(eval_batch), 1)

    detections, annotations = [], []

    def dispatch(shape, items):
        """Async dispatch of one group; results stay on device until
        finalize() — keeping one group in flight overlaps the next group's
        host prep + dispatch with this group's compute + transfer."""
        n = len(items)
        # short final groups are padded by repeating the last item: the
        # detect graph's batch dim is static (group_size), so a smaller
        # tail batch would mean a second compile, and masking would not
        # reduce the device work either — repeat-padding is the cheapest
        # correct option (padding rows discarded in finalize()).
        items = items + [items[-1]] * (group_size - n)
        out = get_detect(shape, items[0]["image"].dtype)(
            variables,
            np.concatenate([it["image"] for it in items], axis=0),
            np.concatenate([it["P_inv"] for it in items], axis=0),
            np.concatenate([it["planes"] for it in items], axis=0))
        return n, items, out

    def finalize(flight):
        n, items, out = flight
        boxes = np.asarray(out.boxes)
        dims = np.asarray(out.dims)
        scores = np.asarray(out.scores)
        labels = np.asarray(out.labels)
        orients = np.asarray(out.orientations)
        for j in range(n):
            scale = items[j]["scale"]
            detections.append(bucket_detections(
                boxes[j] / scale, dims[j], scores[j], labels[j], orients[j],
                num_classes))
            annotations.append(bucket_annotations(
                np.asarray(items[j]["annotations"]) /
                np.array([scale] * 12 + [1.0] * 5), num_classes))

    in_flight = None
    def process(shape, items):
        nonlocal in_flight
        dispatched = dispatch(shape, items)
        if in_flight is not None:
            finalize(in_flight)
        in_flight = dispatched

    pending = {}
    for item in loader.eval_inputs():
        shape = tuple(item["image"].shape[1:3])
        pending.setdefault(shape, []).append(item)
        if len(pending[shape]) == group_size:
            process(shape, pending.pop(shape))
    for shape, items in pending.items():
        process(shape, items)
    if in_flight is not None:
        finalize(in_flight)

    aps, kp_err, h_err, w_err, l_err = evaluate_detections(
        detections, annotations, 4 * num_classes, iou_threshold)
    present = [ap for ap, n in aps.values() if n > 0]
    mean_ap = float(np.mean(present)) if present else 0.0
    errors = {"keypoint_error": kp_err, "height_error": h_err,
              "width_error": w_err, "length_error": l_err}
    return mean_ap, errors, aps


def fit(model, state: TrainState, train_step: Callable, train_loader,
        epochs: int = 50, steps_per_epoch: Optional[int] = None,
        val_loader=None, num_classes: int = 1,
        checkpoint_dir: Optional[str] = None,
        log_path: Optional[str] = None,
        tensorboard_dir: Optional[str] = None,
        lr_schedule: Optional[ReduceLROnPlateau] = None,
        verbose: bool = True,
        nan_guard: bool = True,
        keep_checkpoints: int = 5,
        checkpoint_every: int = 1,
        eval_mesh=None,
        async_checkpoints: bool = True):
    """Run the training loop; returns the final TrainState.

    nan_guard: failure detection — a non-finite loss aborts the run with a
    clear error (after flushing logs) instead of silently corrupting the
    parameters and every subsequent checkpoint.

    async_checkpoints: overlap each snapshot's device->host params pull
    with the next epoch's training (AsyncCheckpointSaver); the in-flight
    save is joined before the next snapshot and before fit() returns, so
    the returned state is always durably checkpointed.
    """
    # keep_checkpoints <= 0 disables pruning (prune_checkpoints treats it
    # the same way) — snapshots then accumulate unboundedly, by request
    lr_schedule = lr_schedule or ReduceLROnPlateau()
    saver = AsyncCheckpointSaver() if async_checkpoints else None
    if log_path and os.path.dirname(log_path):
        # snapshot dirs are created by orbax; the JSONL log dir must not
        # be the one path the caller has to pre-create by hand
        os.makedirs(os.path.dirname(log_path), exist_ok=True)
    log_f = open(log_path, "a") if log_path else None
    tb_writer = None
    if tensorboard_dir:
        from ..utils.tensorboard import TensorBoardWriter
        tb_writer = TensorBoardWriter(tensorboard_dir)

    def log(record):
        if log_f:
            log_f.write(json.dumps(record) + "\n")
            log_f.flush()
        if tb_writer and "epoch" in record:
            tb_writer.add_scalars(
                {k: v for k, v in record.items() if k != "epoch"},
                record["epoch"])
            tb_writer.flush()
        if verbose:
            # 6 significant digits, not fixed decimals: round(1e-6, 5)
            # prints a reduced LR as a misleading 0.0
            printable = {k: (float(f"{v:.6g}") if isinstance(v, float)
                             else v)
                         for k, v in record.items()}
            print(printable, flush=True)

    try:
        for epoch in range(epochs):
            t0 = time.time()
            losses = []
            it = iter(train_loader.epoch())
            step_count = steps_per_epoch or len(train_loader)
            for _ in range(step_count):
                try:
                    batch = next(it)
                except StopIteration:
                    it = iter(train_loader.epoch())
                    try:
                        batch = next(it)
                    except StopIteration:
                        # a bare StopIteration would escape (or be
                        # swallowed by an iterating caller) — fail loudly
                        raise RuntimeError(
                            "training loader yielded no batches — empty "
                            "dataset or a failed input pipeline") from None
                state, metrics = train_step(state, batch)
                losses.append(metrics)
            if not losses:
                raise RuntimeError(
                    "epoch ran zero steps (steps_per_epoch=0 or empty "
                    "loader) — nothing to train on")
            per_step = {k: [float(m[k]) for m in losses] for k in losses[0]}
            if nan_guard and not all(np.isfinite(per_step["loss"])):
                bad = int(np.argmax(~np.isfinite(per_step["loss"])))
                log({"epoch": epoch, "error": "non-finite loss",
                     "first_bad_step": bad,
                     "loss_values": per_step["loss"]})
                raise FloatingPointError(
                    f"non-finite loss in epoch {epoch} (first at step "
                    f"{bad}); aborting before checkpointing corrupt state")
            losses = {k: float(np.mean(v)) for k, v in per_step.items()}
            record = {"epoch": epoch, "lr": float(state.lr),
                      "seconds": round(time.time() - t0, 2), **losses}

            if val_loader is not None:
                mean_ap, errors, _ = evaluate_model(
                    model, state, val_loader, num_classes=num_classes,
                    mesh=eval_mesh)
                record.update({"mAP": mean_ap, **errors})

            state, reduced = lr_schedule.update(state, losses["loss"])
            if reduced:
                record["lr_reduced_to"] = float(state.lr)

            # checkpoint_every thins the per-epoch saves (each one pulls
            # the full params/opt-state off-device — expensive on a
            # remote-attached chip); the final epoch always checkpoints
            if checkpoint_dir and (
                    (epoch + 1) % max(checkpoint_every, 1) == 0
                    or epoch == epochs - 1):
                if saver is not None:
                    # join the previous save and prune BEFORE starting the
                    # new one: every dir pruning sees is complete, and a
                    # crash mid-write always leaves the last completed
                    # checkpoint on disk (disk briefly holds keep+1)
                    saver.wait()
                    prune_checkpoints(checkpoint_dir, keep=keep_checkpoints)
                    record["checkpoint"] = saver.save(checkpoint_dir, state)
                else:
                    record["checkpoint"] = save_checkpoint(
                        checkpoint_dir, state)
                    prune_checkpoints(checkpoint_dir, keep=keep_checkpoints)
            log(record)
    finally:
        if saver is not None:
            saver.wait()
            if checkpoint_dir:  # the final save skipped its own prune
                prune_checkpoints(checkpoint_dir, keep=keep_checkpoints)
        if log_f:
            log_f.close()
        if tb_writer:
            tb_writer.close()
    return state
