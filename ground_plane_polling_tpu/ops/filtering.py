"""Detection filtering: sign-collapse, orientation/class selection,
score threshold, greedy NMS, top-k — all with static shapes.

Reproduces /root/reference/keras_retinanet_3D/layers/filter_detections.py
(score threshold 0.05 -> tf NMS IoU 0.5 -> top-k <= 100 -> pad with -1) as a
single jit-compiled program. Where the reference uses dynamic-shape where/
gather plus a tf.map_fn batch loop, this implementation is mask-based:

  * candidates below the score threshold get score -inf and can never be
    selected;
  * NMS is exact greedy suppression computed as a FIXPOINT ITERATION —
    each round one (K, K) @ (K,) matvec on the MXU, converging in
    suppression-chain-depth rounds (see _greedy_nms; a serial
    reference implementation is kept as _greedy_nms_serial);
  * the per-class / per-orientation "loops" are a vmap over a static axis;
  * batch parallelism is jax.vmap (free under XLA) instead of tf.map_fn.

A pre-NMS top-k (default 1024) bounds the candidate set; the reference
feeds every anchor above threshold into tf NMS, so in the (pathological)
case where >top_k anchors pass 0.05 and the top-100 survivors include a
candidate ranked below the cap, results could differ — raise
`pre_nms_top_k` for bit-exact behaviour at a bandwidth cost.

Output layout per image (padded with -1 like the reference):
  boxes (M, 12), dims (M, 3), scores (M,), labels (M,) int32,
  orientations (M,) int32.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .overlap import iou_matrix, iou_one_to_many

__all__ = ["Detections", "filter_detections", "filter_detections_batch",
           "filter_detections_fused", "filter_detections_fused_batch"]

_NEG_INF = -jnp.inf


class Detections(NamedTuple):
    boxes: jax.Array         # (M, 12)
    dims: jax.Array          # (M, 3)
    scores: jax.Array        # (M,)
    labels: jax.Array        # (M,) int32
    orientations: jax.Array  # (M,) int32


def _greedy_nms_serial(boxes4, scores, max_out: int, iou_threshold: float):
    """Exact greedy NMS as a sequential selection loop.

    Args
      boxes4: (K, 4); scores: (K,) with -inf marking invalid candidates.
    Returns (idx (max_out,), valid (max_out,), score (max_out,)).
    """
    def body(i, carry):
        work, out_idx, out_valid, out_score = carry
        j = jnp.argmax(work)
        s = work[j]
        valid = s > _NEG_INF
        ious = iou_one_to_many(boxes4[j], boxes4)
        suppress = valid & (ious > iou_threshold)
        work = jnp.where(suppress, _NEG_INF, work)
        work = work.at[j].set(_NEG_INF)
        out_idx = out_idx.at[i].set(j)
        out_valid = out_valid.at[i].set(valid)
        out_score = out_score.at[i].set(s)
        return work, out_idx, out_valid, out_score

    k = scores.shape[0]
    init = (
        scores,
        jnp.zeros(max_out, jnp.int32),
        jnp.zeros(max_out, bool),
        jnp.full(max_out, _NEG_INF, scores.dtype),
    )
    _, idx, valid, score = jax.lax.fori_loop(0, min(max_out, k), body, init)
    return idx, valid, score


def _greedy_nms(boxes4, scores, max_out: int, iou_threshold: float):
    """Exact greedy NMS via fixpoint iteration — the TPU-friendly form.

    Greedy NMS's keep set is the unique solution of
        keep_i = valid_i AND no kept higher-ranked j overlaps i
    over candidates ranked by score. Iterating that equation converges in
    (suppression-chain depth) rounds — typically 2-4 on detection data —
    and each round is ONE (K, K) @ (K,) matvec on the MXU, instead of the
    serial 100-step argmax/suppress loop (which costs ~10 ms on TPU from
    sequential small-op latency; this costs ~0.2 ms).

    Candidates must arrive sorted by descending score (jax.lax.top_k output
    satisfies this; ties break by original index like tf NMS).
    """
    k = scores.shape[0]
    valid0 = scores > _NEG_INF

    iou = iou_matrix(boxes4, boxes4)
    order = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    rank = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    # suppressor[j, i]: higher-ranked j overlaps i enough to kill it
    suppressor = ((order < rank) & (iou > iou_threshold)
                  & valid0[:, None]).astype(jnp.float32)

    def cond(state):
        keep, prev = state
        return jnp.any(keep != prev)

    def body(state):
        keep, _ = state
        hit = suppressor.T @ keep.astype(jnp.float32)  # (K,)
        new = valid0 & (hit == 0.0)
        return new, keep

    keep, _ = jax.lax.while_loop(cond, body, (valid0, ~valid0))

    # first max_out kept candidates, in score order
    kept_rank = jnp.where(
        keep, jnp.cumsum(keep.astype(jnp.int32)) - 1, k + max_out)
    slots = jnp.arange(max_out)
    # idx[s] = candidate whose kept_rank == s (out-of-range ranks drop)
    idx = jnp.zeros(max_out, jnp.int32).at[kept_rank].set(
        jnp.arange(k, dtype=jnp.int32), mode="drop")
    n_kept = jnp.sum(keep.astype(jnp.int32))
    valid = slots < jnp.minimum(n_kept, max_out)
    score = jnp.where(valid, scores[idx], _NEG_INF)
    return idx, valid, score


def _one_candidate_set(boxes, scores, score_threshold, nms, nms_threshold,
                       max_detections, pre_nms_top_k):
    """Threshold + (optional) NMS for one score vector over all anchors.

    Returns (anchor_idx (M,), valid (M,), score (M,)).

    Exact top_k only: jax.lax.approx_max_k was benchmarked here and lost
    (85 vs 116 img/s e2e, round-1 sweep) and the round-2 sub-profile puts
    exact top_k at 0.084 ms — the approximate lever is measured-dead, so
    the flag was removed (docs/PERFORMANCE.md "Levers not yet pulled").
    """
    masked = jnp.where(scores > score_threshold, scores, _NEG_INF)
    k = min(pre_nms_top_k, masked.shape[0])
    top_scores, top_idx = jax.lax.top_k(masked, k)
    if nms:
        sel, valid, sel_scores = _greedy_nms(
            boxes[top_idx, :4], top_scores, max_detections, nms_threshold)
        return top_idx[sel], valid, sel_scores
    m = min(max_detections, k)
    return top_idx[:m], top_scores[:m] > _NEG_INF, top_scores[:m]


@functools.partial(
    jax.jit,
    static_argnames=("num_classes", "class_specific", "orientation_specific",
                     "nms", "max_detections", "pre_nms_top_k"),
)
def filter_detections(
    boxes,
    dims,
    classification,
    num_classes: int = 1,
    class_specific: bool = True,
    orientation_specific: bool = False,
    nms: bool = True,
    score_threshold: float = 0.05,
    max_detections: int = 100,
    nms_threshold: float = 0.5,
    pre_nms_top_k: int = 1024,
) -> Detections:
    """Filter one image's raw predictions into padded detections.

    Args
      boxes:          (N, 12) decoded boxes+keypoints.
      dims:           (N, 3C) decoded per-class dimensions.
      classification: (N, 8C) sigmoid scores
                      (layout [sign0 | sign1], each half indexed 4*c + o).
    """
    n = boxes.shape[0]
    c = num_classes

    # collapse sign halves, then split per-orientation: (N, C, 4)
    cls = classification.reshape(n, 2, c, 4).max(axis=1)

    def run_sets(score_list):
        """score_list: list of (scores (N,), labels (N,), orients (N,))."""
        cand_idx, cand_valid, cand_score, cand_label, cand_orient = \
            [], [], [], [], []
        for scores, labels, orients in score_list:
            idx, valid, score = _one_candidate_set(
                boxes, scores, score_threshold, nms, nms_threshold,
                max_detections, pre_nms_top_k)
            cand_idx.append(idx)
            cand_valid.append(valid)
            cand_score.append(score)
            cand_label.append(labels[idx])
            cand_orient.append(orients[idx])
        return (jnp.concatenate(cand_idx), jnp.concatenate(cand_valid),
                jnp.concatenate(cand_score), jnp.concatenate(cand_label),
                jnp.concatenate(cand_orient))

    if orientation_specific:
        sets = []
        for o in range(4):
            if class_specific:
                for ci in range(c):
                    sets.append((
                        cls[:, ci, o],
                        jnp.full(n, ci, jnp.int32),
                        jnp.full(n, o, jnp.int32),
                    ))
            else:
                sets.append((
                    cls[:, :, o].max(axis=1),
                    cls[:, :, o].argmax(axis=1).astype(jnp.int32),
                    jnp.full(n, o, jnp.int32),
                ))
    else:
        best_orient = cls.argmax(axis=2).astype(jnp.int32)  # (N, C)
        best_score = cls.max(axis=2)                        # (N, C)
        if class_specific:
            sets = [
                (best_score[:, ci], jnp.full(n, ci, jnp.int32),
                 best_orient[:, ci])
                for ci in range(c)
            ]
        else:
            lab = best_score.argmax(axis=1).astype(jnp.int32)
            sets = [(
                best_score.max(axis=1),
                lab,
                jnp.take_along_axis(best_orient, lab[:, None], axis=1)[:, 0],
            )]

    idx, valid, score, label, orient = run_sets(sets)

    # global top-k over pooled candidates. The pool can be SHORTER than
    # max_detections (nms=False contributes min(pre_nms_top_k,
    # max_detections) rows per set): take what exists and pad with -inf
    # rows, which the `keep` mask below turns into -1 output rows (the
    # reference pads the same way, filter_detections.py:105-118).
    pooled = jnp.where(valid, score, _NEG_INF)
    k = min(max_detections, pooled.shape[0])
    top_score, top = jax.lax.top_k(pooled, k)
    if k < max_detections:
        pad = max_detections - k
        top_score = jnp.concatenate(
            [top_score, jnp.full((pad,), _NEG_INF, top_score.dtype)])
        top = jnp.concatenate([top, jnp.zeros((pad,), top.dtype)])
    keep = top_score > _NEG_INF

    sel_anchor = idx[top]
    sel_label = label[top]
    out_boxes = jnp.where(keep[:, None], boxes[sel_anchor], -1.0)
    dims_c = dims.reshape(n, c, 3)[sel_anchor, sel_label]
    out = Detections(
        boxes=out_boxes,
        dims=jnp.where(keep[:, None], dims_c, -1.0),
        scores=jnp.where(keep, top_score, -1.0),
        labels=jnp.where(keep, sel_label, -1).astype(jnp.int32),
        orientations=jnp.where(keep, orient[top], -1).astype(jnp.int32),
    )
    return out


def filter_detections_batch(boxes, dims, classification, **kw):
    """vmap over the batch axis (replaces the reference's tf.map_fn)."""
    fn = functools.partial(filter_detections, **kw)
    return jax.vmap(fn)(boxes, dims, classification)


# ---------------------------------------------------------------------------
# fused select-then-decode path
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("num_classes", "class_specific", "orientation_specific",
                     "nms", "max_detections", "pre_nms_top_k"),
)
def filter_detections_fused(
    anchors,
    deltas,
    dims_raw,
    classification,
    num_classes: int = 1,
    class_specific: bool = True,
    orientation_specific: bool = False,
    nms: bool = True,
    score_threshold: float = 0.05,
    max_detections: int = 100,
    nms_threshold: float = 0.5,
    pre_nms_top_k: int = 1024,
) -> Detections:
    """filter_detections with box/dim decoding DEFERRED past candidate
    selection: scores depend only on the classification output, so the
    pre-NMS top-k can run first and the (mean/std un-normalization, anchor
    arithmetic, sign resolution) runs on ~1k candidates instead of ~245k
    anchors. Numerically identical outputs; saves ~1 ms and ~12x the
    decode bandwidth at KITTI scale.

    Args
      anchors: (N, 4); deltas: (N, 12) raw regression; dims_raw: (N, 3C)
      raw dim regression; classification: (N, 8C) sigmoid scores.
    """
    from . import box_coder

    n = anchors.shape[0]
    c = num_classes
    cls = classification.reshape(n, 2, c, 4).max(axis=1)

    def decode_candidates(idx):
        cls_rows = classification[idx]
        sign = jnp.where(
            jnp.argmax(cls_rows, axis=-1) < 4 * c, -1.0, 1.0)
        return box_coder.decode_boxes(anchors[idx], deltas[idx], sign)

    def run_set(scores, labels, orients):
        masked = jnp.where(scores > score_threshold, scores, _NEG_INF)
        k = min(pre_nms_top_k, n)
        top_scores, top_idx = jax.lax.top_k(masked, k)
        cand_boxes = decode_candidates(top_idx)
        if nms:
            sel, valid, sel_scores = _greedy_nms(
                cand_boxes[:, :4], top_scores, max_detections, nms_threshold)
            return (top_idx[sel], cand_boxes[sel], valid, sel_scores,
                    labels[top_idx[sel]], orients[top_idx[sel]])
        m = min(max_detections, k)
        return (top_idx[:m], cand_boxes[:m], top_scores[:m] > _NEG_INF,
                top_scores[:m], labels[top_idx[:m]], orients[top_idx[:m]])

    if orientation_specific:
        sets = []
        for o in range(4):
            if class_specific:
                for ci in range(c):
                    sets.append((cls[:, ci, o], jnp.full(n, ci, jnp.int32),
                                 jnp.full(n, o, jnp.int32)))
            else:
                sets.append((cls[:, :, o].max(axis=1),
                             cls[:, :, o].argmax(axis=1).astype(jnp.int32),
                             jnp.full(n, o, jnp.int32)))
    else:
        best_orient = cls.argmax(axis=2).astype(jnp.int32)
        best_score = cls.max(axis=2)
        if class_specific:
            sets = [(best_score[:, ci], jnp.full(n, ci, jnp.int32),
                     best_orient[:, ci]) for ci in range(c)]
        else:
            lab = best_score.argmax(axis=1).astype(jnp.int32)
            sets = [(best_score.max(axis=1), lab,
                     jnp.take_along_axis(best_orient, lab[:, None],
                                         axis=1)[:, 0])]

    parts = [run_set(*s) for s in sets]
    idx = jnp.concatenate([p[0] for p in parts])
    cand_boxes = jnp.concatenate([p[1] for p in parts])
    valid = jnp.concatenate([p[2] for p in parts])
    score = jnp.concatenate([p[3] for p in parts])
    label = jnp.concatenate([p[4] for p in parts])
    orient = jnp.concatenate([p[5] for p in parts])

    # short pools padded with -inf exactly like filter_detections above
    pooled = jnp.where(valid, score, _NEG_INF)
    k = min(max_detections, pooled.shape[0])
    top_score, top = jax.lax.top_k(pooled, k)
    if k < max_detections:
        pad = max_detections - k
        top_score = jnp.concatenate(
            [top_score, jnp.full((pad,), _NEG_INF, top_score.dtype)])
        top = jnp.concatenate([top, jnp.zeros((pad,), top.dtype)])
    keep = top_score > _NEG_INF

    sel_anchor = idx[top]
    sel_label = label[top]
    dims_sel = box_coder.decode_dims(
        dims_raw[sel_anchor].reshape(max_detections, c, 3)[
            jnp.arange(max_detections), sel_label])
    return Detections(
        boxes=jnp.where(keep[:, None], cand_boxes[top], -1.0),
        dims=jnp.where(keep[:, None], dims_sel, -1.0),
        scores=jnp.where(keep, top_score, -1.0),
        labels=jnp.where(keep, sel_label, -1).astype(jnp.int32),
        orientations=jnp.where(keep, orient[top], -1).astype(jnp.int32),
    )


def filter_detections_fused_batch(anchors, deltas, dims_raw, classification,
                                  **kw):
    fn = functools.partial(filter_detections_fused, **kw)
    return jax.vmap(fn, in_axes=(None, 0, 0, 0))(
        anchors, deltas, dims_raw, classification)
