"""Fixed-shape NMS for TPU — masked, static-size, jit-native.

Reference parity: `lib/utils/cython_nms.pyx` (greedy NMS + soft-NMS), called
from `GenerateProposalsOp` and `box_results_with_nms_and_limit` (SURVEY.md
§2.2, §3.2). The reference suppresses on host in Cython with dynamic output
counts; on TPU the whole thing stays in the XLA graph with a static budget:

    keep_idx, keep_mask = nms_fixed(boxes, scores, thresh, max_out, valid)

Algorithm: precompute the IoU matrix once (N ≤ ~2000, so N² f32 fits
VMEM-scale working sets), then `max_out` pick-and-suppress steps
(lax.scan): take the highest-scoring alive box, kill everything it
overlaps. That is exactly the greedy semantics of the Cython original
truncated at the output budget — and the sequential trip count is
`max_out` (e.g. 300), not N (e.g. 1000), which matters on TPU where loop
iterations dominate the in-graph NMS cost (r2 trace: the NMS whiles were
~37% of inference device time).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .boxes import bbox_overlaps

_NEG_INF = -1e10


@partial(jax.jit, static_argnames=("max_out",))
def nms_fixed(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_thresh: float,
    max_out: int,
    valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS with a static output budget.

    Args:
      boxes: (N, 4) x1y1x2y2.
      scores: (N,).
      iou_thresh: suppression threshold (strictly-greater comparison, matching
        the Cython reference's `ovr > thresh`).
      max_out: static number of survivors returned.
      valid: optional (N,) bool; invalid rows can never be kept.

    Returns:
      (keep_idx, keep_mask): (max_out,) int32 indices into the input arrays in
      descending score order, and (max_out,) bool marking real survivors.
      Masked-out slots point at index 0 — consumers must apply the mask.
    """
    n = boxes.shape[0]
    scores = jnp.asarray(scores, jnp.float32)
    if valid is not None:
        scores = jnp.where(valid, scores, _NEG_INF)

    # `ovr > thresh` suppression matrix (self row included — picking a box
    # also removes it from the alive set).
    suppress = bbox_overlaps(boxes, boxes) > iou_thresh
    idx_range = jnp.arange(n)

    def body(alive, _):
        masked = jnp.where(alive, scores, _NEG_INF)
        i = jnp.argmax(masked)
        ok = masked[i] > _NEG_INF / 2
        alive = alive & ~suppress[i] & (idx_range != i)
        return alive, (jnp.where(ok, i, 0).astype(jnp.int32), ok)

    steps = min(max_out, n)
    _, (keep_idx, keep_mask) = jax.lax.scan(
        body, scores > _NEG_INF / 2, None, length=steps)
    if steps < max_out:
        pad = max_out - steps
        keep_idx = jnp.pad(keep_idx, (0, pad))
        keep_mask = jnp.pad(keep_mask, (0, pad))
    return keep_idx, keep_mask


@partial(jax.jit, static_argnames=("max_out", "method"))
def soft_nms_fixed(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_out: int,
    sigma: float = 0.5,
    iou_thresh: float = 0.3,
    score_thresh: float = 0.001,
    method: str = "linear",
    valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Soft-NMS (Bodla et al.) with a static output budget.

    Parity: `cython_nms.soft_nms` (linear / gaussian). Sequentially picks the
    highest remaining box `max_out` times, decaying overlapping scores.

    Returns (keep_idx, keep_mask, new_scores[max_out]).
    """
    n = boxes.shape[0]
    scores = jnp.asarray(scores, jnp.float32)
    if valid is not None:
        scores = jnp.where(valid, scores, _NEG_INF)
    iou = bbox_overlaps(boxes, boxes)

    def body(state, _):
        cur_scores, alive = state
        masked = jnp.where(alive, cur_scores, _NEG_INF)
        i = jnp.argmax(masked)
        top_score = masked[i]
        ok = top_score > score_thresh
        row = iou[i]
        if method == "linear":
            decay = jnp.where(row > iou_thresh, 1.0 - row, 1.0)
        else:  # gaussian
            decay = jnp.exp(-(row * row) / sigma)
        new_scores = jnp.where(alive, cur_scores * decay, cur_scores)
        alive = alive & (jnp.arange(n) != i)
        return (new_scores, alive), (jnp.where(ok, i, 0), ok,
                                     jnp.where(ok, top_score, 0.0))

    init = (scores, scores > _NEG_INF / 2)
    (_, _), (idx, mask, out_scores) = jax.lax.scan(
        body, init, None, length=max_out)
    return idx.astype(jnp.int32), mask, out_scores


def batched_nms_fixed(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    class_ids: jnp.ndarray,
    iou_thresh: float,
    max_out: int,
    valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Class-aware NMS: boxes of different classes never suppress each other.

    Implemented with the standard coordinate-offset trick so a single
    `nms_fixed` call handles all classes.
    """
    max_coord = jnp.max(jnp.where(jnp.isfinite(boxes), boxes, 0.0)) + 1.0
    offsets = class_ids.astype(jnp.float32)[:, None] * (max_coord + 1.0)
    return nms_fixed(boxes + offsets, scores, iou_thresh, max_out, valid)


def nms_numpy(boxes, scores, thresh):
    """Host/numpy oracle with the exact Cython-reference semantics.

    Used by unit tests and by any host-side fallback path.
    """
    import numpy as np

    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        ovr = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][ovr <= thresh]
    return keep
