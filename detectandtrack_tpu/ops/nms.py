"""Fixed-shape NMS for TPU — masked, static-size, jit-native.

Reference parity: `lib/utils/cython_nms.pyx` (greedy NMS + soft-NMS), called
from `GenerateProposalsOp` and `box_results_with_nms_and_limit` (SURVEY.md
§2.2, §3.2). The reference suppresses on host in Cython with dynamic output
counts; on TPU the whole thing stays in the XLA graph with a static budget:

    keep_idx, keep_mask = nms_fixed(boxes, scores, thresh, max_out, valid)

Algorithm (exact greedy, near-constant sequential depth): sort by score,
build the strictly-upper-triangular suppression matrix S[j, i] = "j
outranks i and IoU > thresh", then Jacobi-iterate

    kept ← valid & ¬any_j(S[j, i] & kept[j])

to a fixpoint. Greedy NMS is the forward-substitution solution of that
triangular recurrence; starting from all-true, every box stabilizes once
its suppression-chain predecessors have, so the iteration converges to
exactly the greedy result in (max suppression-chain depth + 1) rounds —
single digits for real detections — instead of the `max_out` (300–1000)
pick-one-box steps of a sequential scan. Each round is one O(N²) masked
reduction, which the VPU eats whole. (r2 trace: sequential-scan NMS
whiles were ~29% of inference device time; this removes them.)
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

    # Score-descending order; jnp.argsort is stable, so ties keep their
    # original index order (the same tie-break as the scan/argmax form).
    order = jnp.argsort(-scores)
    b = boxes[order].astype(jnp.float32)
    valid_sorted = scores[order] > _NEG_INF / 2

    # S[j, i]: j (higher-ranked) suppresses i, `ovr > thresh` strictly
    # (Cython reference semantics). Strictly upper triangular.
    iou = bbox_overlaps(b, b)
    rng = jnp.arange(n)
    supp = (iou > iou_thresh) & (rng[:, None] < rng[None, :])

    def cond(state):
        it, _, changed = state
        return changed & (it < n)

    def body(state):
        it, kept, _ = state
        new = valid_sorted & ~jnp.any(supp & kept[:, None], axis=0)
        return it + 1, new, jnp.any(new != kept)

    _, kept, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), valid_sorted, jnp.bool_(True)))

    # First `max_out` survivors in score order, via a unique-target scatter
    # on each survivor's rank (overflow rank -> a discard slot).
    pos = jnp.cumsum(kept) - 1
    tgt = jnp.where(kept & (pos < max_out), pos, max_out)
    keep_idx = (jnp.zeros(max_out + 1, jnp.int32)
                .at[tgt].set(order.astype(jnp.int32))[:max_out])
    keep_mask = (jnp.zeros(max_out + 1, bool)
                 .at[tgt].set(kept)[:max_out])
    keep_idx = jnp.where(keep_mask, keep_idx, 0)
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

    Parity: `cython_nms.soft_nms` (linear / gaussian): sequentially pick
    the highest remaining box, decay every overlapping box's score, repeat.
    Like `nms_fixed` above, the sequential pick loop is replaced by a
    bulk-confirmation fixpoint (the r2 trace showed `max_out`-length scan
    whiles were the single largest sequential cost class):

    The scan picks boxes in descending FINAL-score order (a box's score is
    frozen when picked; everything still unpicked is <= it and only
    decays). So per round, with `prov(i) = s_i * prod(decays from already
    confirmed overlapping boxes)`, any box with NO unconfirmed overlapping
    box of higher (prov, -index) can be confirmed at `prov(i)`: an
    overlapper could only decay i by being picked first, which would need
    current score > prov(i) at pick time, impossible since its score is
    bounded by its own prov <= prov(i). Confirmations commute, at least
    the global prov-argmax confirms every round, and each round is one
    O(N^2) masked product the VPU eats whole — the loop runs to the decay
    -chain depth (single digits on real detections) instead of `max_out`
    sequential argmax steps. Equality with the scan is pinned by
    tests/test_nms.py against `soft_nms_scan`.

    Returns (keep_idx, keep_mask, new_scores[max_out]).
    """
    n = boxes.shape[0]
    scores = jnp.asarray(scores, jnp.float32)
    if valid is not None:
        scores = jnp.where(valid, scores, _NEG_INF)
    iou = bbox_overlaps(boxes, boxes).astype(jnp.float32)
    if method == "linear":
        dmat = jnp.where(iou > iou_thresh, 1.0 - iou, 1.0)
    else:  # gaussian
        dmat = jnp.exp(-(iou * iou) / sigma)
    eye = jnp.eye(n, dtype=bool)
    # j can ever decay i (self excluded; decay==1 is a no-op either way).
    overlaps = (dmat < 1.0) & ~eye
    alive = scores > _NEG_INF / 2

    def cond(state):
        _, _, changed = state
        return changed

    def body(state):
        confirmed, conf_score, _ = state
        # prov(i): score after decays from every CONFIRMED overlapper.
        # Confirmed boxes are all picked before any unconfirmed one, so
        # these decays are exactly the ones the scan has applied by then.
        decays = jnp.where(confirmed[:, None] & overlaps, dmat, 1.0)
        prov = scores * jnp.prod(decays, axis=0)
        # i is outranked if some unconfirmed alive overlapper j beats it
        # lexicographically on (prov, -index) — the scan's argmax order.
        rng = jnp.arange(n)
        beats = (prov[:, None] > prov[None, :]) | (
            (prov[:, None] == prov[None, :]) & (rng[:, None] < rng[None, :]))
        outranked = jnp.any(
            (~confirmed & alive)[:, None] & overlaps & beats, axis=0)
        newly = ~confirmed & alive & ~outranked
        conf_score = jnp.where(newly, prov, conf_score)
        return (confirmed | newly, conf_score,
                jnp.any(newly))

    confirmed0 = jnp.zeros(n, bool)
    _, final, _ = jax.lax.while_loop(
        cond, body, (confirmed0, jnp.full(n, _NEG_INF, jnp.float32),
                     jnp.bool_(True)))

    # Emit the scan's outputs: picks in descending (final, -index) order,
    # masked once the running top drops to score_thresh, max_out slots.
    k = min(n, max_out)
    order = jnp.argsort(-final)[:k]
    out_scores = final[order]
    mask = out_scores > score_thresh
    idx = jnp.where(mask, order.astype(jnp.int32), 0)
    out_scores = jnp.where(mask, out_scores, 0.0)
    if k < max_out:
        pad = max_out - k
        idx = jnp.pad(idx, (0, pad))
        mask = jnp.pad(mask, (0, pad))
        out_scores = jnp.pad(out_scores, (0, pad))
    return idx, mask, out_scores


def soft_nms_scan(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_out: int,
    sigma: float = 0.5,
    iou_thresh: float = 0.3,
    score_thresh: float = 0.001,
    method: str = "linear",
    valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sequential-scan soft-NMS: the direct transliteration of the Cython
    reference's pick-decay loop. Test oracle for `soft_nms_fixed` (and the
    shape every CPU reader expects); not used on the TPU hot path."""
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
