"""Training target assignment — fully in-XLA, fixed sample counts.

Reference parity: `lib/roi_data/rpn.py` (anchor↔GT matching, ±sampling,
regression targets), `lib/ops/generate_proposal_labels.py` +
`lib/roi_data/fast_rcnn.py` (FG/BG RoI sampling, bbox targets) and
`lib/roi_data/keypoint_rcnn.py` (keypoint GT → discretized heatmap labels)
(SURVEY.md §2.1). The reference computes these in Python/Cython mid-graph
(host sync every iteration, SURVEY §3.1); here they are jnp with static
shapes so the whole train step stays one XLA program.

Sampling: the reference random-samples FG/BG; here selection is by
`jax.random.permutation` under an explicit key (deterministic given the key)
with fixed counts — padding rows carry zero loss weight.

GT comes in padded: boxes (G, 4·T), keypoints (G, T, K, 3), valid (G,).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops import boxes as box_ops


class AnchorTargets(NamedTuple):
    labels: jnp.ndarray        # (N,) 1 fg / 0 bg / -1 ignore
    bbox_targets: jnp.ndarray  # (N, 4·T)
    weights: jnp.ndarray       # (N,) loss weight (1 for sampled, else 0)


def _random_subsample(key, mask: jnp.ndarray, num) -> jnp.ndarray:
    """Keep at most `num` True entries of `mask`, chosen uniformly.

    `num` may be a traced scalar — the reference refills the sampling
    batch with background when foreground is scarce, so the bg quota is
    data-dependent."""
    n = mask.shape[0]
    scores = jax.random.uniform(key, (n,)) + (~mask) * 10.0
    rank = jnp.argsort(jnp.argsort(scores))        # rank among all
    return mask & (rank < num)


def rpn_targets(
    key: jax.Array,
    anchors: jnp.ndarray,          # (N, 4) spatial anchors
    gt_tubes: jnp.ndarray,         # (G, 4·T) padded
    gt_valid: jnp.ndarray,         # (G,)
    num_frames: int,
    image_hw: Tuple[float, float],
    positive_overlap: float = 0.7,
    negative_overlap: float = 0.3,
    batch_size: int = 256,
    fg_fraction: float = 0.5,
    straddle_thresh: float = 0.0,
) -> AnchorTargets:
    """Anchor labels + per-frame tube regression targets for one image."""
    n = anchors.shape[0]
    g = gt_tubes.shape[0]
    t = num_frames
    center_gt = gt_tubes.reshape(g, t, 4)[:, t // 2]

    # Anchors straddling the image boundary are ignored (STRADDLE_THRESH).
    # The reference indexes DOWN to inside anchors before any matching
    # (lib/roi_data/rpn: inds_inside), so a GT's guaranteed-positive
    # argmax anchor is the best INSIDE anchor — filtering after the
    # argmax left edge GTs (whose global-best anchors straddle) with no
    # positive signal at all.
    h, w = image_hw
    inside = ((anchors[:, 0] >= -straddle_thresh)
              & (anchors[:, 1] >= -straddle_thresh)
              & (anchors[:, 2] < w + straddle_thresh)
              & (anchors[:, 3] < h + straddle_thresh))

    iou = box_ops.bbox_overlaps(anchors, center_gt)          # (N, G)
    iou = jnp.where(gt_valid[None, :] & inside[:, None], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)                        # (N,)
    best_iou = jnp.max(iou, axis=1)

    # fg: IoU >= thresh, or argmax anchor for some GT (ties included).
    per_gt_best = jnp.max(iou, axis=0)                       # (G,)
    is_best_for_gt = jnp.any(
        (iou >= per_gt_best[None, :] - 1e-5) & (iou > 0)
        & gt_valid[None, :], axis=1)
    any_gt = jnp.any(gt_valid)
    fg = ((best_iou >= positive_overlap) | is_best_for_gt) & any_gt
    bg = ((best_iou < negative_overlap) & ~fg) | ~any_gt
    fg = fg & inside
    bg = bg & inside

    k1, k2 = jax.random.split(key)
    num_fg = int(batch_size * fg_fraction)
    fg_keep = _random_subsample(k1, fg, num_fg)
    # Reference refill: bg tops the batch up to batch_size when fg is
    # scarce (num_bg = batch - ACTUAL fg count, not the static quota).
    bg_keep = _random_subsample(k2, bg, batch_size - jnp.sum(fg_keep))

    labels = jnp.where(fg_keep, 1, jnp.where(bg_keep, 0, -1))

    # Per-frame regression targets against the matched GT tube.
    matched = gt_tubes[best_gt].reshape(n, t, 4)
    anchor_rep = jnp.broadcast_to(anchors[:, None, :], (n, t, 4))
    tgt = box_ops.bbox_transform_inv(anchor_rep, matched).reshape(n, 4 * t)

    return AnchorTargets(labels=labels, bbox_targets=tgt,
                         weights=(labels >= 0).astype(jnp.float32))


class ProposalTargets(NamedTuple):
    rois: jnp.ndarray            # (S, 4·T) sampled proposals (incl. GT)
    labels: jnp.ndarray          # (S,) class id (0 = bg)
    bbox_targets: jnp.ndarray    # (S, 4·T)
    bbox_weights: jnp.ndarray    # (S,) 1 for fg
    keypoint_targets: jnp.ndarray  # (S, T, K, 3) matched GT keypoints
    is_fg: jnp.ndarray           # (S,) bool
    valid: jnp.ndarray           # (S,) sampled-row validity
    gt_inds: jnp.ndarray         # (S,) matched GT row (mask/aux targets)


def proposal_targets(
    key: jax.Array,
    proposals: jnp.ndarray,        # (P, 4·T) padded tubes
    prop_valid: jnp.ndarray,       # (P,)
    gt_tubes: jnp.ndarray,         # (G, 4·T)
    gt_keypoints: jnp.ndarray,     # (G, T, K, 3)
    gt_valid: jnp.ndarray,         # (G,)
    num_frames: int,
    batch_size: int = 512,
    fg_fraction: float = 0.25,
    fg_thresh: float = 0.5,
    bg_thresh_hi: float = 0.5,
    bg_thresh_lo: float = 0.0,
    reg_weights=(10.0, 10.0, 5.0, 5.0),
) -> ProposalTargets:
    """Sample RoIs and build box/keypoint targets for one image.

    GT tubes are appended to the proposal pool (the lineage trick that
    guarantees clean positives early in training).
    """
    t = num_frames
    pool = jnp.concatenate([proposals, gt_tubes], axis=0)
    pool_valid = jnp.concatenate([prop_valid, gt_valid], axis=0)
    p = pool.shape[0]
    g = gt_tubes.shape[0]

    center = pool.reshape(p, t, 4)[:, t // 2]
    center_gt = gt_tubes.reshape(g, t, 4)[:, t // 2]
    iou = box_ops.bbox_overlaps(center, center_gt)
    iou = jnp.where(gt_valid[None, :] & pool_valid[:, None], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)

    fg = best_iou >= fg_thresh
    # Rows whose IoU was masked to -1 (no valid GT in the image) count as
    # overlap 0 for the background test — the lineage treats GT-free images
    # as all-background so they still give the classifier training signal.
    bg_iou = jnp.maximum(best_iou, 0.0)
    bg = (bg_iou < bg_thresh_hi) & (bg_iou >= bg_thresh_lo) & pool_valid

    # The sample count can never exceed the pool (tiny configs/tests).
    batch_size = min(batch_size, p)
    k1, k2 = jax.random.split(key)
    num_fg = int(batch_size * fg_fraction)
    fg_keep = _random_subsample(k1, fg, num_fg)
    # Reference refill (roi_data/fast_rcnn): bg tops the RoI batch up to
    # batch_size when fg is scarce.
    bg_keep = _random_subsample(k2, bg, batch_size - jnp.sum(fg_keep))
    selected = fg_keep | bg_keep

    # Order selected rows first (fg then bg), pad to batch_size.
    order_score = jnp.where(fg_keep, 0, jnp.where(bg_keep, 1, 2))
    order = jnp.argsort(order_score, stable=True)[:batch_size]
    sel_valid = (order_score[order] < 2)

    rois = pool[order]
    labels = jnp.where(fg_keep[order], 1, 0)
    m = best_gt[order]
    matched = gt_tubes[m].reshape(batch_size, t, 4)
    roi_frames = rois.reshape(batch_size, t, 4)
    tgt = box_ops.bbox_transform_inv(
        roi_frames, matched, reg_weights).reshape(batch_size, 4 * t)
    kp_tgt = gt_keypoints[m]

    is_fg = fg_keep[order] & sel_valid
    return ProposalTargets(
        rois=rois,
        labels=jnp.where(sel_valid, labels, 0),
        bbox_targets=tgt,
        bbox_weights=is_fg.astype(jnp.float32),
        keypoint_targets=kp_tgt,
        is_fg=is_fg,
        valid=sel_valid,
        gt_inds=m,
    )


def mask_targets(
    rois: jnp.ndarray,           # (S, 4) per-frame RoI boxes
    gt_boxes: jnp.ndarray,       # (S, 4) matched GT boxes (same frame)
    gt_bitmaps: jnp.ndarray,     # (S, M, M) GT masks in the GT-box frame
    out_size: int,
) -> jnp.ndarray:
    """Resample each matched GT bitmap into its RoI's frame → (S, P, P).

    The reference rasterizes the GT polygon directly in the RoI frame
    (`roi_data/mask_rcnn.polys_to_mask_wrt_box`); here the loader rasterizes
    once per GT into the GT-box frame and this op bilinearly resamples into
    each sampled RoI — an in-XLA formulation with the same supervision up to
    rasterization resolution. Output is binarized at 0.5.
    """
    m = gt_bitmaps.shape[-1]
    p = out_size
    # RoI-frame pixel centers in image coords.
    fx = (jnp.arange(p) + 0.5) / p
    rx = rois[:, 0:1] + fx[None, :] * (rois[:, 2:3] - rois[:, 0:1])  # (S, P)
    ry = rois[:, 1:2] + fx[None, :] * (rois[:, 3:4] - rois[:, 1:2])
    # → GT-bitmap coords.
    gw = jnp.maximum(gt_boxes[:, 2:3] - gt_boxes[:, 0:1], 1.0)
    gh = jnp.maximum(gt_boxes[:, 3:4] - gt_boxes[:, 1:2], 1.0)
    u = (rx - gt_boxes[:, 0:1]) / gw * m - 0.5                       # (S, P)
    v = (ry - gt_boxes[:, 1:2]) / gh * m - 0.5

    def sample_one(bitmap, uu, vv):
        # Bilinear with zero outside the bitmap.
        ug, vg = jnp.meshgrid(uu, vv, indexing="xy")                 # (P, P)
        u0 = jnp.floor(ug)
        v0 = jnp.floor(vg)
        du, dv = ug - u0, vg - v0

        def tap(vi, ui, w):
            inb = (ui >= 0) & (ui < m) & (vi >= 0) & (vi < m)
            ui_ = jnp.clip(ui, 0, m - 1).astype(jnp.int32)
            vi_ = jnp.clip(vi, 0, m - 1).astype(jnp.int32)
            return jnp.where(inb, bitmap[vi_, ui_], 0.0) * w

        out = (tap(v0, u0, (1 - du) * (1 - dv))
               + tap(v0, u0 + 1, du * (1 - dv))
               + tap(v0 + 1, u0, (1 - du) * dv)
               + tap(v0 + 1, u0 + 1, du * dv))
        return out

    sampled = jax.vmap(sample_one)(gt_bitmaps, u, v)                 # (S,P,P)
    return (sampled >= 0.5).astype(jnp.float32)


def keypoint_heatmap_targets(
    rois: jnp.ndarray,           # (S, 4) per-frame boxes
    keypoints: jnp.ndarray,      # (S, K, 3) matched GT [x, y, vis]
    heatmap_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Discretize keypoints into heatmap bin indices (softmax-CE labels).

    Returns (bin_index (S, K) int32, weight (S, K) f32). A keypoint is valid
    if visible (v > 0) and inside its RoI — matching the lineage's
    `keypoints_to_heatmap_labels` semantics.
    """
    hs = heatmap_size
    x1, y1 = rois[:, 0:1], rois[:, 1:2]
    w = jnp.maximum(rois[:, 2:3] - rois[:, 0:1], 1.0)
    h = jnp.maximum(rois[:, 3:4] - rois[:, 1:2], 1.0)
    fx = (keypoints[..., 0] - x1) / w * hs
    fy = (keypoints[..., 1] - y1) / h * hs
    bx = jnp.clip(jnp.floor(fx), 0, hs - 1)
    by = jnp.clip(jnp.floor(fy), 0, hs - 1)
    inside = (fx >= 0) & (fx < hs) & (fy >= 0) & (fy < hs)
    vis = keypoints[..., 2] > 0
    weight = (inside & vis).astype(jnp.float32)
    idx = (by * hs + bx).astype(jnp.int32)
    return idx, weight
