"""Detection losses — smooth-L1, softmax-CE, keypoint heatmap CE.

Reference parity: the stock Caffe2 loss ops used by
`fast_rcnn_heads.add_fast_rcnn_losses`, `rpn_heads` and
`keypoint_rcnn_heads.add_keypoint_losses` (SURVEY.md §2.1-§2.2): SmoothL1
with per-element beta, SoftmaxWithLoss, and spatial-softmax CE over the
heatmap grid normalized by visible keypoints
(KRCNN.NORMALIZE_BY_VISIBLE_KEYPOINTS).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray,
              beta: float = 1.0) -> jnp.ndarray:
    """Elementwise smooth-L1 (Huber) with transition point `beta`."""
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def softmax_ce(logits: jnp.ndarray, labels: jnp.ndarray,
               weights: jnp.ndarray) -> jnp.ndarray:
    """Mean weighted softmax cross-entropy with integer labels."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(weights), 1.0)
    return jnp.sum(nll * weights) / denom


def sigmoid_ce(logits: jnp.ndarray, labels: jnp.ndarray,
               weights: jnp.ndarray) -> jnp.ndarray:
    """Mean weighted sigmoid cross-entropy (RPN objectness)."""
    loss = (jnp.maximum(logits, 0) - logits * labels
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    denom = jnp.maximum(jnp.sum(weights), 1.0)
    return jnp.sum(loss * weights) / denom


def rpn_losses(
    logits: jnp.ndarray,        # (N,) objectness
    deltas: jnp.ndarray,        # (N, 4·T)
    labels: jnp.ndarray,        # (N,) 1/0/-1
    bbox_targets: jnp.ndarray,  # (N, 4·T)
    beta: float = 0.1111111,
):
    """RPN objectness sigmoid-CE + fg-only smooth-L1, normalized as in the
    lineage (cls by #sampled, box by #sampled)."""
    sampled = (labels >= 0).astype(jnp.float32)
    fg = (labels == 1).astype(jnp.float32)
    cls_loss = sigmoid_ce(logits, jnp.maximum(labels, 0).astype(jnp.float32),
                          sampled)
    box = smooth_l1(deltas, bbox_targets, beta).sum(-1)
    box_loss = jnp.sum(box * fg) / jnp.maximum(jnp.sum(sampled), 1.0)
    return cls_loss, box_loss


def fast_rcnn_losses(
    cls_logits: jnp.ndarray,    # (S, C)
    box_deltas: jnp.ndarray,    # (S, C, T, 4)
    labels: jnp.ndarray,        # (S,)
    bbox_targets: jnp.ndarray,  # (S, 4·T)
    bbox_weights: jnp.ndarray,  # (S,)
    valid: jnp.ndarray,         # (S,)
    beta: float = 1.0,
):
    """Classification CE + class-specific per-frame box smooth-L1."""
    s, c, t, _ = box_deltas.shape
    w = valid.astype(jnp.float32)
    cls_loss = softmax_ce(cls_logits, labels, w)
    picked = jnp.take_along_axis(
        box_deltas, labels[:, None, None, None].astype(jnp.int32),
        axis=1)[:, 0].reshape(s, 4 * t)
    box = smooth_l1(picked, bbox_targets, beta).sum(-1)
    box_loss = jnp.sum(box * bbox_weights) / jnp.maximum(jnp.sum(w), 1.0)
    return cls_loss, box_loss


def mask_loss(
    mask_logits: jnp.ndarray,      # (S, M, M) person-class logits
    mask_targets: jnp.ndarray,     # (S, M, M) binary
    weights: jnp.ndarray,          # (S,) fg ∧ has-mask
    loss_weight: float = 1.0,
) -> jnp.ndarray:
    """Per-pixel sigmoid CE averaged over the pixels of weighted RoIs
    (parity: mask_rcnn_heads.add_mask_rcnn_losses / SigmoidCrossEntropyLoss
    normalized by the number of supervised mask pixels)."""
    logits = mask_logits
    labels = mask_targets.astype(logits.dtype)
    ce = (jnp.maximum(logits, 0) - logits * labels
          + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    w = weights[:, None, None].astype(logits.dtype)
    denom = jnp.maximum(jnp.sum(w) * logits.shape[1] * logits.shape[2], 1.0)
    return loss_weight * jnp.sum(ce * w) / denom


def keypoint_loss(
    heatmap_logits: jnp.ndarray,   # (S, H, H, K)
    bin_targets: jnp.ndarray,      # (S, K) flat bin index
    weights: jnp.ndarray,          # (S, K)
    normalize_by_visible: bool = True,
    loss_weight: float = 1.0,
) -> jnp.ndarray:
    """Softmax-CE over the H² spatial bins per visible keypoint."""
    s, hh, ww, k = heatmap_logits.shape
    logits = heatmap_logits.transpose(0, 3, 1, 2).reshape(s, k, hh * ww)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, bin_targets[..., None], axis=-1)[..., 0]
    if normalize_by_visible:
        denom = jnp.maximum(jnp.sum(weights), 1.0)
    else:
        # The lineage's non-normalized mode still averages over the VALID
        # labels (SoftmaxWithLoss default normalization over non-ignored
        # entries), not over every padded slot — dividing by the static
        # S·K shrank the keypoint gradient by the padding ratio (review
        # r3). With fixed batches the distinction is a per-batch constant
        # in the reference; here slots vary with fg count.
        denom = jnp.maximum(jnp.sum(weights > 0), 1)
    return loss_weight * jnp.sum(nll * weights) / denom
