"""Box geometry ops — pure jnp, shape-polymorphic, jit-safe.

Reference parity: `lib/utils/boxes.py` + `lib/utils/cython_bbox.pyx`
(SURVEY.md §2.1/§2.2). The reference computes IoU matrices in Cython on host;
on TPU a broadcast jnp IoU runs on the VPU and fuses into the surrounding
graph, so no native kernel is needed. Boxes are ``(x1, y1, x2, y2)`` in pixel
coordinates with the Detectron convention that width = x2 - x1 + 1.

All functions accept jnp or numpy arrays and work under jit/vmap.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

# Detectron box convention: +1 on widths/heights.
_ONE = 1.0

# Clamp on dw/dh before exp, as in the lineage (log(1000/16)).
BBOX_XFORM_CLIP = 4.135166556742356


def boxes_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of (..., 4) boxes."""
    w = boxes[..., 2] - boxes[..., 0] + _ONE
    h = boxes[..., 3] - boxes[..., 1] + _ONE
    return w * h


def bbox_overlaps(boxes: jnp.ndarray, query: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix between (N, 4) and (K, 4) boxes → (N, K).

    Parity: `cython_bbox.bbox_overlaps`. Broadcast on VPU; O(N·K) but N, K are
    static and modest (≤ a few thousand), so this is bandwidth-trivial.
    """
    boxes = jnp.asarray(boxes, jnp.float32)
    query = jnp.asarray(query, jnp.float32)
    x1 = jnp.maximum(boxes[:, None, 0], query[None, :, 0])
    y1 = jnp.maximum(boxes[:, None, 1], query[None, :, 1])
    x2 = jnp.minimum(boxes[:, None, 2], query[None, :, 2])
    y2 = jnp.minimum(boxes[:, None, 3], query[None, :, 3])
    iw = jnp.clip(x2 - x1 + _ONE, 0.0, None)
    ih = jnp.clip(y2 - y1 + _ONE, 0.0, None)
    inter = iw * ih
    union = boxes_area(boxes)[:, None] + boxes_area(query)[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def bbox_iou_pairwise(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise IoU of two aligned (..., 4) box arrays."""
    x1 = jnp.maximum(a[..., 0], b[..., 0])
    y1 = jnp.maximum(a[..., 1], b[..., 1])
    x2 = jnp.minimum(a[..., 2], b[..., 2])
    y2 = jnp.minimum(a[..., 3], b[..., 3])
    iw = jnp.clip(x2 - x1 + _ONE, 0.0, None)
    ih = jnp.clip(y2 - y1 + _ONE, 0.0, None)
    inter = iw * ih
    union = boxes_area(a) + boxes_area(b) - inter
    return jnp.where(union > 0, inter / union, 0.0)


def bbox_transform(
    boxes: jnp.ndarray,
    deltas: jnp.ndarray,
    weights: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Apply regression deltas to boxes (Parity: `boxes.bbox_transform`).

    boxes: (..., 4); deltas: (..., 4k) → (..., 4k) predicted boxes.
    """
    boxes = jnp.asarray(boxes, jnp.float32)
    deltas = jnp.asarray(deltas, jnp.float32)
    wx, wy, ww, wh = weights

    widths = boxes[..., 2] - boxes[..., 0] + _ONE
    heights = boxes[..., 3] - boxes[..., 1] + _ONE
    ctr_x = boxes[..., 0] + 0.5 * widths
    ctr_y = boxes[..., 1] + 0.5 * heights

    shp = deltas.shape[:-1] + (-1, 4)
    d = deltas.reshape(shp)
    dx = d[..., 0] / wx
    dy = d[..., 1] / wy
    dw = jnp.clip(d[..., 2] / ww, None, BBOX_XFORM_CLIP)
    dh = jnp.clip(d[..., 3] / wh, None, BBOX_XFORM_CLIP)

    pred_ctr_x = dx * widths[..., None] + ctr_x[..., None]
    pred_ctr_y = dy * heights[..., None] + ctr_y[..., None]
    pred_w = jnp.exp(dw) * widths[..., None]
    pred_h = jnp.exp(dh) * heights[..., None]

    out = jnp.stack(
        [
            pred_ctr_x - 0.5 * pred_w,
            pred_ctr_y - 0.5 * pred_h,
            pred_ctr_x + 0.5 * pred_w - _ONE,
            pred_ctr_y + 0.5 * pred_h - _ONE,
        ],
        axis=-1,
    )
    return out.reshape(deltas.shape)


def bbox_transform_inv(
    boxes: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    weights: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Regression targets taking `boxes` to `gt_boxes` (aligned, (..., 4))."""
    boxes = jnp.asarray(boxes, jnp.float32)
    gt_boxes = jnp.asarray(gt_boxes, jnp.float32)
    wx, wy, ww, wh = weights

    ex_w = boxes[..., 2] - boxes[..., 0] + _ONE
    ex_h = boxes[..., 3] - boxes[..., 1] + _ONE
    ex_cx = boxes[..., 0] + 0.5 * ex_w
    ex_cy = boxes[..., 1] + 0.5 * ex_h

    gt_w = gt_boxes[..., 2] - gt_boxes[..., 0] + _ONE
    gt_h = gt_boxes[..., 3] - gt_boxes[..., 1] + _ONE
    gt_cx = gt_boxes[..., 0] + 0.5 * gt_w
    gt_cy = gt_boxes[..., 1] + 0.5 * gt_h

    # Guard degenerate ex boxes (padding rows): avoid div-by-zero / log(<=0).
    ex_w = jnp.maximum(ex_w, 1e-6)
    ex_h = jnp.maximum(ex_h, 1e-6)
    gt_w = jnp.maximum(gt_w, 1e-6)
    gt_h = jnp.maximum(gt_h, 1e-6)

    return jnp.stack(
        [
            wx * (gt_cx - ex_cx) / ex_w,
            wy * (gt_cy - ex_cy) / ex_h,
            ww * jnp.log(gt_w / ex_w),
            wh * jnp.log(gt_h / ex_h),
        ],
        axis=-1,
    )


def clip_boxes(boxes: jnp.ndarray, height: float, width: float) -> jnp.ndarray:
    """Clip (..., 4k) boxes to image bounds (Parity: clip_tiled_boxes)."""
    shp = boxes.shape
    b = boxes.reshape(shp[:-1] + (-1, 4))
    x1 = jnp.clip(b[..., 0], 0.0, width - _ONE)
    y1 = jnp.clip(b[..., 1], 0.0, height - _ONE)
    x2 = jnp.clip(b[..., 2], 0.0, width - _ONE)
    y2 = jnp.clip(b[..., 3], 0.0, height - _ONE)
    return jnp.stack([x1, y1, x2, y2], axis=-1).reshape(shp)


def flip_boxes(boxes: jnp.ndarray, width: float) -> jnp.ndarray:
    """Horizontal flip of (..., 4) boxes in an image of given width."""
    x1 = width - boxes[..., 2] - _ONE
    x2 = width - boxes[..., 0] - _ONE
    return jnp.stack([x1, boxes[..., 1], x2, boxes[..., 3]], axis=-1)


def filter_small_boxes(boxes: jnp.ndarray, min_size: float) -> jnp.ndarray:
    """Validity mask of boxes with both sides >= min_size."""
    w = boxes[..., 2] - boxes[..., 0] + _ONE
    h = boxes[..., 3] - boxes[..., 1] + _ONE
    return (w >= min_size) & (h >= min_size)
