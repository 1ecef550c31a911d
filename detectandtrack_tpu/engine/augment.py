"""Test-time augmentation: horizontal-flip box/keypoint inference.

Reference parity: `lib/core/test.py`'s BBOX_AUG / KPS_AUG machinery
(SURVEY.md §2.1 "Inference core": optional multi-scale/flip augmentation).
The reference runs augmented passes and merges on host; here the flipped
pass is the same jitted graph on the mirrored clip, and merging happens on
host over the padded outputs:

- boxes: flipped detections are unflipped and unioned with the original
  set, then class-NMS'd down to the detection budget (BBOX_AUG union mode);
- keypoints: the flipped pass's heatmaps are already decoded device-side, so
  keypoint *coordinates* are unflipped and joint-swapped, and each final
  box's keypoints are averaged with its flipped-pass match (KPS_AUG heur
  'hm_avg' approximated at the coordinate level — the reference averages
  heatmaps; coordinate averaging of the two decodes is within quarter-bin).

Multi-scale augmentation (`TEST.BBOX_AUG_SCALES`) runs each clip once per
scale through the bucket mechanism; `merge_multiscale_detections` unions
the passes in original-image coordinates and re-NMS's to the detection
budget (the reference's `im_detect_bbox_aug` union heuristic).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..ops.keypoints import flip_permutation
from ..ops.nms import nms_numpy


def _unflip_boxes(boxes: np.ndarray, width: float) -> np.ndarray:
    out = boxes.copy()
    out[..., 0::4] = width - boxes[..., 2::4] - 1
    out[..., 2::4] = width - boxes[..., 0::4] - 1
    return out


def _unflip_keypoints(kps: np.ndarray, width: float,
                      dataset: str = "posetrack") -> np.ndarray:
    perm = flip_permutation(dataset)
    out = kps[..., perm, :].copy()
    out[..., 0] = width - out[..., 0] - 1
    return out


def merge_flip_detections(
    det: Dict[str, np.ndarray],
    det_flipped: Dict[str, np.ndarray],
    image_width: float,
    num_frames: int,
    nms_thresh: float = 0.5,
    max_out: Optional[int] = None,
    dataset: str = "posetrack",
) -> Dict[str, np.ndarray]:
    """Merge one clip's original + flipped padded outputs (host side).

    Inputs are single-clip dicts: boxes (D, 4T), scores (D,), valid (D,),
    keypoints (D, T, K, 4). Returns the same structure with the union
    re-NMS'd to `max_out` (default D).
    """
    d = det["boxes"].shape[0]
    max_out = max_out or d
    t = num_frames

    fb = _unflip_boxes(det_flipped["boxes"], image_width)
    boxes = np.concatenate([det["boxes"], fb], axis=0)
    scores = np.concatenate([det["scores"], det_flipped["scores"]])
    valid = np.concatenate([det["valid"], det_flipped["valid"]])
    kps = None
    if "keypoints" in det:
        fk = _unflip_keypoints(det_flipped["keypoints"], image_width,
                               dataset)
        kps = np.concatenate([det["keypoints"], fk], axis=0)
    feats = None
    if "features" in det:
        feats = np.concatenate([det["features"],
                                det_flipped["features"]], axis=0)

    center = boxes.reshape(-1, t, 4)[:, t // 2]
    masked_scores = np.where(valid, scores, -1.0)
    keep = nms_numpy(center, masked_scores, nms_thresh)
    keep = [i for i in keep if valid[i]][:max_out]

    out_boxes = np.zeros((max_out, 4 * t), boxes.dtype)
    out_scores = np.zeros((max_out,), scores.dtype)
    out_valid = np.zeros((max_out,), bool)
    out_kps = (np.zeros((max_out,) + kps.shape[1:], kps.dtype)
               if kps is not None else None)
    out_feats = (np.zeros((max_out,) + feats.shape[1:], feats.dtype)
                 if feats is not None else None)

    def _iou(a, b):
        iw = max(0.0, min(a[2], b[2]) - max(a[0], b[0]) + 1)
        ih = max(0.0, min(a[3], b[3]) - max(a[1], b[1]) + 1)
        inter = iw * ih
        area = ((a[2] - a[0] + 1) * (a[3] - a[1] + 1)
                + (b[2] - b[0] + 1) * (b[3] - b[1] + 1) - inter)
        return inter / max(area, 1e-6)

    for slot, i in enumerate(keep):
        out_boxes[slot] = boxes[i]
        out_scores[slot] = scores[i]
        out_valid[slot] = True
        if out_feats is not None:
            out_feats[slot] = feats[i]
        if out_kps is not None:
            k = kps[i]
            # Average coordinates with the best-IoU match from the OTHER
            # pass (detection order differs after NMS — match by geometry).
            lo, hi = (d, 2 * d) if i < d else (0, d)
            best_j, best_iou = -1, 0.7
            for j in range(lo, hi):
                if not valid[j]:
                    continue
                iou = _iou(center[i], center[j])
                if iou > best_iou:
                    best_iou, best_j = iou, j
            if best_j >= 0:
                k = k.copy()
                k[..., :2] = 0.5 * (k[..., :2] + kps[best_j][..., :2])
            out_kps[slot] = k

    out = {"boxes": out_boxes, "scores": out_scores, "valid": out_valid}
    if out_kps is not None:
        out["keypoints"] = out_kps
    if out_feats is not None:
        out["features"] = out_feats
    return out


def merge_multiscale_detections(
    singles: List[Dict[str, np.ndarray]],
    num_frames: int,
    nms_thresh: float = 0.5,
    max_out: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Union the per-scale passes of one clip and re-NMS to the budget.

    Parity: the reference's BBOX_AUG 'union' heuristic (`im_detect_bbox_aug`
    accumulates boxes over scales then one NMS). Inputs are single-clip
    dicts already in a COMMON coordinate frame (original image coords —
    each pass divides by its own scale first). Keypoints/features ride the
    kept detection (KPS_AUG across scales keeps the winning pass's decode).
    """
    t = num_frames
    max_out = max_out or singles[0]["boxes"].shape[0]
    boxes = np.concatenate([s["boxes"] for s in singles], axis=0)
    scores = np.concatenate([s["scores"] for s in singles])
    valid = np.concatenate([s["valid"] for s in singles])
    kps = (np.concatenate([s["keypoints"] for s in singles], axis=0)
           if "keypoints" in singles[0] else None)
    feats = (np.concatenate([s["features"] for s in singles], axis=0)
             if "features" in singles[0] else None)

    center = boxes.reshape(-1, t, 4)[:, t // 2]
    masked = np.where(valid, scores, -1.0)
    keep = [i for i in nms_numpy(center, masked, nms_thresh)
            if valid[i]][:max_out]

    out = {
        "boxes": np.zeros((max_out, boxes.shape[1]), boxes.dtype),
        "scores": np.zeros((max_out,), scores.dtype),
        "valid": np.zeros((max_out,), bool),
    }
    if kps is not None:
        out["keypoints"] = np.zeros((max_out,) + kps.shape[1:], kps.dtype)
    if feats is not None:
        out["features"] = np.zeros((max_out,) + feats.shape[1:],
                                   feats.dtype)
    for slot, i in enumerate(keep):
        out["boxes"][slot] = boxes[i]
        out["scores"][slot] = scores[i]
        out["valid"][slot] = True
        if kps is not None:
            out["keypoints"][slot] = kps[i]
        if feats is not None:
            out["features"][slot] = feats[i]
    return out


def rescale_detections(det: Dict[str, np.ndarray],
                       scale: float) -> Dict[str, np.ndarray]:
    """Scaled-image coords → original-image coords (host, one clip)."""
    out = dict(det)
    out["boxes"] = det["boxes"] / scale
    if "keypoints" in det:
        k = det["keypoints"].copy()
        k[..., :2] /= scale
        out["keypoints"] = k
    return out


def flip_clip(clips: np.ndarray) -> np.ndarray:
    """Mirror (B, T, H, W, 3) clips along W."""
    return clips[:, :, :, ::-1]
