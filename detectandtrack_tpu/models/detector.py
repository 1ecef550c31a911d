"""GeneralizedRCNN — the whole (3D) Mask R-CNN as one jitted XLA graph.

Reference parity: `lib/modeling/model_builder.py` + `lib/modeling/detector.py`
(SURVEY.md §2.1) and the inference flow of `lib/core/test.py` (§3.2). The
reference crosses the host/device boundary twice per clip (bbox pass →
host NMS → keypoint pass → host decode); here backbone → FPN → RPN →
proposal decode+NMS → RoIAlign → box head → final NMS → keypoint head →
heatmap decode is ONE XLA program with static shapes throughout
(`BASELINE.json.north_star`).

Outputs are padded to static budgets with validity masks:
  boxes (B, D, 4·T) · scores (B, D) · valid (B, D) · keypoints (B, D, T, K, 4)
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core.config import Config
from ..kernels.roi_align import (
    assign_fpn_levels,
    roi_align_multilevel_dense,
    roi_align_multilevel_gather,
    roi_align_multilevel_hybrid,
    roi_align_multilevel_pallas,
)
from ..ops import boxes as box_ops
from ..ops.anchors import fpn_anchor_fields, shifted_anchor_field
from ..ops.keypoints import heatmaps_to_keypoints
from ..ops.nms import nms_fixed
from .backbone import backbone_from_cfg
from .fpn import FPN
from .heads import BoxHead2MLP, KeypointHead, MaskHead
from .rpn import (RPNHead, _center_frame_box, anchor_cell_for_level,
                  collect_fpn_proposals, decode_tube_proposals,
                  flatten_rpn_outputs)


def _compute_dtype(cfg: Config):
    return jnp.bfloat16 if cfg.MODEL.COMPUTE_DTYPE == "bfloat16" else (
        jnp.float32)


def _flip_tubes(boxes: jnp.ndarray, image_w: float, t: int) -> jnp.ndarray:
    """Mirror (B, K, 4T) per-frame boxes horizontally (Detectron +1 conv)."""
    b, k = boxes.shape[:2]
    pf = boxes.reshape(b, k, t, 4)
    out = jnp.stack([image_w - 1.0 - pf[..., 2], pf[..., 1],
                     image_w - 1.0 - pf[..., 0], pf[..., 3]], axis=-1)
    return out.reshape(b, k, 4 * t)


class GeneralizedRCNN(nn.Module):
    """cfg-driven detection model; __call__ returns raw head outputs plus
    decoded, NMS'd detections (everything in-graph)."""

    cfg: Config

    def setup(self):
        cfg = self.cfg
        dtype = _compute_dtype(cfg)
        t = cfg.VIDEO.NUM_FRAMES if cfg.VIDEO.VIDEO_ON else 1
        self.num_frames = t
        self.backbone = backbone_from_cfg(cfg)
        if cfg.FPN.FPN_ON:
            self.fpn = FPN(dim=cfg.FPN.DIM,
                           zero_init_lateral=cfg.FPN.ZERO_INIT_LATERAL,
                           extra_conv_levels=cfg.FPN.EXTRA_CONV_LEVELS,
                           dtype=dtype)
        self.rpn_head = RPNHead(
            dim=cfg.FPN.DIM if cfg.FPN.FPN_ON else 1024,
            num_anchors=len(cfg.RPN.ASPECT_RATIOS) if cfg.FPN.FPN_ON else
            len(cfg.RPN.ASPECT_RATIOS) * len(cfg.RPN.SIZES),
            num_frames=t,
            dtype=dtype,
        )
        if cfg.FPN.FPN_ON and cfg.FAST_RCNN.ROI_BOX_HEAD == "2mlp_head":
            self.box_head = BoxHead2MLP(
                num_classes=cfg.MODEL.NUM_CLASSES,
                num_frames=t,
                hidden_dim=cfg.FAST_RCNN.MLP_HEAD_DIM,
                dtype=dtype,
            )
        else:
            # C4 family: box head is the res5 stage on pooled res4 features
            # (lineage res5_head), global-avg-pooled.
            from .heads import Res5BoxHead
            self.box_head = Res5BoxHead(
                num_classes=cfg.MODEL.NUM_CLASSES,
                num_frames=t,
                time_kernel=(cfg.VIDEO.TIME_KERNEL_DIM[4]
                             if cfg.VIDEO.VIDEO_ON else 1),
                width=cfg.RESNETS.WIDTH_PER_GROUP * cfg.RESNETS.NUM_GROUPS * 8,
                stride_1x1=cfg.RESNETS.STRIDE_1X1,
                dtype=dtype,
                groups=cfg.RESNETS.NUM_GROUPS,
                dilation=cfg.RESNETS.RES5_DILATION,
            )
        if cfg.MODEL.KEYPOINTS_ON:
            self.kps_head = KeypointHead(
                num_keypoints=cfg.KRCNN.NUM_KEYPOINTS,
                num_convs=cfg.KRCNN.NUM_STACKED_CONVS,
                conv_dim=cfg.KRCNN.CONV_HEAD_DIM,
                conv_kernel=cfg.KRCNN.CONV_HEAD_KERNEL,
                up_scale=cfg.KRCNN.UP_SCALE,
                dtype=dtype,
            )
        if cfg.MODEL.MASK_ON:
            self.mask_head = MaskHead(num_classes=cfg.MODEL.NUM_CLASSES,
                                      dim=cfg.MRCNN.DIM_REDUCED,
                                      dtype=dtype)

    # ------------------------------------------------------------------
    # Feature extraction
    # ------------------------------------------------------------------

    def features(self, clips: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """clips (B, T, H, W, 3) → pyramid {p2..p6}, or {res4} (C4 mode:
        RPN + RoI pooling ride the stride-16 res4 map; res5 is the box
        head — the lineage's no-FPN wiring)."""
        feats = self.backbone(clips)
        if self.cfg.FPN.FPN_ON:
            return self.fpn(feats)
        return {"res4": feats["res4"]}

    def _pyramid_list(self, pyramid):
        cfg = self.cfg
        if cfg.FPN.FPN_ON:
            lvls = range(cfg.FPN.RPN_MIN_LEVEL, cfg.FPN.RPN_MAX_LEVEL + 1)
            return [pyramid[f"p{l}"] for l in lvls], [2 ** l for l in lvls]
        return [pyramid["res4"]], [cfg.RPN.STRIDE]

    # ------------------------------------------------------------------
    # RPN + proposals (in-graph)
    # ------------------------------------------------------------------

    def propose(self, pyramid, image_hw, train: bool = False):
        """→ (tubes (B, K, 4T), scores (B, K), valid (B, K)) plus raw RPN
        outputs per level (for the RPN loss).

        Perf note (r2 trace, 800×1344 b2): per-level NMS compiled to one
        sequential `while` loop PER level — ~37% of device time. All
        (level × image) lanes now share ONE vmapped fixed-budget NMS loop:
        same greedy semantics, `post` iterations total, L·B-wide body.
        """
        cfg = self.cfg
        t = self.num_frames
        maps, strides = self._pyramid_list(pyramid)
        pre = (cfg.RPN.PRE_NMS_TOP_N_TRAIN if train else
               cfg.RPN.PRE_NMS_TOP_N_TEST)
        post = (cfg.RPN.POST_NMS_TOP_N_TRAIN if train else
                cfg.RPN.POST_NMS_TOP_N_TEST)

        raw = []
        lvl_tubes, lvl_scores = [], []
        for li, (fmap, stride) in enumerate(zip(maps, strides)):
            logits, deltas = self.rpn_head(fmap)
            raw.append((logits, deltas))
            scores, deltas = flatten_rpn_outputs(logits, deltas, t)
            cell = anchor_cell_for_level(cfg, li, stride)
            field = jnp.asarray(shifted_anchor_field(
                cell, stride, fmap.shape[2], fmap.shape[3]))
            k_pre = min(pre, scores.shape[1])

            def decode_one(s, d, field=field):
                ts, ti = jax.lax.top_k(s, k_pre)
                tubes = decode_tube_proposals(field[ti], d[ti], image_hw, t)
                return tubes, ts

            tubes_b, ts_b = jax.vmap(decode_one)(scores, deltas)
            if k_pre < pre:      # small level: pad lanes to a common width
                padn = pre - k_pre
                tubes_b = jnp.pad(tubes_b, ((0, 0), (0, padn), (0, 0)))
                ts_b = jnp.pad(ts_b, ((0, 0), (0, padn)),
                               constant_values=-jnp.inf)
            lvl_tubes.append(tubes_b)
            lvl_scores.append(ts_b)

        b = maps[0].shape[0]
        n_lvl = len(maps)
        flat_tubes = jnp.stack(lvl_tubes).reshape(n_lvl * b, pre, 4 * t)
        flat_scores = jnp.stack(lvl_scores).reshape(n_lvl * b, pre)
        rep = _center_frame_box(flat_tubes, t)          # (L·B, pre, 4)
        valid = jnp.isfinite(flat_scores)
        if cfg.RPN.MIN_SIZE > 0:
            valid = valid & jax.vmap(
                lambda r: box_ops.filter_small_boxes(
                    r, cfg.RPN.MIN_SIZE))(rep)

        def nms_one(r, s, v):
            return nms_fixed(r, s, cfg.RPN.NMS_THRESH, post, v)

        keep_idx, keep_mask = jax.vmap(nms_one)(rep, flat_scores, valid)
        sel_tubes = jax.lax.stop_gradient(jnp.take_along_axis(
            flat_tubes, keep_idx[..., None], axis=1))
        sel_scores = jax.lax.stop_gradient(jnp.take_along_axis(
            flat_scores, keep_idx, axis=1))
        sel_tubes = sel_tubes.reshape(n_lvl, b, post, 4 * t)
        sel_scores = sel_scores.reshape(n_lvl, b, post)
        sel_valid = keep_mask.reshape(n_lvl, b, post)

        def collect(bi):
            return collect_fpn_proposals(
                [(sel_tubes[li, bi], sel_scores[li, bi], sel_valid[li, bi])
                 for li in range(n_lvl)],
                max_out=post)

        tubes, scores, valid = jax.vmap(collect)(jnp.arange(b))
        return (tubes, scores, valid), raw

    # ------------------------------------------------------------------
    # RoI feature transform (Pallas RoIAlign over the whole batch)
    # ------------------------------------------------------------------

    def roi_transform(self, pyramid, tubes, resolution: int,
                      sampling_ratio: int):
        """tubes (B, K, 4T) → pooled (B·K, T, P, P, C).

        Level assignment uses the center-frame box; each frame of a tube
        pools from its own (slab = b·T + frame) feature slice.
        """
        cfg = self.cfg
        t = self.num_frames
        b, k = tubes.shape[0], tubes.shape[1]
        if cfg.FPN.FPN_ON:
            lvls = list(range(cfg.FPN.ROI_MIN_LEVEL,
                              cfg.FPN.ROI_MAX_LEVEL + 1))
            maps = [pyramid[f"p{l}"] for l in lvls]
            strides = [2 ** l for l in lvls]
        else:
            maps, strides = [pyramid["res4"]], [cfg.RPN.STRIDE]

        # Group rois by slab (b, t): (B, K, T, 4) → (B·T, K, 4) — the dense
        # RoIAlign batches its two matmuls per slab.
        per_frame = tubes.reshape(b, k, t, 4)
        slab_rois = per_frame.transpose(0, 2, 1, 3).reshape(b * t, k, 4)
        center = per_frame[:, :, t // 2, :].reshape(b * k, 4)
        if cfg.FPN.FPN_ON:
            levels = assign_fpn_levels(
                center, cfg.FPN.ROI_MIN_LEVEL, cfg.FPN.ROI_MAX_LEVEL,
                cfg.FPN.ROI_CANONICAL_SCALE, cfg.FPN.ROI_CANONICAL_LEVEL)
        else:
            levels = jnp.zeros((b * k,), jnp.int32)
        # Level is a property of the tube (center frame): (B, K) → (B·T, K).
        slab_levels = jnp.repeat(levels.reshape(b, 1, k), t,
                                 axis=1).reshape(b * t, k)

        flat_maps = [m.reshape((-1,) + m.shape[2:]) for m in maps]
        impl = cfg.MODEL.ROI_ALIGN_IMPL
        if impl == "pallas" and not (
                cfg.FPN.FPN_ON and jax.default_backend() == "tpu"):
            # The Pallas kernel relies on FPN level assignment for its
            # patch-span contract and on a real TPU backend; the dense
            # einsum form is the exact-everywhere fallback.
            impl = "dense"
        align = {"pallas": roi_align_multilevel_pallas,
                 "hybrid": roi_align_multilevel_hybrid,
                 "gather": roi_align_multilevel_gather,
                 "dense": roi_align_multilevel_dense}[impl]
        pooled = align(
            flat_maps, strides, slab_rois, slab_levels,
            resolution, sampling_ratio)              # (B·T, K, P, P, C)
        c = pooled.shape[-1]
        pooled = pooled.reshape(b, t, k, resolution, resolution, c)
        pooled = pooled.transpose(0, 2, 1, 3, 4, 5)  # (B, K, T, ...)
        return pooled.reshape(b * k, t, resolution, resolution, c)

    # ------------------------------------------------------------------
    # Inference stages (composed by __call__ and detect_tta)
    # ------------------------------------------------------------------

    def _box_candidates(self, pyramid, image_hw, train: bool = False,
                        proposals: Optional[jnp.ndarray] = None,
                        run_rpn: bool = True,
                        proposal_valid: Optional[jnp.ndarray] = None):
        """Proposals + box head → per-candidate refined tubes and scores.

        → dict: tubes/p_scores/p_valid (B, K, ...), refined (B, K, 4T),
        scores (B, K), fc7 (B, K, C), cls_logits, box_deltas, rpn_raw.

        `proposals` (B, Kp, 4T): externally-supplied proposal tubes (the
        lineage's precomputed-proposals inference — Detectron proposal
        files). With `run_rpn` the RPN + proposal NMS still execute and the
        supplied tubes replace the selected ones through a runtime-true
        select (so the proposal stage is NOT dead-code-eliminated —
        `bench.py` uses this to measure the full graph at a controlled RoI
        distribution); without it the RPN is skipped entirely (Fast
        R-CNN-style inference).
        """
        cfg = self.cfg
        t = self.num_frames
        if proposals is None or run_rpn:
            (tubes, p_scores, p_valid), rpn_raw = self.propose(
                pyramid, image_hw, train=train)
            if proposals is not None:
                kp = proposals.shape[1]
                base = tubes[:, :kp]
                if kp > tubes.shape[1]:
                    base = jnp.pad(
                        tubes, ((0, 0), (0, kp - tubes.shape[1]), (0, 0)))
                # isfinite(sum(scores)) is always True at runtime but XLA
                # cannot prove it, so the RPN/NMS outputs stay live.
                keep = jnp.isfinite(jnp.sum(p_scores))
                tubes = jnp.where(keep, jnp.asarray(proposals, jnp.float32),
                                  base)
                p_scores = jnp.ones(tubes.shape[:2], jnp.float32)
                p_valid = jnp.ones(tubes.shape[:2], bool)
        else:
            tubes = jnp.asarray(proposals, jnp.float32)
            p_valid = (jnp.ones(tubes.shape[:2], bool)
                       if proposal_valid is None
                       else jnp.asarray(proposal_valid, bool))
            p_scores = p_valid.astype(jnp.float32)
            rpn_raw = []
        b, k = tubes.shape[0], tubes.shape[1]

        pooled = self.roi_transform(
            pyramid, tubes, cfg.FAST_RCNN.ROI_XFORM_RESOLUTION,
            cfg.FAST_RCNN.ROI_XFORM_SAMPLING_RATIO)
        cls_logits, deltas, fc7 = self.box_head(pooled)  # (B·K, C), (B·K, C·4T)
        probs = jax.nn.softmax(cls_logits, axis=-1)

        # Person class (index 1) refinement, per frame, with BBOX_REG_WEIGHTS.
        n_cls = cfg.MODEL.NUM_CLASSES
        deltas = deltas.reshape(b * k, n_cls, t, 4)
        person_deltas = deltas[:, 1].reshape(b * k, 4 * t)
        flat_tubes = tubes.reshape(b * k, 4 * t)
        w = cfg.FAST_RCNN.BBOX_REG_WEIGHTS
        refined = box_ops.bbox_transform(
            flat_tubes.reshape(-1, 4),
            person_deltas.reshape(-1, 4), w).reshape(b * k, 4 * t)
        refined = box_ops.clip_boxes(refined, image_hw[0], image_hw[1])
        scores = probs[:, 1].reshape(b, k)
        refined = refined.reshape(b, k, 4 * t)
        return {
            "tubes": tubes, "p_scores": p_scores, "p_valid": p_valid,
            "refined": refined, "scores": scores,
            "fc7": fc7.reshape(b, k, -1),
            "cls_logits": cls_logits, "box_deltas": deltas,
            "rpn_raw": rpn_raw,
        }

    def _finalize_detections(self, refined, scores, valid, fc7):
        """Candidates (B, K', ...) → final NMS'd detections (B, D, ...)."""
        cfg = self.cfg
        t = self.num_frames
        b, k = scores.shape
        d_max = cfg.TEST.DETECTIONS_PER_IM

        def final_nms(boxes_i, scores_i, valid_i):
            center = boxes_i.reshape(k, t, 4)[:, t // 2]
            ok = valid_i & (scores_i >= cfg.TEST.SCORE_THRESH)
            if cfg.TEST.SOFT_NMS_ENABLED:
                from ..ops.nms import soft_nms_fixed
                idx, mask, new_scores = soft_nms_fixed(
                    center, scores_i, d_max, cfg.TEST.SOFT_NMS_SIGMA,
                    cfg.TEST.NMS, cfg.TEST.SCORE_THRESH,
                    cfg.TEST.SOFT_NMS_METHOD, ok)
                return boxes_i[idx], new_scores, mask, idx
            idx, mask = nms_fixed(center, scores_i, cfg.TEST.NMS, d_max, ok)
            return boxes_i[idx], scores_i[idx], mask, idx

        det_boxes, det_scores, det_valid, det_idx = jax.vmap(final_nms)(
            refined, scores, valid)                     # (B, D, 4T) ...

        if cfg.TEST.BBOX_VOTE_ENABLED:
            # Box voting (lineage box_results_with_nms_and_limit +
            # box_voting, TEST.BBOX_VOTE): each kept box becomes the
            # score-weighted average of all refined boxes overlapping it
            # (center-frame IoU ≥ VOTE_TH); scoring method ID.
            thr = cfg.TEST.BBOX_VOTE_THRESH
            all_centers = refined.reshape(b, k, t, 4)[:, :, t // 2]
            det_centers = det_boxes.reshape(b, -1, t, 4)[:, :, t // 2]
            iou = jax.vmap(box_ops.bbox_overlaps)(det_centers, all_centers)
            w_vote = jnp.where(
                (iou >= thr) & valid[:, None, :],
                jnp.where(valid, scores, 0.0)[:, None, :], 0.0)
            denom = w_vote.sum(-1, keepdims=True)       # (B, D, 1)
            voted = jnp.einsum("bdk,bkc->bdc", w_vote, refined)
            det_boxes = jnp.where(denom > 0, voted / jnp.maximum(denom,
                                                                 1e-12),
                                  det_boxes)

        # Appearance features of final detections (fc7 of their proposal).
        det_feats = jnp.take_along_axis(
            fc7, det_idx[..., None], axis=1)            # (B, D, 1024)
        return det_boxes, det_scores, det_valid, det_feats

    def _kps_box_prep(self, det_boxes):
        """Shared keypoint-stage box bookkeeping: score-ranked budget
        (KRCNN.MAX_ROIS_PER_IM) and the center-frame collapse ablation.

        → (kp_boxes (B, M, 4T), decode_boxes (B, M, 4·t_kp), m_kp, t_kp).
        """
        cfg = self.cfg
        t = self.num_frames
        b, d_max = det_boxes.shape[:2]
        m_kp = cfg.KRCNN.MAX_ROIS_PER_IM or d_max
        m_kp = min(m_kp, d_max)
        kp_boxes = det_boxes[:, :m_kp]
        t_kp = t
        decode_boxes = kp_boxes
        if cfg.VIDEO.VIDEO_ON and not cfg.VIDEO.PREDICT_ALL_FRAMES:
            decode_boxes = kp_boxes.reshape(
                b, m_kp, t, 4)[:, :, t // 2:t // 2 + 1].reshape(b, m_kp, 4)
            t_kp = 1
        return kp_boxes, decode_boxes, m_kp, t_kp

    def _keypoint_heatmaps(self, passes, kp_boxes, t_kp, image_w):
        """Pass-averaged keypoint heatmaps for GIVEN (budgeted) boxes.

        `passes`: list of (pyramid, flipped). A flipped pass pools at the
        mirrored boxes from the mirrored-clip pyramid, then its heatmaps are
        mirrored back (W axis) and joint-permuted before averaging — the
        reference's KPS_AUG 'hm_avg' heuristic (`im_detect_keypoints_aug` +
        `keypoint_utils.flip_heatmaps`) run device-side in the same XLA
        program. Bin alignment is exact: RoIAlign bin S-1-j of the mirrored
        box covers the same image pixels as bin j of the original box.

        → (B·M, Tk, S, S, K).
        """
        cfg = self.cfg
        t = self.num_frames
        hm_sum = None
        for pyramid, flipped in passes:
            boxes_p = (_flip_tubes(kp_boxes, image_w, t) if flipped
                       else kp_boxes)
            kp_pooled = self.roi_transform(
                pyramid, boxes_p, cfg.KRCNN.ROI_XFORM_RESOLUTION,
                cfg.KRCNN.ROI_XFORM_SAMPLING_RATIO)
            if t_kp != t:
                # Center-frame-only supervision/inference (paper ablation):
                # run the head on the center frame of each tube.
                kp_pooled = kp_pooled[:, t // 2:t // 2 + 1]
            hm = self.kps_head(kp_pooled)               # (B·M, Tk, S, S, K)
            if flipped:
                from ..ops.keypoints import flip_permutation
                perm = jnp.asarray(flip_permutation(
                    "posetrack" if cfg.KRCNN.NUM_KEYPOINTS == 15
                    else "coco"))
                hm = hm[:, :, :, ::-1, :][..., perm]
            hm_sum = hm if hm_sum is None else hm_sum + hm
        return hm_sum / float(len(passes))

    def _decode_keypoints(self, heatmaps, kp_boxes, decode_boxes, m_kp,
                          t_kp, d_max):
        """Heatmaps (B·M, Tk, S, S, K) + boxes → padded (B, D, T, K, 4)."""
        cfg = self.cfg
        t = self.num_frames
        b = kp_boxes.shape[0]
        s_hm = heatmaps.shape[2]
        n_kp = cfg.KRCNN.NUM_KEYPOINTS
        hm_flat = heatmaps.reshape(b * m_kp * t_kp, s_hm, s_hm, n_kp)
        rois_flat = decode_boxes.reshape(b * m_kp * t_kp, 4)
        kps = heatmaps_to_keypoints(
            hm_flat.transpose(0, 3, 1, 2), rois_flat)
        kps = kps.reshape(b, m_kp, t_kp, n_kp, 4)
        if cfg.KRCNN.INFERENCE_MIN_SIZE > 0:
            # Lineage KRCNN.INFERENCE_MIN_SIZE: detections smaller than
            # this get no keypoints (scores zeroed).
            cb = kp_boxes.reshape(b, m_kp, t, 4)[:, :, t // 2]
            side = jnp.minimum(cb[..., 2] - cb[..., 0],
                               cb[..., 3] - cb[..., 1])
            big = side >= cfg.KRCNN.INFERENCE_MIN_SIZE
            kps = kps.at[..., 2:].multiply(
                big[:, :, None, None, None].astype(kps.dtype))
        if t_kp != t:
            # Broadcast the center-frame pose to all frames so the
            # output contract stays (B, D, T, K, 4).
            kps = jnp.broadcast_to(kps, (b, m_kp, t, n_kp, 4))
        if m_kp != d_max:
            kps = jnp.pad(kps,
                          ((0, 0), (0, d_max - m_kp), (0, 0), (0, 0),
                           (0, 0)))
        return kps

    def _keypoint_outputs(self, passes, det_boxes, image_w):
        """Keypoint heatmaps + decode on final detections."""
        b, d_max = det_boxes.shape[:2]
        kp_boxes, decode_boxes, m_kp, t_kp = self._kps_box_prep(det_boxes)
        heatmaps = self._keypoint_heatmaps(passes, kp_boxes, t_kp, image_w)
        kps = self._decode_keypoints(heatmaps, kp_boxes, decode_boxes,
                                     m_kp, t_kp, d_max)
        s_hm = heatmaps.shape[2]
        n_kp = self.cfg.KRCNN.NUM_KEYPOINTS
        return kps, heatmaps.reshape(b, m_kp, t_kp, s_hm, s_hm, n_kp)

    def keypoint_heatmaps_for_boxes(self, clips: jnp.ndarray,
                                    det_boxes: jnp.ndarray,
                                    flip: bool = False) -> jnp.ndarray:
        """KPS_AUG second phase: heatmaps for GIVEN detections.

        Parity: `im_detect_keypoints_aug` — the reference re-runs the conv
        body + keypoint head per augmentation (scale/flip) ON THE FINAL
        detection boxes and averages heatmaps before one decode. This
        method is one such pass: `clips` at some TEST scale, `det_boxes`
        the merged detections in THAT clip's coordinates. Returns
        (B, M, Tk, S, S, K) pass-averaged (with the in-graph flip pair if
        `flip`). The caller averages across scales and decodes once with
        `decode_keypoints_from_heatmaps`.
        """
        pyr = self.features(clips)
        passes = [(pyr, False)]
        if flip:
            passes.append((self.features(clips[:, :, :, ::-1]), True))
        b, d_max = det_boxes.shape[:2]
        kp_boxes, _, m_kp, t_kp = self._kps_box_prep(det_boxes)
        hm = self._keypoint_heatmaps(passes, kp_boxes, t_kp,
                                     float(clips.shape[3]))
        s_hm = hm.shape[2]
        n_kp = self.cfg.KRCNN.NUM_KEYPOINTS
        return hm.reshape(b, m_kp, t_kp, s_hm, s_hm, n_kp)

    def decode_keypoints_from_heatmaps(self, heatmaps: jnp.ndarray,
                                       det_boxes: jnp.ndarray
                                       ) -> jnp.ndarray:
        """Decode (B, M, Tk, S, S, K) averaged heatmaps at det_boxes
        (ORIGINAL image coords) → (B, D, T, K, 4)."""
        b, d_max = det_boxes.shape[:2]
        kp_boxes, decode_boxes, m_kp, t_kp = self._kps_box_prep(det_boxes)
        hm = heatmaps.reshape((b * m_kp * t_kp,) + heatmaps.shape[3:])
        return self._decode_keypoints(hm, kp_boxes, decode_boxes, m_kp,
                                      t_kp, d_max)

    def _mask_outputs(self, pyramid, det_boxes):
        cfg = self.cfg
        b, d_max = det_boxes.shape[:2]
        mask_pooled = self.roi_transform(
            pyramid, det_boxes, cfg.MRCNN.ROI_XFORM_RESOLUTION,
            cfg.MRCNN.ROI_XFORM_SAMPLING_RATIO)
        m = self.mask_head(mask_pooled)                  # (B·D, T, S, S, C)
        return m.reshape((b, d_max) + m.shape[1:])

    # ------------------------------------------------------------------
    # Full inference graph
    # ------------------------------------------------------------------

    def __call__(self, clips: jnp.ndarray,
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        """clips (B, T, H, W, 3) → detections dict (all static shapes)."""
        cfg = self.cfg
        b = clips.shape[0]
        image_hw = (float(clips.shape[2]), float(clips.shape[3]))

        pyramid = self.features(clips)

        if cfg.MODEL.RPN_ONLY:
            # Proposal-only model (lineage MODEL.RPN_ONLY): detections ARE
            # the top proposals; no RoI heads run.
            (tubes, p_scores, p_valid), rpn_raw = self.propose(
                pyramid, image_hw, train=train)
            k = tubes.shape[1]
            d_max = min(cfg.TEST.DETECTIONS_PER_IM, k)
            return {
                "boxes": tubes[:, :d_max],
                "scores": jnp.where(p_valid[:, :d_max],
                                    jax.nn.sigmoid(p_scores[:, :d_max]),
                                    0.0),
                "valid": p_valid[:, :d_max],
                "features": jnp.zeros((b, d_max, 1), jnp.float32),
                "proposals": tubes,
                "proposal_scores": p_scores,
                "proposal_valid": p_valid,
                "rpn_raw": rpn_raw,
            }

        cand = self._box_candidates(pyramid, image_hw, train=train)
        det_boxes, det_scores, det_valid, det_feats = (
            self._finalize_detections(cand["refined"], cand["scores"],
                                      cand["p_valid"], cand["fc7"]))

        out = {
            "boxes": det_boxes,
            "scores": jnp.where(det_valid, det_scores, 0.0),
            "valid": det_valid,
            "features": det_feats,
            "proposals": cand["tubes"],
            "proposal_scores": cand["p_scores"],
            "proposal_valid": cand["p_valid"],
            "cls_logits": cand["cls_logits"],
            "box_deltas": cand["box_deltas"],
            "rpn_raw": cand["rpn_raw"],
        }

        if cfg.MODEL.KEYPOINTS_ON:
            kps, hms = self._keypoint_outputs([(pyramid, False)],
                                              det_boxes, image_hw[1])
            out["keypoints"] = kps
            out["heatmaps"] = hms

        if cfg.MODEL.MASK_ON:
            out["masks"] = self._mask_outputs(pyramid, det_boxes)

        return out

    def detect_with_proposals(self, clips: jnp.ndarray,
                              proposals: jnp.ndarray,
                              run_rpn: bool = False,
                              proposal_valid: Optional[jnp.ndarray] = None,
                              ) -> Dict[str, jnp.ndarray]:
        """Inference on externally-supplied proposal tubes (B, Kp, 4T).

        Parity: the lineage's precomputed-proposals path — Detectron models
        run with proposal FILES instead of an RPN (`TEST.PROPOSAL_FILES` /
        Fast-R-CNN-style inference in `core/test.py`, SURVEY §2.1 inference
        core). `run_rpn=False` skips the RPN exactly like the lineage;
        `run_rpn=True` keeps the RPN + proposal NMS in the compiled graph
        (their outputs replaced by `proposals` through a runtime select) —
        used by bench.py to measure the production graph at a controlled,
        realistic RoI level distribution instead of whatever degenerate
        mix random weights produce.

        `proposal_valid` (B, Kp) masks padded proposal rows (proposal
        files rarely supply exactly Kp boxes per clip); only honored on
        the run_rpn=False path — the bench's injected tubes are always
        all-valid by construction.
        """
        cfg = self.cfg
        b = clips.shape[0]
        image_hw = (float(clips.shape[2]), float(clips.shape[3]))
        pyramid = self.features(clips)
        cand = self._box_candidates(pyramid, image_hw,
                                    proposals=proposals, run_rpn=run_rpn,
                                    proposal_valid=proposal_valid)
        det_boxes, det_scores, det_valid, det_feats = (
            self._finalize_detections(cand["refined"], cand["scores"],
                                      cand["p_valid"], cand["fc7"]))
        out = {
            "boxes": det_boxes,
            "scores": jnp.where(det_valid, det_scores, 0.0),
            "valid": det_valid,
            "features": det_feats,
            "proposals": cand["tubes"],
        }
        if cfg.MODEL.KEYPOINTS_ON:
            kps, hms = self._keypoint_outputs([(pyramid, False)],
                                              det_boxes, image_hw[1])
            out["keypoints"] = kps
            out["heatmaps"] = hms
        if cfg.MODEL.MASK_ON:
            out["masks"] = self._mask_outputs(pyramid, det_boxes)
        return out

    def detect_tta(self, clips: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """Flip-TTA inference in ONE XLA graph.

        Parity: `im_detect_bbox_aug` (hflip, 'union' coord heuristic) +
        `im_detect_keypoints_aug` ('hm_avg'): box candidates from the
        original and mirrored passes are unioned before the final NMS, and
        keypoint heatmaps from both passes are averaged AT THE HEATMAP
        LEVEL (mirror + joint permutation in-graph), decoded once — no
        host-side coordinate-average approximation, and one dispatch per
        batch instead of two.
        """
        cfg = self.cfg
        t = self.num_frames
        image_hw = (float(clips.shape[2]), float(clips.shape[3]))
        w_img = image_hw[1]

        pyr_o = self.features(clips)
        pyr_f = self.features(clips[:, :, :, ::-1])
        cand_o = self._box_candidates(pyr_o, image_hw)
        cand_f = self._box_candidates(pyr_f, image_hw)

        refined = jnp.concatenate(
            [cand_o["refined"], _flip_tubes(cand_f["refined"], w_img, t)],
            axis=1)                                      # (B, 2K, 4T)
        scores = jnp.concatenate([cand_o["scores"], cand_f["scores"]],
                                 axis=1)
        valid = jnp.concatenate([cand_o["p_valid"], cand_f["p_valid"]],
                                axis=1)
        fc7 = jnp.concatenate([cand_o["fc7"], cand_f["fc7"]], axis=1)

        det_boxes, det_scores, det_valid, det_feats = (
            self._finalize_detections(refined, scores, valid, fc7))

        out = {
            "boxes": det_boxes,
            "scores": jnp.where(det_valid, det_scores, 0.0),
            "valid": det_valid,
            "features": det_feats,
        }
        if cfg.MODEL.KEYPOINTS_ON:
            kps, hms = self._keypoint_outputs(
                [(pyr_o, False), (pyr_f, True)], det_boxes, w_img)
            out["keypoints"] = kps
            out["heatmaps"] = hms
        if cfg.MODEL.MASK_ON:
            out["masks"] = self._mask_outputs(pyr_o, det_boxes)
        return out


def build_model(cfg: Config) -> GeneralizedRCNN:
    """Parity: model_builder.create(cfg.MODEL.TYPE)."""
    if cfg.MODEL.TYPE != "generalized_rcnn":
        raise ValueError(f"Unknown MODEL.TYPE {cfg.MODEL.TYPE!r}")
    return GeneralizedRCNN(cfg)


def init_model(cfg: Config, rng: jax.Array,
               sample_shape: Optional[Tuple[int, ...]] = None):
    """Initialize parameters with a minimal dummy clip (fast on CPU)."""
    model = build_model(cfg)
    if sample_shape is None:
        t = cfg.VIDEO.NUM_FRAMES if cfg.VIDEO.VIDEO_ON else 1
        s = cfg.FPN.COARSEST_STRIDE * 2
        sample_shape = (1, t, s, s, 3)
    clip = jnp.zeros(sample_shape, jnp.float32)
    params = model.init(rng, clip)
    return model, params
