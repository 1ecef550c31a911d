"""Training engine: loss forward, optimizer, pjit data-parallel train step.

Reference parity: `tools/train_net.py` train loop + `modeling/optimizer.py`
(SGD+momentum, NCCL/muji allreduce) + the mid-graph PythonOp target ops
(SURVEY.md §2.1, §3.1). The reference's hot loop is `workspace.RunNet` with
host PythonOps in the middle; here ONE jitted XLA program computes
forward + targets + losses + backward + SGD update, sharded over a `data`
mesh axis (gradient psum over ICI is inserted by XLA — no NCCL analogue to
write, SURVEY §2.3).

Batch contract (all padded, fixed shapes):
  clips         (B, T, H, W, 3) float32
  gt_boxes      (B, G, 4·T)
  gt_keypoints  (B, G, T, K, 3)
  gt_valid      (B, G) bool
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.config import Config
from ..models.detector import GeneralizedRCNN
from ..models.rpn import flatten_rpn_outputs
from ..ops.anchors import shifted_anchor_field
from ..parallel.mesh import DATA_AXIS, Mesh, batch_sharded, replicated
from ..utils.lr_policy import make_schedule
from . import losses as L
from . import targets as T


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def _anchor_field_all_levels(cfg: Config, maps) -> np.ndarray:
    """Concatenated anchor field across RPN levels for the given maps."""
    from ..models.rpn import anchor_cell_for_level

    fields = []
    if cfg.FPN.FPN_ON:
        lvls = list(range(cfg.FPN.RPN_MIN_LEVEL, cfg.FPN.RPN_MAX_LEVEL + 1))
        for li, (lvl, fmap) in enumerate(zip(lvls, maps)):
            stride = 2 ** lvl
            cell = anchor_cell_for_level(cfg, li, stride)
            fields.append(shifted_anchor_field(cell, stride,
                                               fmap.shape[2], fmap.shape[3]))
    else:
        stride = cfg.RPN.STRIDE
        cell = anchor_cell_for_level(cfg, 0, stride)
        fields.append(shifted_anchor_field(cell, stride,
                                           maps[0].shape[2], maps[0].shape[3]))
    return np.concatenate(fields, axis=0)


def train_forward(module: GeneralizedRCNN, clips, gt_boxes, gt_keypoints,
                  gt_valid, rng, gt_masks=None, gt_mask_valid=None,
                  ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Runs inside module.apply: full training forward → (loss, metrics)."""
    cfg = module.cfg
    t = module.num_frames
    b = clips.shape[0]
    image_hw = (float(clips.shape[2]), float(clips.shape[3]))

    pyramid = module.features(clips)
    (tubes, p_scores, p_valid), rpn_raw = module.propose(
        pyramid, image_hw, train=True)

    # ---- RPN losses over the concatenated anchor field ----
    maps, _ = module._pyramid_list(pyramid)
    anchors = jnp.asarray(_anchor_field_all_levels(cfg, maps))
    logits_all = jnp.concatenate(
        [flatten_rpn_outputs(lg, dl, t)[0] for lg, dl in rpn_raw], axis=1)
    deltas_all = jnp.concatenate(
        [flatten_rpn_outputs(lg, dl, t)[1] for lg, dl in rpn_raw], axis=1)

    rng, k_anchor, k_prop = jax.random.split(rng, 3)

    def rpn_tgt_one(key, gtb, gtv):
        return T.rpn_targets(
            key, anchors, gtb, gtv, t, image_hw,
            cfg.RPN.POSITIVE_OVERLAP, cfg.RPN.NEGATIVE_OVERLAP,
            cfg.RPN.BATCH_SIZE_PER_IM, cfg.RPN.FG_FRACTION,
            float(cfg.RPN.STRADDLE_THRESH))

    atgt = jax.vmap(rpn_tgt_one)(
        jax.random.split(k_anchor, b), gt_boxes, gt_valid)
    rpn_cls, rpn_box = jax.vmap(
        lambda lg, dl, lab, bt: L.rpn_losses(
            lg, dl, lab, bt, cfg.RPN.SMOOTH_L1_BETA)
    )(logits_all, deltas_all, atgt.labels, atgt.bbox_targets)
    rpn_cls, rpn_box = jnp.mean(rpn_cls), jnp.mean(rpn_box)

    if cfg.MODEL.RPN_ONLY:
        total = rpn_cls + rpn_box
        return total, {"loss_rpn_cls": rpn_cls, "loss_rpn_bbox": rpn_box,
                       "loss_total": total}

    # ---- Proposal sampling + box head ----
    def prop_tgt_one(key, props, pv, gtb, gtk, gtv):
        return T.proposal_targets(
            key, props, pv, gtb, gtk, gtv, t,
            cfg.FAST_RCNN.BATCH_SIZE_PER_IM, cfg.FAST_RCNN.FG_FRACTION,
            cfg.FAST_RCNN.FG_THRESH, cfg.FAST_RCNN.BG_THRESH_HI,
            cfg.FAST_RCNN.BG_THRESH_LO, cfg.FAST_RCNN.BBOX_REG_WEIGHTS)

    ptgt = jax.vmap(prop_tgt_one)(
        jax.random.split(k_prop, b), tubes, p_valid,
        gt_boxes, gt_keypoints, gt_valid)

    s = ptgt.rois.shape[1]
    pooled = module.roi_transform(
        pyramid, ptgt.rois, cfg.FAST_RCNN.ROI_XFORM_RESOLUTION,
        cfg.FAST_RCNN.ROI_XFORM_SAMPLING_RATIO)        # (B·S, T, P, P, C)
    cls_logits, deltas, _ = module.box_head(pooled)
    n_cls = cfg.MODEL.NUM_CLASSES
    deltas = deltas.reshape(b * s, n_cls, t, 4)

    cls_loss, box_loss = L.fast_rcnn_losses(
        cls_logits, deltas,
        ptgt.labels.reshape(b * s),
        ptgt.bbox_targets.reshape(b * s, 4 * t),
        ptgt.bbox_weights.reshape(b * s),
        ptgt.valid.reshape(b * s),
        cfg.FAST_RCNN.SMOOTH_L1_BETA)

    total = rpn_cls + rpn_box + cls_loss + box_loss
    metrics = {"loss_rpn_cls": rpn_cls, "loss_rpn_bbox": rpn_box,
               "loss_cls": cls_loss, "loss_bbox": box_loss}

    # ---- Keypoint head on the first M (fg-sorted) RoIs ----
    if cfg.MODEL.KEYPOINTS_ON:
        kp = min(cfg.KRCNN.TRAIN_MAX_ROIS_PER_IM or s, s)
        kp_rois = ptgt.rois[:, :kp]                    # (B, KP, 4·T)
        kp_fg = ptgt.is_fg[:, :kp]
        kp_gt = ptgt.keypoint_targets[:, :kp]          # (B, KP, T, K, 3)
        kp_pooled = module.roi_transform(
            pyramid, kp_rois, cfg.KRCNN.ROI_XFORM_RESOLUTION,
            cfg.KRCNN.ROI_XFORM_SAMPLING_RATIO)
        t_kp = t
        if cfg.VIDEO.VIDEO_ON and not cfg.VIDEO.PREDICT_ALL_FRAMES:
            # Center-frame-only supervision (paper ablation / BASELINE
            # config 2): the head trains on the center frame of each tube.
            kp_pooled = kp_pooled[:, t // 2:t // 2 + 1]
            kp_rois = kp_rois.reshape(b, kp, t, 4)[:, :, t // 2].reshape(
                b, kp, 4)
            kp_gt = kp_gt[:, :, t // 2:t // 2 + 1]
            t_kp = 1
        hm_logits = module.kps_head(kp_pooled)         # (B·KP, Tk, S, S, K)
        hs = hm_logits.shape[2]
        n_kp = cfg.KRCNN.NUM_KEYPOINTS
        per_frame_rois = kp_rois.reshape(b * kp, t_kp, 4).reshape(-1, 4)
        per_frame_kps = kp_gt.reshape(b * kp, t_kp, n_kp, 3).reshape(
            -1, n_kp, 3)
        bins, w = T.keypoint_heatmap_targets(per_frame_rois, per_frame_kps,
                                             hs)
        w = w * jnp.repeat(kp_fg.reshape(-1).astype(jnp.float32),
                           t_kp)[:, None]
        kp_loss = L.keypoint_loss(
            hm_logits.reshape(-1, hs, hs, n_kp), bins, w,
            cfg.KRCNN.NORMALIZE_BY_VISIBLE_KEYPOINTS,
            cfg.KRCNN.LOSS_WEIGHT)
        total = total + kp_loss
        metrics["loss_kps"] = kp_loss

    # ---- Mask head (MODEL.MASK_ON): per-class sigmoid CE on RoI masks ----
    if cfg.MODEL.MASK_ON and gt_masks is not None:
        mb = min(cfg.MRCNN.TRAIN_MAX_ROIS_PER_IM or s, s)
        m_rois = ptgt.rois[:, :mb]                     # (B, MB, 4·T)
        m_fg = ptgt.is_fg[:, :mb]
        gi = ptgt.gt_inds[:, :mb]                      # (B, MB)
        mk_boxes = jnp.take_along_axis(
            gt_boxes, gi[..., None], axis=1)           # (B, MB, 4·T)
        mk_masks = jnp.take_along_axis(
            gt_masks, gi[..., None, None, None], axis=1)  # (B, MB, T, M, M)
        # (B, MB, T): per-frame mask-annotation validity rides the match.
        mk_valid = jnp.take_along_axis(gt_mask_valid, gi[..., None], axis=1)
        m_pooled = module.roi_transform(
            pyramid, m_rois, cfg.MRCNN.ROI_XFORM_RESOLUTION,
            cfg.MRCNN.ROI_XFORM_SAMPLING_RATIO)
        m_logits = module.mask_head(m_pooled)          # (B·MB, T, P, P, C)
        pm = m_logits.shape[2]
        mg = mk_masks.shape[-1]
        tgt_masks = T.mask_targets(
            m_rois.reshape(-1, t, 4).reshape(-1, 4),
            mk_boxes.reshape(-1, t, 4).reshape(-1, 4),
            mk_masks.reshape(-1, mg, mg), pm)          # (B·MB·T, P, P)
        w_mask = (m_fg[..., None] & mk_valid).reshape(-1)
        m_loss = L.mask_loss(
            m_logits[..., 1].reshape(-1, pm, pm),      # person channel
            tgt_masks, w_mask.astype(jnp.float32),
            cfg.MRCNN.WEIGHT_LOSS_MASK)
        total = total + m_loss
        metrics["loss_mask"] = m_loss

    metrics["loss_total"] = total
    return total, metrics


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """SGD + momentum + (masked) weight decay, LR schedule from SOLVER."""
    schedule = make_schedule(cfg.SOLVER)

    def decay_mask(params):
        # Weight decay applies to conv/fc kernels; biases and affine
        # (frozen-BN) params decay at SOLVER.WEIGHT_DECAY_BN instead
        # (0 in the lineage defaults).
        def mask_fn(path, x):
            names = [getattr(p, "key", "") for p in path]
            if "bn" in names or names[-1:] == ["bias"] or x.ndim <= 1:
                return False
            return True
        return jax.tree_util.tree_map_with_path(mask_fn, params)

    def bn_decay_mask(params):
        return jax.tree.map(lambda m: not m, decay_mask(params))

    def freeze_mask(params):
        # RESNETS.FREEZE_AT: stages <= N take no updates (lineage freezes
        # conv1 + res2 by default at N=2).
        frozen_names = {"conv1"} | {
            f"res{s}" for s in range(2, cfg.RESNETS.FREEZE_AT + 1)}

        def mask_fn(path, x):
            names = [str(getattr(p, "key", "")) for p in path]
            return any(n.split("_")[0] in frozen_names for n in names)
        return jax.tree_util.tree_map_with_path(mask_fn, params)

    txs = []
    if cfg.SOLVER.CLIP_GRAD_NORM > 0:
        txs.append(optax.clip_by_global_norm(cfg.SOLVER.CLIP_GRAD_NORM))
    if cfg.SOLVER.WEIGHT_DECAY > 0:
        txs.append(optax.add_decayed_weights(cfg.SOLVER.WEIGHT_DECAY,
                                             mask=decay_mask))
    if cfg.SOLVER.WEIGHT_DECAY_BN > 0:
        txs.append(optax.add_decayed_weights(cfg.SOLVER.WEIGHT_DECAY_BN,
                                             mask=bn_decay_mask))
    txs.append(optax.sgd(learning_rate=schedule,
                         momentum=cfg.SOLVER.MOMENTUM))
    if cfg.RESNETS.FREEZE_AT >= 1:
        txs.append(optax.masked(optax.set_to_zero(), freeze_mask))
    return optax.chain(*txs)


def create_train_state(cfg: Config, params) -> TrainState:
    tx = make_optimizer(cfg)
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))


def make_train_step(model: GeneralizedRCNN, cfg: Config,
                    mesh: Mesh = None, donate: bool = True):
    """Build the jitted train step.

    With a mesh the step runs under `shard_map` over the `data` axis:
    each device computes forward+backward on its local batch shard and only
    the gradient/metric `pmean` crosses devices (riding ICI). This is the
    explicit form of the reference's NCCL allreduce — and it prevents the
    GSPMD partitioner from inserting feature-map all-gathers around the RoI
    stage's (B·K) reshapes, which otherwise de-parallelize the head.
    """
    tx = make_optimizer(cfg)
    base_rng = jax.random.PRNGKey(cfg.RNG_SEED)

    def grads_and_metrics(params, batch, rng):
        def loss_fn(p):
            return model.apply(
                p, batch["clips"], batch["gt_boxes"],
                batch["gt_keypoints"], batch["gt_valid"], rng,
                batch.get("gt_masks"), batch.get("gt_mask_valid"),
                method=train_forward)

        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        return grads, metrics

    def apply_update(state, grads, metrics):
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    if mesh is None:
        def step_fn(state: TrainState, batch):
            rng = jax.random.fold_in(base_rng, state.step)
            grads, metrics = grads_and_metrics(state.params, batch, rng)
            return apply_update(state, grads, metrics)

        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map as _shard_map    # jax >= 0.8
        def shard_map(f=None, **kw):               # check_rep → check_vma
            kw["check_vma"] = kw.pop("check_rep", True)
            return _shard_map(f, **kw) if f else _shard_map(**kw)
    except ImportError:                            # pragma: no cover
        from jax.experimental.shard_map import shard_map

    repl = replicated(mesh)
    bsh = batch_sharded(mesh)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS)),
        out_specs=(P(), P()),
        check_rep=False)
    def sharded_grads(params, step, batch):
        # Same data → same rng on every shard would correlate sampling;
        # fold in the shard index.
        idx = jax.lax.axis_index(DATA_AXIS)
        rng = jax.random.fold_in(jax.random.fold_in(base_rng, step), idx)
        grads, metrics = grads_and_metrics(params, batch, rng)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        metrics = jax.lax.pmean(metrics, DATA_AXIS)
        return grads, metrics

    def step_fn(state: TrainState, batch):
        grads, metrics = sharded_grads(state.params, state.step, batch)
        return apply_update(state, grads, metrics)

    return jax.jit(
        step_fn,
        in_shardings=(repl, bsh),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )
