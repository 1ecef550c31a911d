"""Mask head training: losses flow and the head gets gradient signal.

VERDICT r1 missing #4: the mask head ran but had no losses — MASK_ON+train
would silently train a random head. Now `train_forward` adds the per-class
sigmoid CE (parity: mask_rcnn_heads.add_mask_rcnn_losses) with targets
resampled in-graph from loader-rasterized GT bitmaps.
"""

import jax
import jax.numpy as jnp
import numpy as np

from detectandtrack_tpu.core.config import load_cfg
from detectandtrack_tpu.engine.train import (create_train_state,
                                             make_train_step)
from detectandtrack_tpu.models.detector import build_model


def test_mask_loss_trains_the_mask_head():
    cfg = load_cfg(opts=[
        "MODEL.CONV_BODY", "resnet18",
        "MODEL.COMPUTE_DTYPE", "float32",
        "MODEL.MASK_ON", True,
        "MODEL.KEYPOINTS_ON", False,
        "RPN.PRE_NMS_TOP_N_TRAIN", 64,
        "RPN.POST_NMS_TOP_N_TRAIN", 16,
        "RPN.BATCH_SIZE_PER_IM", 32,
        "FAST_RCNN.BATCH_SIZE_PER_IM", 16,
        "KRCNN.TRAIN_MAX_ROIS_PER_IM", 8,
        "TRAIN.MAX_GT_PER_IM", 2,
        "TEST.DETECTIONS_PER_IM", 4,
        "MRCNN.ROI_XFORM_RESOLUTION", 7,
        "MRCNN.RESOLUTION", 14,
    ])
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    b, t, g, m = 2, 1, 2, cfg.MRCNN.RESOLUTION
    clips = jnp.asarray(rng.normal(size=(b, t, 64, 64, 3)), jnp.float32)
    gtb = jnp.asarray(rng.uniform(5, 30, size=(b, g, 4 * t)), jnp.float32)
    gtb = gtb.at[..., 2:4].set(gtb[..., 0:2] + 24.0)
    gtk = jnp.zeros((b, g, t, cfg.KRCNN.NUM_KEYPOINTS, 3))
    masks = np.zeros((b, g, t, m, m), np.float32)
    masks[..., : m // 2, :] = 1.0            # top half on
    batch = {
        "clips": clips,
        "gt_boxes": gtb,
        "gt_keypoints": gtk,
        "gt_valid": jnp.ones((b, g), bool),
        "gt_masks": jnp.asarray(masks),
        "gt_mask_valid": jnp.ones((b, g, t), bool),  # per-(track, frame)
    }
    params = model.init(jax.random.PRNGKey(0), clips[:1])
    state = create_train_state(cfg, params)
    step = make_train_step(model, cfg, donate=False)
    new_state, metrics = step(state, batch)
    loss_mask = float(metrics["loss_mask"])
    assert np.isfinite(loss_mask) and loss_mask > 0
    # The mask head moved (nonzero gradient reached it).
    moved = 0.0
    for a, b_ in zip(jax.tree.leaves(state.params["params"]["mask_head"]),
                     jax.tree.leaves(
                         new_state.params["params"]["mask_head"])):
        moved += float(np.abs(np.asarray(a) - np.asarray(b_)).sum())
    assert moved > 0.0


def test_mask_on_without_masks_in_batch_still_trains():
    """A MASK_ON model fed a batch WITHOUT gt_masks trains the detection
    losses only (mask loss absent, not NaN)."""
    cfg = load_cfg(opts=[
        "MODEL.CONV_BODY", "resnet18",
        "MODEL.COMPUTE_DTYPE", "float32",
        "MODEL.MASK_ON", True,
        "MODEL.KEYPOINTS_ON", False,
        "RPN.PRE_NMS_TOP_N_TRAIN", 64,
        "RPN.POST_NMS_TOP_N_TRAIN", 16,
        "RPN.BATCH_SIZE_PER_IM", 32,
        "FAST_RCNN.BATCH_SIZE_PER_IM", 16,
        "TRAIN.MAX_GT_PER_IM", 2,
        "TEST.DETECTIONS_PER_IM", 4,
    ])
    model = build_model(cfg)
    rng = np.random.default_rng(1)
    clips = jnp.asarray(rng.normal(size=(1, 1, 64, 64, 3)), jnp.float32)
    gtb = jnp.asarray([[[5.0, 5, 30, 30]]])
    batch = {
        "clips": clips,
        "gt_boxes": gtb,
        "gt_keypoints": jnp.zeros((1, 1, 1, 15, 3)),
        "gt_valid": jnp.ones((1, 1), bool),
    }
    params = model.init(jax.random.PRNGKey(0), clips)
    state = create_train_state(cfg, params)
    step = make_train_step(model, cfg, donate=False)
    _, metrics = step(state, batch)
    assert "loss_mask" not in metrics
    assert np.isfinite(float(metrics["loss_total"]))
