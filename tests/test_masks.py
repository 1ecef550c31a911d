"""Mask inference consumption: paste, rasterize, mask AP, e2e output.

VERDICT r2 #5: MASK_ON detections must be consumed at inference — the
detector's RoI-frame sigmoid masks flow through make_detect_fn /
clip_slice / detections_to_frames to the host, where ops.masks pastes
them into the image and tracking.evaluation.eval_mask_ap scores them
(parity: im_detect_mask → segm_results → evaluate_masks).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from detectandtrack_tpu.ops.masks import (
    mask_iou_matrix,
    paste_mask,
    rasterize_polygons,
)
from detectandtrack_tpu.tracking.evaluation import eval_mask_ap


def test_paste_mask_covers_box():
    mask = np.ones((14, 14), np.float32)
    box = np.array([20.0, 30.0, 60.0, 70.0])
    out = paste_mask(mask, box, 100, 100)
    assert out.dtype == bool and out.shape == (100, 100)
    # Interior of the box is solidly covered...
    assert out[35:65, 25:55].all()
    # ...and far outside is empty.
    assert not out[:20].any() and not out[80:].any()
    assert not out[:, :10].any() and not out[:, 70:].any()


def test_paste_mask_clips_to_image():
    mask = np.ones((14, 14), np.float32)
    box = np.array([-10.0, -10.0, 20.0, 20.0])   # spills off the corner
    out = paste_mask(mask, box, 50, 50)
    assert out[:15, :15].any()
    assert out.shape == (50, 50)


def test_rasterize_roundtrip_iou():
    """Rasterized GT polygon vs its own paste-reconstruction: IoU ≈ 1."""
    # Axis-aligned square polygon.
    poly = [[10.0, 10.0, 40.0, 10.0, 40.0, 40.0, 10.0, 40.0]]
    gt = rasterize_polygons(poly, 64, 64)
    pred = paste_mask(np.ones((28, 28), np.float32),
                      np.array([10.0, 10.0, 40.0, 40.0]), 64, 64)
    iou = mask_iou_matrix([pred], [gt])[0, 0]
    assert iou > 0.9, iou


def test_mask_iou_matrix_disjoint_and_identical():
    a = np.zeros((10, 10), bool)
    a[:5] = True
    b = np.zeros((10, 10), bool)
    b[5:] = True
    iou = mask_iou_matrix([a, b], [a, b])
    np.testing.assert_allclose(np.diag(iou), 1.0)
    assert iou[0, 1] == 0.0 and iou[1, 0] == 0.0


def test_eval_mask_ap_perfect():
    m1 = np.zeros((20, 20), bool)
    m1[2:8, 2:8] = True
    m2 = np.zeros((20, 20), bool)
    m2[10:18, 10:18] = True
    preds = {"im0": [(m1, 0.9), (m2, 0.8)]}
    gts = {"im0": [m1.copy(), m2.copy()]}
    r = eval_mask_ap(preds, gts)
    assert r["AP"] == pytest.approx(100.0)


def test_eval_mask_ap_partial_recall_not_inflated():
    """ADVICE r2 semantics carried to masks: 1 matched pred vs 2 GTs must
    interpolate to 51/101, not 100 (no credit beyond max achieved
    recall)."""
    m1 = np.zeros((20, 20), bool)
    m1[2:8, 2:8] = True
    m2 = np.zeros((20, 20), bool)
    m2[10:18, 10:18] = True
    preds = {"im0": [(m1, 0.9)]}
    gts = {"im0": [m1.copy(), m2.copy()]}
    r = eval_mask_ap(preds, gts)
    assert r["AP"] == pytest.approx(100.0 * 51 / 101)


@pytest.mark.slow
def test_mask_on_inference_emits_frame_masks():
    """MASK_ON: masks flow device → make_detect_fn → clip_slice →
    detections_to_frames as (D, S, S) RoI-frame probabilities in [0, 1]."""
    from detectandtrack_tpu.core.config import load_cfg
    from detectandtrack_tpu.engine.inference import (
        clip_slice, detections_to_frames, make_detect_fn)
    from detectandtrack_tpu.models.detector import build_model

    cfg = load_cfg(opts=[
        "MODEL.CONV_BODY", "resnet18",
        "MODEL.COMPUTE_DTYPE", "float32",
        "MODEL.MASK_ON", True,
        "MODEL.KEYPOINTS_ON", False,
        "RPN.PRE_NMS_TOP_N_TEST", 50,
        "RPN.POST_NMS_TOP_N_TEST", 16,
        "TEST.DETECTIONS_PER_IM", 4,
        "TEST.SCORE_THRESH", -1.0,
        "TEST.SHAPE_BUCKETS", "[[64, 96]]",
        "MRCNN.ROI_XFORM_RESOLUTION", 7,
    ])
    model = build_model(cfg)
    clips = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 1, 64, 96, 3)),
        jnp.float32)
    params = model.init(jax.random.PRNGKey(0), clips)
    detect = make_detect_fn(model)
    out = detect(params, clips)
    assert "masks" in out
    masks = np.asarray(out["masks"])
    assert masks.shape[:3] == (1, 4, 1)          # (B, D, T, S, S)
    assert masks.shape[3] == masks.shape[4] == 14  # 2x deconv of 7
    assert (masks >= 0).all() and (masks <= 1).all()

    single = clip_slice(jax.tree.map(np.asarray, out), 0)
    frames = detections_to_frames(single, num_frames=1, scale=1.0)
    assert frames[0]["masks"].shape == (4, 14, 14)


def test_paste_mask_truncates_expanded_box():
    """segm_results int-casts (truncates) the padded box — rounding up
    shifts the pasted mask by 1 px for ~half of all boxes (review r3)."""
    mask = np.ones((4, 4), np.float32)
    # Expanded x1 = 15.4 − 6.6 = 8.8: truncation → 8; the old
    # int(x + 0.5) rounding → 9. The mask's own zero padding keeps the
    # first covered column one in from the box edge, so compare the
    # paste ORIGIN via the full-row extent at a permissive threshold.
    box = np.array([11.0, 11.0, 19.8, 19.8])
    out = paste_mask(mask, box, 40, 40, thresh=0.01)
    ys, xs = np.nonzero(out)
    # The origin column itself interpolates to exactly 0 (zero pad ring,
    # cv2 edge clamp), so the first VISIBLE column is origin+1: 9 under
    # truncation, 10 under the old rounding.
    assert xs.min() == 9 and ys.min() == 9
