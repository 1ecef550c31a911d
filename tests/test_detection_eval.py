"""Dataset-level per-frame detection eval chained after `--mode test`.

Parity: the reference's test_engine ends in "datasets eval" — keypoint
OKS-AP / box AP (/ mask AP) over detections.pkl, BEFORE tracking
(SURVEY.md §3.2). These tests pin `evaluate_detections`: perfect
predictions score AP 100, the metric keys exist for every enabled head,
and the end-to-end model path produces the keys (including MASK_ON).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from detectandtrack_tpu.core.config import load_cfg
from detectandtrack_tpu.data.posetrack import PosetrackDataset
from detectandtrack_tpu.data.synthetic import generate_synthetic_posetrack
from detectandtrack_tpu.tracking.evaluation import evaluate_detections


def _dets_from_gt(ds, noise=0.0, seed=0):
    """Perfect (or jittered) detections straight from the dataset GT, in
    the exact frame-dict schema `run_inference` emits."""
    rng = np.random.default_rng(seed)
    dets = {}
    for vid in ds.videos():
        frames = []
        for rec in ds.video_frames(vid):
            gts = ds.gt_poses(rec)
            boxes = np.stack([g["box"] for g in gts]) + \
                rng.normal(scale=noise, size=(len(gts), 4))
            kps = np.stack([g["keypoints"] for g in gts]).astype(np.float64)
            kps[..., 2] = 0.9            # prob channel
            frames.append({
                "boxes": boxes.astype(np.float64),
                "scores": np.linspace(0.95, 0.6, len(gts)),
                "valid": np.ones(len(gts), bool),
                "keypoints": kps,
            })
        dets[vid] = frames
    return dets


def test_perfect_detections_score_ap100(tmp_path):
    json_path = generate_synthetic_posetrack(
        str(tmp_path), num_videos=2, frames_per_video=4,
        image_hw=(64, 96), people_per_video=2, seed=3)
    ds = PosetrackDataset(json_path, str(tmp_path))
    m = evaluate_detections(_dets_from_gt(ds), ds)
    assert m["box_AP"] == pytest.approx(100.0)
    assert m["box_AP50"] == pytest.approx(100.0)
    assert m["keypoint_AP"] == pytest.approx(100.0)
    assert "mask_AP" not in m            # MASK_ON off → no mask keys


def test_jittered_boxes_drop_high_iou_ap_only(tmp_path):
    """Small box noise must hurt AP75 more than AP50 (sanity that the
    matching actually sweeps IoU thresholds)."""
    json_path = generate_synthetic_posetrack(
        str(tmp_path), num_videos=1, frames_per_video=6,
        image_hw=(64, 96), people_per_video=2, seed=4)
    ds = PosetrackDataset(json_path, str(tmp_path))
    m = evaluate_detections(_dets_from_gt(ds, noise=2.0, seed=4), ds)
    assert m["box_AP50"] >= m["box_AP75"]
    assert m["box_AP"] < 100.0


def test_mask_eval_keys_and_perfect_rect_masks(tmp_path):
    """MASK_ON adds mask_AP*; an all-ones RoI prob grid pastes to the
    detection box, which overlaps the inscribed-ellipse GT at IoU in
    (0.5, 0.785] — AP50 must see it as a match."""
    json_path = generate_synthetic_posetrack(
        str(tmp_path), num_videos=1, frames_per_video=3,
        image_hw=(64, 96), people_per_video=1, seed=5)
    ds = PosetrackDataset(json_path, str(tmp_path))
    dets = _dets_from_gt(ds)
    for frames in dets.values():
        for fr in frames:
            fr["masks"] = np.full((len(fr["scores"]), 28, 28), 0.99,
                                  np.float32)
    m = evaluate_detections(dets, ds, mask_on=True)
    for k in ("mask_AP", "mask_AP50", "mask_AP75",
              "box_AP", "keypoint_AP"):
        assert k in m
    assert m["mask_AP50"] == pytest.approx(100.0)


@pytest.mark.slow
def test_end_to_end_model_detections_evaluate(tmp_path):
    """run_inference output (random weights) feeds evaluate_detections
    without schema friction, MASK_ON included — the `--mode test` chain."""
    from detectandtrack_tpu.engine.inference import run_inference
    from detectandtrack_tpu.models.detector import build_model

    json_path = generate_synthetic_posetrack(
        str(tmp_path), num_videos=1, frames_per_video=2,
        image_hw=(64, 96), people_per_video=1, seed=6)
    ds = PosetrackDataset(json_path, str(tmp_path))
    cfg = load_cfg(opts=[
        "MODEL.CONV_BODY", "resnet18",
        "MODEL.COMPUTE_DTYPE", "float32",
        "MODEL.MASK_ON", True,
        "RPN.PRE_NMS_TOP_N_TEST", 50,
        "RPN.POST_NMS_TOP_N_TEST", 16,
        "TEST.DETECTIONS_PER_IM", 4,
        "TEST.SCORE_THRESH", -1.0,
        "TEST.SCALE", 64, "TEST.MAX_SIZE", 96,
        "TEST.SHAPE_BUCKETS", "[[64, 96]]",
        "KRCNN.NUM_STACKED_CONVS", 2,
        "KRCNN.CONV_HEAD_DIM", 32,
    ])
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 1, 64, 96, 3), jnp.float32))
    dets = run_inference(cfg, model, params, ds)
    m = evaluate_detections(dets, ds, mask_on=True)
    for k in ("box_AP", "keypoint_AP", "mask_AP"):
        assert k in m and np.isfinite(m[k])
