"""Online streaming detect→track (BASELINE config 5).

The streaming sink consumes detections straight off each consumed device
batch and must reproduce the two-pass (test → track) pipeline EXACTLY:
same per-frame track ids, same metrics — asserted here on synthetic
PoseTrack with overlapping tail windows (a frame written by two windows)
and multiple videos interleaved through the bucket queues.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from detectandtrack_tpu.core.config import load_cfg
from detectandtrack_tpu.data.posetrack import PosetrackDataset
from detectandtrack_tpu.data.synthetic import generate_synthetic_posetrack
from detectandtrack_tpu.engine.inference import run_inference
from detectandtrack_tpu.models.detector import build_model
from detectandtrack_tpu.tracking.engine import (
    StreamingTrackingSink,
    run_posetrack_tracking,
)

TINY = [
    "MODEL.CONV_BODY", "resnet18",
    "MODEL.COMPUTE_DTYPE", "float32",
    "RPN.PRE_NMS_TOP_N_TEST", 50,
    "RPN.POST_NMS_TOP_N_TEST", 16,
    "TEST.DETECTIONS_PER_IM", 4,
    "TEST.SCORE_THRESH", -1.0,
    "TEST.SCALE", 64, "TEST.MAX_SIZE", 96,
    "TEST.SHAPE_BUCKETS", "[[64, 96]]",
    "KRCNN.NUM_STACKED_CONVS", 2,
    "KRCNN.CONV_HEAD_DIM", 32,
]


def test_sink_handles_out_of_order_frames():
    """Frames arriving out of order are buffered and fed to the tracker in
    frame order (multi-scale TTA bucket timing)."""
    rng = np.random.default_rng(0)

    def frame(x):
        return {
            "boxes": np.array([[x, 10.0, x + 20.0, 40.0]]),
            "scores": np.array([0.9]),
            "valid": np.array([True]),
            "keypoints": rng.normal(size=(1, 15, 3)),
        }

    frames = [frame(10.0 * i) for i in range(4)]
    sink = StreamingTrackingSink()
    for order in [1, 3, 0, 2]:          # deliberately scrambled
        sink(r"v", order, 4, frames[order])
    tracked = sink.results()["v"]
    offline = run_posetrack_tracking({"v": frames})["v"]
    assert len(tracked) == 4
    for a, b in zip(tracked, offline):
        np.testing.assert_array_equal(a["track_ids"], b["track_ids"])
        np.testing.assert_array_equal(a["boxes"], b["boxes"])


def test_sink_rejects_incomplete():
    sink = StreamingTrackingSink()
    sink("v", 0, 2, {"boxes": np.zeros((1, 4)),
                     "scores": np.ones(1), "valid": np.ones(1, bool)})
    with pytest.raises(RuntimeError):
        sink.results()


@pytest.mark.slow
def test_streaming_equals_two_pass(tmp_path):
    """One streamed pass == test-then-track, frame for frame: identical
    track ids, boxes, keypoints across 3 videos with overlapping tail
    windows (5 frames, T=2 → windows [0,1],[2,3],[3,4])."""
    json_path = generate_synthetic_posetrack(
        str(tmp_path), num_videos=3, frames_per_video=5,
        image_hw=(64, 96), people_per_video=2, seed=11)
    ds = PosetrackDataset(json_path, str(tmp_path))
    cfg = load_cfg(opts=TINY + ["VIDEO.VIDEO_ON", True,
                                "VIDEO.NUM_FRAMES", 2])
    model = build_model(cfg)
    clip = jnp.zeros((1, 2, 64, 96, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), clip)

    sink = StreamingTrackingSink(cfg=cfg)
    dets = run_inference(cfg, model, params, ds, batch_size=2,
                         frame_sink=sink)
    streamed = sink.results()
    offline = run_posetrack_tracking(dets, cfg=cfg)

    assert set(streamed) == set(offline) == set(dets)
    for vid in offline:
        assert len(streamed[vid]) == len(offline[vid]) == 5
        for s, o in zip(streamed[vid], offline[vid]):
            np.testing.assert_array_equal(s["track_ids"], o["track_ids"])
            np.testing.assert_array_equal(s["boxes"], o["boxes"])
            np.testing.assert_array_equal(s["keypoints"], o["keypoints"])


@pytest.mark.slow
def test_streaming_with_multiscale_kps_aug(tmp_path):
    """Stream mode composed with multi-scale KPS_AUG: frame emission is
    deferred to the phase-2 (heatmap-average) dispatches, so the sink's
    in-order, exactly-once contract must survive the extra pipeline stage.
    Results must equal the non-streamed aug run frame-for-frame."""
    json_path = generate_synthetic_posetrack(
        str(tmp_path), num_videos=2, frames_per_video=3,
        image_hw=(64, 96), people_per_video=1, seed=11)
    ds = PosetrackDataset(json_path, str(tmp_path))
    cfg = load_cfg(opts=TINY + [
        "TEST.BBOX_AUG_ENABLED", True,
        "TEST.BBOX_AUG_SCALES", "[32]",
        "TEST.KPS_AUG_ENABLED", True,
        "TEST.SHAPE_BUCKETS", "[[32, 64], [64, 96]]",
    ])
    model = build_model(cfg)
    clip = jnp.zeros((1, 1, 64, 96, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), clip)

    sink = StreamingTrackingSink(cfg=cfg)
    dets = run_inference(cfg, model, params, ds, frame_sink=sink)
    streamed = sink.results()

    offline = run_posetrack_tracking(dets, cfg=cfg)
    for vid in offline:
        assert len(streamed[vid]) == len(offline[vid])
        for fr_s, fr_o in zip(streamed[vid], offline[vid]):
            np.testing.assert_array_equal(fr_s["track_ids"],
                                          fr_o["track_ids"])
            np.testing.assert_allclose(fr_s["keypoints"],
                                       fr_o["keypoints"])


@pytest.mark.slow
def test_streaming_stress_interleaved_videos_memory_bound(tmp_path):
    """Scale stress (VERDICT r3 #8): many interleaved videos of MIXED
    frame sizes (different bucket routes) + multi-scale TTA + KPS_AUG,
    batch > 1 — maximal out-of-order pressure on the sink. Asserts
    (a) streamed results equal the offline two-pass run frame-for-frame,
    (b) the sink's out-of-order buffer stays O(batch × buckets × T) per
    video — it must never hold a whole video."""
    # Two size populations → two bucket routes per scale pass.
    j1 = generate_synthetic_posetrack(
        str(tmp_path / "a"), num_videos=3, frames_per_video=7,
        image_hw=(64, 96), people_per_video=2, seed=21)
    j2 = generate_synthetic_posetrack(
        str(tmp_path / "b"), num_videos=3, frames_per_video=5,
        image_hw=(96, 64), people_per_video=1, seed=22)
    # Merge into one dataset file (distinct video ids).
    import json as _json
    with open(j1) as f:
        d1 = _json.load(f)
    with open(j2) as f:
        d2 = _json.load(f)
    off = max(im["id"] for im in d1["images"]) + 1
    for im in d2["images"]:
        im["id"] += off
        im["vid_id"] = "b_" + str(im.get("vid_id", ""))
        im["file_name"] = os.path.join("..", "b", im["file_name"])
    for an in d2["annotations"]:
        an["image_id"] += off
    d1["images"] += d2["images"]
    d1["annotations"] += d2["annotations"]
    merged = str(tmp_path / "a" / "merged.json")
    with open(merged, "w") as f:
        _json.dump(d1, f)

    ds = PosetrackDataset(merged, str(tmp_path / "a"))
    assert len(ds.videos()) == 6
    # Landscape videos route main-scale→[64,96], aug→[32,64]; portrait
    # videos route main→[96,96], aug→[64,96] — crossed bucket routes, so
    # queue fill order interleaves across populations.
    buckets = [[32, 64], [64, 96], [96, 96]]
    cfg = load_cfg(opts=TINY + [
        "VIDEO.VIDEO_ON", True,
        "VIDEO.NUM_FRAMES", 2,
        "TEST.BBOX_AUG_ENABLED", True,
        "TEST.BBOX_AUG_SCALES", "[32]",
        "TEST.KPS_AUG_ENABLED", True,
        "TEST.SHAPE_BUCKETS", str(buckets),
    ])
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 2, 64, 96, 3), jnp.float32))

    batch = 2
    sink = StreamingTrackingSink(cfg=cfg)
    dets = run_inference(cfg, model, params, ds, batch_size=batch,
                         frame_sink=sink)
    streamed = sink.results()
    offline = run_posetrack_tracking(dets, cfg=cfg)

    assert set(streamed) == set(offline)
    for vid in offline:
        assert len(streamed[vid]) == len(offline[vid])
        for s, o in zip(streamed[vid], offline[vid]):
            np.testing.assert_array_equal(s["track_ids"], o["track_ids"])
            np.testing.assert_array_equal(s["boxes"], o["boxes"])

    t = cfg.VIDEO.NUM_FRAMES
    bound = batch * len(buckets) * t * 2
    for vid, hw in sink.buffer_high_water.items():
        n_frames = len(offline[vid])
        assert hw <= bound, (vid, hw, bound)
        if n_frames > bound:          # the bound actually bites here
            assert hw < n_frames
