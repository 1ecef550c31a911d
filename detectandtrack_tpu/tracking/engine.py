"""Tracking engine: link per-frame detections into tracks, write results,
evaluate.

Reference parity: `lib/core/tracking_engine.py` (SURVEY.md §3.3): load
detections grouped by video, link frame pairs, assign/propagate track IDs,
write PoseTrack-format results, evaluate MOTA + mAP. Host-only; consumes the
detector's padded (boxes, scores, keypoints, valid) tensors.

Detections input format (per video): a list of frames, each a dict with
  boxes (D, 4) · scores (D,) · keypoints (D, K, >=2) · valid (D,)
optionally features (D, F). Padded rows are dropped via `valid`.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterable, List, Optional, Sequence

import numpy as np

from .evaluation import PoseAnnotation, PosetrackEvaluator
from .tracker import Tracker, TrackerConfig


def run_tracker_on_video(
    frames: Sequence[dict],
    tracker: Optional[Tracker] = None,
    cfg=None,
) -> List[dict]:
    """Assign track ids to each frame's detections.

    Returns a list of per-frame dicts with an added `track_ids (D,)` array
    (−1 for dropped/padded detections).
    """
    if tracker is None:
        tracker = Tracker.from_cfg(cfg) if cfg is not None else Tracker()
    tracker.reset()
    out = []
    for frame in frames:
        kwargs = {}
        if frame.get("keypoints") is not None:
            kwargs["keypoints"] = np.asarray(frame["keypoints"])[..., :2]
        if frame.get("features") is not None:
            kwargs["features"] = np.asarray(frame["features"])
        ids = tracker.update(
            np.asarray(frame["boxes"], np.float64),
            np.asarray(frame["scores"], np.float64),
            valid=frame.get("valid"),
            **kwargs)
        out.append({**frame, "track_ids": ids})
    return out


def run_posetrack_tracking(
    detections_by_video: Dict[str, Sequence[dict]],
    cfg=None,
) -> Dict[str, List[dict]]:
    """Stage-2 entry point over a whole dataset (parity: tracking_engine.run)."""
    results = {}
    for video, frames in detections_by_video.items():
        results[video] = run_tracker_on_video(frames, cfg=cfg)
    return results


def write_posetrack_results(
    tracked_by_video: Dict[str, List[dict]],
    output_dir: str,
    keypoint_names: Optional[List[str]] = None,
) -> List[str]:
    """Write per-video PoseTrack-format JSON (annolist-style) results."""
    os.makedirs(output_dir, exist_ok=True)
    paths = []
    for video, frames in tracked_by_video.items():
        annolist = []
        for fi, frame in enumerate(frames):
            annorect = []
            ids = frame["track_ids"]
            for di in range(len(ids)):
                if ids[di] < 0:
                    continue
                box = np.asarray(frame["boxes"][di], float)
                kps = np.asarray(frame["keypoints"][di], float)
                points = [
                    {"id": [k], "x": [float(kps[k, 0])],
                     "y": [float(kps[k, 1])],
                     "score": [float(kps[k, 2]) if kps.shape[1] > 2 else 1.0]}
                    for k in range(kps.shape[0])]
                annorect.append({
                    "x1": [float(box[0])], "y1": [float(box[1])],
                    "x2": [float(box[2])], "y2": [float(box[3])],
                    "score": [float(frame["scores"][di])],
                    "track_id": [int(ids[di])],
                    "annopoints": [{"point": points}],
                })
            name = frame.get("image_name", f"frame_{fi:06d}")
            annolist.append({"image": [{"name": name}],
                             "annorect": annorect})
        safe = video.replace("/", "_")
        path = os.path.join(output_dir, f"{safe}.json")
        with open(path, "w") as f:
            json.dump({"annolist": annolist}, f)
        paths.append(path)
    return paths


def evaluate_tracking(
    tracked_by_video: Dict[str, List[dict]],
    gt_by_video: Dict[str, Sequence[Sequence[PoseAnnotation]]],
    num_joints: int = 15,
) -> Dict[str, float]:
    """PoseTrack mAP + MOTA over tracked results vs per-frame GT poses."""
    ev = PosetrackEvaluator(num_joints)
    for video, frames in tracked_by_video.items():
        ev.start_video()
        gt_frames = gt_by_video.get(video, [])
        for fi, frame in enumerate(frames):
            preds = []
            ids = frame["track_ids"]
            for di in range(len(ids)):
                if ids[di] < 0:
                    continue
                preds.append(PoseAnnotation(
                    keypoints=np.asarray(frame["keypoints"][di], float),
                    box=np.asarray(frame["boxes"][di], float),
                    track_id=int(ids[di]),
                    score=float(frame["scores"][di])))
            gts = list(gt_frames[fi]) if fi < len(gt_frames) else []
            ev.add_frame(gts, preds)
    return ev.summarize()
