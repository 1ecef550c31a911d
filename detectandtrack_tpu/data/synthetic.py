"""Synthetic PoseTrack-style dataset generator.

The reference's correctness story is "reproduce the metrics on PoseTrack"
(SURVEY.md §4); PoseTrack itself is not on this machine, so tests, CI and
the bench harness use a generated stand-in: videos of moving "people"
(rectangles with a deterministic 15-joint skeleton), written as JPEG frames
+ a PoseTrack-schema COCO JSON with track ids and head boxes. The detector
can overfit it in minutes, giving an end-to-end mAP/MOTA smoke signal.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Tuple

import numpy as np

from ..ops.keypoints import POSETRACK_KEYPOINTS


def _skeleton(box: np.ndarray) -> np.ndarray:
    """Deterministic 15-joint pose inside a person box (x1, y1, x2, y2)."""
    x1, y1, x2, y2 = box
    w, h = x2 - x1, y2 - y1
    # (fx, fy) fractions per joint, roughly humanoid.
    f = {
        "head_top": (0.5, 0.05), "nose": (0.5, 0.12),
        "head_bottom": (0.5, 0.2),
        "right_shoulder": (0.3, 0.3), "left_shoulder": (0.7, 0.3),
        "right_elbow": (0.2, 0.45), "left_elbow": (0.8, 0.45),
        "right_wrist": (0.15, 0.6), "left_wrist": (0.85, 0.6),
        "right_hip": (0.35, 0.55), "left_hip": (0.65, 0.55),
        "right_knee": (0.35, 0.75), "left_knee": (0.65, 0.75),
        "right_ankle": (0.35, 0.95), "left_ankle": (0.65, 0.95),
    }
    kps = np.zeros((15, 3), np.float32)
    for i, name in enumerate(POSETRACK_KEYPOINTS):
        fx, fy = f[name]
        kps[i] = (x1 + fx * w, y1 + fy * h, 2.0)
    return kps


def generate_synthetic_posetrack(
    out_dir: str,
    num_videos: int = 2,
    frames_per_video: int = 8,
    image_hw: Tuple[int, int] = (256, 320),
    people_per_video: int = 2,
    seed: int = 0,
    write_images: bool = True,
) -> str:
    """Create `<out_dir>/{train.json, <video>/<frame>.jpg}`; returns the
    JSON path. Schema matches `PosetrackDataset` expectations."""
    rng = np.random.default_rng(seed)
    h, w = image_hw
    os.makedirs(out_dir, exist_ok=True)

    images, annotations = [], []
    img_id, ann_id = 0, 0
    for v in range(num_videos):
        vid = f"video_{v:04d}"
        vdir = os.path.join(out_dir, vid)
        if write_images:
            os.makedirs(vdir, exist_ok=True)
        # Person trajectories: start box + velocity.
        sizes = rng.uniform(60, 110, (people_per_video, 2))
        pos = rng.uniform(0.05, 0.55, (people_per_video, 2)) * [w, h]
        vel = rng.uniform(-6, 6, (people_per_video, 2))
        colors = rng.integers(80, 255, (people_per_video, 3))

        for t in range(frames_per_video):
            fname = os.path.join(vid, f"{t:06d}.jpg")
            frame = np.full((h, w, 3), 32, np.uint8)
            img_id += 1
            images.append({
                "id": img_id, "file_name": fname, "vid_id": vid,
                "frame_id": t, "width": w, "height": h,
            })
            for p in range(people_per_video):
                x, y = pos[p] + vel[p] * t
                pw, ph = sizes[p]
                x = float(np.clip(x, 0, w - pw - 1))
                y = float(np.clip(y, 0, h - ph - 1))
                box = np.array([x, y, x + pw, y + ph], np.float32)
                if write_images:
                    xi, yi = int(x), int(y)
                    frame[yi:yi + int(ph), xi:xi + int(pw)] = colors[p]
                    # head blob (brighter) for the top fifth
                    frame[yi:yi + int(ph / 5),
                          xi + int(pw / 4):xi + int(3 * pw / 4)] = 255
                kps = _skeleton(box)
                # Ellipse segmentation inscribed in the box (12-gon) so
                # mask-head training has real (non-rectangle) targets.
                th = np.linspace(0, 2 * np.pi, 12, endpoint=False)
                poly = np.stack([
                    x + pw / 2 + (pw / 2) * np.cos(th),
                    y + ph / 2 + (ph / 2) * np.sin(th)], axis=1)
                ann_id += 1
                annotations.append({
                    "id": ann_id, "image_id": img_id, "category_id": 1,
                    "bbox": [x, y, float(pw), float(ph)],
                    "keypoints": kps.reshape(-1).tolist(),
                    "track_id": p,
                    "head_box": [x + pw / 4, y, x + 3 * pw / 4, y + ph / 5],
                    "area": float(pw * ph),
                    "iscrowd": 0,
                    "num_keypoints": 15,
                    "segmentation": [poly.reshape(-1).tolist()],
                })
            if write_images:
                import cv2
                cv2.imwrite(os.path.join(out_dir, fname), frame)

    doc = {
        "images": images,
        "annotations": annotations,
        "categories": [{
            "id": 1, "name": "person",
            "keypoints": POSETRACK_KEYPOINTS,
        }],
    }
    json_path = os.path.join(out_dir, "train.json")
    with open(json_path, "w") as f:
        json.dump(doc, f)
    return json_path
