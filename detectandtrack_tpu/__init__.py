"""detectandtrack_tpu — a TPU-native rebuild of facebookresearch/DetectAndTrack.

A from-scratch JAX/XLA/Pallas framework for video pose estimation and pose
tracking (CVPR'18 "Detect-and-Track: Efficient Pose Estimation in Videos",
arXiv:1712.09184), re-designed TPU-first:

- The whole (3D) Mask R-CNN — inflated-3D ResNet backbone, tube RPN,
  RoIAlign(-3D), box + keypoint heads, proposal decode and NMS — runs as ONE
  jitted XLA graph with fixed shapes (padding + validity masks everywhere).
- RoIAlign / RoIAlign-3D are Pallas TPU kernels (`kernels/roi_align.py`).
- Input is a host pipeline emitting fixed-shape padded NCTHW clips.
- Stage-2 tracking (Hungarian bipartite matching over per-frame detections)
  stays on host, consuming device tensors asynchronously.

Reference parity: the public API mirrors the reference's layer map (see
SURVEY.md §1-§3); the reference mount was empty this round so citations are to
SURVEY.md sections rather than reference file:line.
"""

__version__ = "0.1.0"
