"""RPN / tube-RPN heads and in-graph fixed-shape proposal generation.

Reference parity: `lib/modeling/rpn_heads.py` + `lib/ops/generate_proposals.py`
+ `lib/ops/collect_and_distribute_fpn_rpn_proposals.py` (SURVEY.md §2.1, §3.1).
The reference runs proposal decode + NMS as a host PythonOp (Cython NMS) in
the middle of the GPU graph — the per-iteration GPU-idle bubble called out in
SURVEY §3.1. Here the whole thing is jnp inside the jitted graph with static
top-k budgets, so XLA fuses straight through.

Video mode (paper §3.2): anchors are replicated across T frames and the
regression head emits 4·T deltas per anchor → decoded per-frame boxes form a
spatiotemporal tube. Objectness is single per tube. The head consumes
time-mean-pooled features (design choice documented here: the reference's
exact temporal collapse could not be re-verified because the mount was empty;
mean-pool is shape-correct and differentiable).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import boxes as box_ops
from ..ops.nms import nms_fixed
from .backbone import Conv3d


class RPNHead(nn.Module):
    """Shared conv trunk + objectness / tube-delta predictors.

    Weights are shared across FPN levels (call once per level), matching the
    lineage's single-head-multi-level wiring.
    """

    dim: int = 256
    num_anchors: int = 3
    num_frames: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # x: (B, T, H, W, C) → collapse time for the trunk; tubes come from
        # the 4T-delta regressor.
        x = jnp.mean(x, axis=1, keepdims=True)
        # Lineage inits: trunk gauss(0.01); predictors gauss(0.01).
        g01 = nn.initializers.normal(0.01)
        h = nn.relu(Conv3d(self.dim, (1, 3, 3), use_bias=True,
                           dtype=self.dtype, kernel_init=g01,
                           name="conv")(x))
        logits = Conv3d(self.num_anchors, (1, 1, 1), use_bias=True,
                        dtype=self.dtype, kernel_init=g01, name="logits")(h)
        deltas = Conv3d(self.num_anchors * 4 * self.num_frames, (1, 1, 1),
                        use_bias=True, dtype=self.dtype, kernel_init=g01,
                        name="deltas")(h)
        # (B, H, W, A), (B, H, W, A*4T)
        return logits[:, 0], deltas[:, 0]


def flatten_rpn_outputs(
    logits: jnp.ndarray, deltas: jnp.ndarray, num_frames: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B,H,W,A), (B,H,W,A·4T) → (B, H·W·A), (B, H·W·A, 4T).

    Row-major (y, x, anchor) ordering — must match
    `anchors.shifted_anchor_field`.
    """
    b = logits.shape[0]
    scores = logits.reshape(b, -1)
    deltas = deltas.reshape(b, -1, 4 * num_frames)
    return scores, deltas


def decode_tube_proposals(
    anchors: jnp.ndarray,          # (N, 4) spatial anchors at this level
    deltas: jnp.ndarray,           # (N, 4T)
    image_hw: Tuple[float, float],
    num_frames: int,
) -> jnp.ndarray:
    """Per-frame delta decode against replicated anchors → (N, 4T), clipped."""
    tube_anchors = jnp.tile(anchors, (1, num_frames))
    boxes = box_ops.bbox_transform(tube_anchors, deltas)
    return box_ops.clip_boxes(boxes, image_hw[0], image_hw[1])


def _center_frame_box(tubes: jnp.ndarray, num_frames: int) -> jnp.ndarray:
    """Representative 2D box of a tube (center frame) for NMS."""
    c = (num_frames // 2) * 4
    return tubes[..., c:c + 4]


def anchor_cell_for_level(cfg, level_index: int, stride: int):
    """Per-level RPN anchor cell under the lineage convention: with FPN,
    ONE RPN.SIZES entry per level; single-level (C4) uses the full SIZES
    set. Shared by the inference proposal path (detector.propose) and the
    training target builder (engine.train._anchor_field_all_levels) so the
    anchor ordering the RPN loss assumes can never diverge from the
    ordering the logits are produced in."""
    from ..ops.anchors import generate_anchors

    if cfg.FPN.FPN_ON:
        return generate_anchors(stride, [cfg.RPN.SIZES[level_index]],
                                cfg.RPN.ASPECT_RATIOS)
    return generate_anchors(stride, cfg.RPN.SIZES, cfg.RPN.ASPECT_RATIOS)


def collect_fpn_proposals(
    per_level: Sequence[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]],
    max_out: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Merge per-level (tubes, scores, valid) and keep global top `max_out`.

    Parity: CollectAndDistributeFpnRpnProposals' collect step (the distribute
    step — mapping RoIs back to levels — happens at RoIAlign time via
    `assign_fpn_levels`).
    """
    tubes = jnp.concatenate([p[0] for p in per_level], axis=0)
    scores = jnp.concatenate([p[1] for p in per_level], axis=0)
    valid = jnp.concatenate([p[2] for p in per_level], axis=0)
    masked = jnp.where(valid, scores, -jnp.inf)
    k = min(max_out, masked.shape[0])
    top_scores, idx = jax.lax.top_k(masked, k)
    return tubes[idx], top_scores, valid[idx] & jnp.isfinite(top_scores)
