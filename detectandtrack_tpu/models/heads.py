"""RoI heads: box (cls + regression), keypoint heatmaps, mask (API parity).

Reference parity: `lib/modeling/fast_rcnn_heads.py`,
`keypoint_rcnn_heads.py` (v1convX: 8 stacked 3x3x512 convs → deconv ×2 →
nearest ×2 → K heatmaps at 56²), `mask_rcnn_heads.py` (1up4convs)
(SURVEY.md §2.1). Heads consume fixed-count padded RoI features from the
Pallas RoIAlign, so every matmul has a static (R·T, ·) shape on the MXU.

Video mode: the box head sees the full (T, P, P, C) tube feature flattened
(time is part of the fc input, as the paper's 3D heads consume the pooled 3D
feature) and regresses 4·T per-frame deltas; the keypoint head folds T into
the RoI batch to emit per-frame heatmaps (KRCNN "predict all frames") or
takes the center frame only.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .backbone import Bottleneck, Conv3d


class BoxHead2MLP(nn.Module):
    """Flatten → fc → fc → (cls logits, bbox deltas).

    deltas are per class and per frame: (R, num_classes · 4 · T).
    """

    num_classes: int = 2
    num_frames: int = 1
    hidden_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray):
        # roi_feats: (R, T, P, P, C)
        r = roi_feats.shape[0]
        x = roi_feats.reshape(r, -1).astype(self.dtype)
        # Lineage inits: fc6/7 Xavier; cls gauss(0.01); bbox gauss(0.001).
        xavier = nn.initializers.xavier_uniform()
        x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype,
                             kernel_init=xavier, name="fc6")(x))
        x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype,
                             kernel_init=xavier, name="fc7")(x))
        cls_logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                              kernel_init=nn.initializers.normal(0.01),
                              name="cls_score")(x.astype(jnp.float32))
        deltas = nn.Dense(self.num_classes * 4 * self.num_frames,
                          dtype=jnp.float32,
                          kernel_init=nn.initializers.normal(0.001),
                          name="bbox_pred")(x.astype(jnp.float32))
        # fc7 activations double as the tracker's cnn-cosine appearance
        # feature (SURVEY §3.3 cost options).
        return cls_logits, deltas, x.astype(jnp.float32)


class KeypointHead(nn.Module):
    """v1convX: N stacked convs → deconv ×2 → K heatmap logits at 2·P.

    Input (R, T, P, P, C); T folds into the RoI batch so each frame gets its
    own per-joint heatmaps → (R, T, 2P, 2P, K).

    The reference follows the deconv with a nearest ×UP_SCALE upsample to
    HEATMAP_SIZE (its custom `UpsampleNearest` op). Nearest-repeat adds NO
    information — argmax/softmax-CE over the repeated grid are algebraically
    identical to the 2P grid (CE differs by a log(UP_SCALE²) constant with
    zero gradient) — so the upsample is folded away: decode and loss run on
    the 2P logits directly, saving UP_SCALE²× of HBM traffic on the
    (R·T, S, S, K) tensors. `up_scale` is kept for config parity.
    """

    num_keypoints: int = 15
    num_convs: int = 8
    conv_dim: int = 512
    conv_kernel: int = 3                 # KRCNN.CONV_HEAD_KERNEL
    up_scale: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray):
        r, t, p, _, c = roi_feats.shape
        ck = self.conv_kernel
        x = roi_feats.reshape(r * t, 1, p, p, c)
        for i in range(self.num_convs):
            x = nn.relu(Conv3d(self.conv_dim, (1, ck, ck), use_bias=True,
                               dtype=self.dtype, name=f"conv_fcn{i + 1}")(x))
        x = x[:, 0]                                       # (R·T, P, P, C)
        # Lineage USE_DECONV_OUTPUT head: the OUTPUT layer IS one deconv —
        # ConvTranspose(conv_dim → K, 4×4, stride 2), blob kps_score_lowres
        # — no intermediate deconv, no relu, no 1×1 (keypoint_rcnn_heads.
        # add_keypoint_outputs; the deconv→256→relu→1×1 variant reviewed
        # out in r3 was a detectron2-era head that real DetectAndTrack
        # checkpoints cannot load). flax ConvTranspose padding ((2,2),(2,2))
        # is the Caffe2/torch deconv stride-2 pad-1 geometry (verified
        # numerically vs torch; Caffe2 kernels are IOHW and spatially
        # flipped on import — see utils/detectron_import.py). The lineage
        # then nearest-upsamples ×UP_SCALE to HEATMAP_SIZE (its custom
        # UpsampleNearest op) — folded away: argmax/softmax-CE over the
        # repeated grid are algebraically identical on the 2P grid.
        logits = nn.ConvTranspose(
            self.num_keypoints, (4, 4), strides=(2, 2),
            padding=((2, 2), (2, 2)), dtype=jnp.float32,
            kernel_init=nn.initializers.normal(0.001),
            name="kps_score_lowres")(x.astype(jnp.float32))
        size = logits.shape[1]
        return logits.reshape(r, t, size, size, self.num_keypoints)


class MaskHead(nn.Module):
    """1up4convs instance-mask head — part of the lineage API surface
    (unused by the PoseTrack task; MODEL.MASK_ON gates it)."""

    num_classes: int = 2
    dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray):
        r, t, p, _, c = roi_feats.shape
        x = roi_feats.reshape(r * t, 1, p, p, c)
        for i in range(4):
            x = nn.relu(Conv3d(self.dim, (1, 3, 3), use_bias=True,
                               dtype=self.dtype, name=f"mask_fcn{i + 1}")(x))
        x = x[:, 0]
        x = nn.relu(nn.ConvTranspose(self.dim, (2, 2), strides=(2, 2),
                                     dtype=self.dtype,
                                     name="conv5_mask")(x))
        logits = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                         kernel_init=nn.initializers.normal(0.001),
                         name="mask_fcn_logits")(x.astype(jnp.float32))
        return logits.reshape(r, t, logits.shape[1], logits.shape[2],
                              self.num_classes)


class Res5BoxHead(nn.Module):
    """res5 conv head variant (FAST_RCNN.ROI_BOX_HEAD == res5_head): runs the
    res5 stage on pooled RoI features then global-average-pools. Used by
    C4 (no-FPN) models in the lineage."""

    num_classes: int = 2
    num_frames: int = 1
    time_kernel: int = 1
    width: int = 512
    stride_1x1: bool = True
    dtype: Any = jnp.float32
    groups: int = 1                     # ResNeXt cardinality
    # RESNETS.RES5_DILATION: dilated-C5 geometry — res5 keeps the pooled
    # resolution (stride 1) with dilated 3x3s (lineage dilated conv5 head).
    dilation: int = 1

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray):
        x = roi_feats                                     # (R, T, P, P, C)
        for b in range(3):
            x = Bottleneck(
                features=self.width,
                out_features=2048,
                spatial_stride=(1 if self.dilation > 1 else 2)
                if b == 0 else 1,
                time_kernel=self.time_kernel,
                stride_1x1=self.stride_1x1,
                dtype=self.dtype,
                groups=self.groups,
                spatial_dilation=self.dilation,
                name=f"res5_{b}",
            )(x)
        pooled = jnp.mean(x, axis=(2, 3))                 # (R, T, C)
        r = pooled.shape[0]
        flat = pooled.reshape(r, -1).astype(jnp.float32)
        cls_logits = nn.Dense(self.num_classes,
                              kernel_init=nn.initializers.normal(0.01),
                              name="cls_score")(flat)
        deltas = nn.Dense(self.num_classes * 4 * self.num_frames,
                          kernel_init=nn.initializers.normal(0.001),
                          name="bbox_pred")(flat)
        return cls_logits, deltas, flat
