"""ResNet backbones — 2D and inflated-3D — as flax.linen modules.

Reference parity: `lib/modeling/ResNet.py` (SURVEY.md §2.1): ResNet-18/50/101
bodies with frozen BatchNorm folded into per-channel affine ("AffineChannel"),
Caffe-style stride-on-1x1 bottlenecks, stage freezing, and DetectAndTrack's
3D inflation (2D k×k kernels become t×k×k; see `inflate.py` for the weight
transform; paper arXiv:1712.09184 §3.1).

TPU-first design decisions:
- One code path for 2D and 3D: activations are (B, T, H, W, C) channels-last
  and every conv is `lax.conv_general_dilated` with a (t, kh, kw) window.
  t == 1 reproduces per-frame 2D exactly and XLA folds the unit depth away,
  so the 2D model family is the T=1 / t=1 special case, not separate code.
- Frozen BN is a per-channel scale+bias (an elementwise epilogue XLA fuses
  into the conv); there is no batch-stat path at all, matching the
  reference's AffineChannel semantics.
- Compute dtype is configurable (bfloat16 on the MXU by default); params
  stay float32.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# Per-depth stage block counts (res2..res5).
STAGE_BLOCKS = {
    "resnet18": (2, 2, 2, 2),
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
}
BASIC_ARCHS = ("resnet18",)


class AffineChannel(nn.Module):
    """Frozen BatchNorm as per-channel scale + bias (reference AffineChannel,
    incl. the Nd variant — shape-agnostic here since C is the last axis)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return (x * scale.astype(self.dtype) + bias.astype(self.dtype))


class Conv3d(nn.Module):
    """(B, T, H, W, C) conv with window (t, kh, kw); t=1 == per-frame 2D.

    Default kernel init is MSRA fill (variance_scaling fan_out), matching the
    lineage's backbone convs; prediction layers pass a gaussian init.
    """

    features: int
    kernel: Tuple[int, int, int] = (1, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    use_bias: bool = False
    dtype: Any = jnp.float32
    kernel_init: Any = None
    dilation: Tuple[int, int, int] = (1, 1, 1)
    groups: int = 1                      # ResNeXt grouped conv

    @nn.compact
    def __call__(self, x):
        t, kh, kw = self.kernel
        init = self.kernel_init or nn.initializers.variance_scaling(
            2.0, "fan_out", "normal")
        kernel = self.param(
            "kernel",
            init,
            (t, kh, kw, x.shape[-1] // self.groups, self.features),
        )
        # Same-padding for (possibly dilated) kernels: effective size
        # (k-1)·d + 1 keeps the spatial/temporal extent.
        pads = [(((k - 1) * d) // 2, ((k - 1) * d + 1) // 2)
                for k, d in zip(self.kernel, self.dilation)]
        if (self.kernel == (1, 1, 1) and self.groups == 1
                and os.environ.get("DAT_CONV1X1_DOT", "0") == "1"):
            # Experiment (DAT_CONV1X1_DOT): run 1×1 convs as a plain
            # dot_general over (B·T·H·W, Cin) — on TPU, elementwise
            # consumers (affine/residual-add/relu) can OUTPUT-FUSE into a
            # dot but not into a convolution, so this may absorb the
            # bottleneck's epilogue passes (~17 ms/iter of pure HBM
            # round-trips at 800×1344 b2, r3 trace). Exact: a strided 1×1
            # conv is subsample-then-matmul; f32 accumulation either way.
            st, sh, sw = self.strides
            y = x.astype(self.dtype)
            if (st, sh, sw) != (1, 1, 1):
                y = y[:, ::st, ::sh, ::sw, :]
            b, tt, h, w, cin = y.shape
            y = jax.lax.dot_general(
                y.reshape(b * tt * h * w, cin),
                kernel.reshape(cin, self.features).astype(self.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(self.dtype).reshape(b, tt, h, w, self.features)
        elif t == 1 and self.strides[0] == 1 and self.dilation[0] == 1:
            # Per-frame (t=1) convs run as 4-D convs with batch B·T: the
            # TPU conv emitter packs the batch dim into sublanes, and a
            # 5-D form leaves it at B (2-4) — B·T (16+) fills them. The
            # (B, T) merge/split is a free view. (r2 trace: the FPN
            # posthoc P2 conv ran at 15% MFU in the 5-D form.)
            b, tt, h, w, cin = x.shape
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype).reshape(b * tt, h, w, cin),
                kernel[0].astype(self.dtype),
                window_strides=self.strides[1:],
                padding=pads[1:],
                rhs_dilation=self.dilation[1:],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.groups,
            )
            y = y.reshape(b, tt, y.shape[1], y.shape[2], y.shape[3])
        elif self.strides[0] == 1:
            # Temporal (t>1) convs, four exact decompositions (A/B'd on
            # the real chip; DAT_TEMPORAL_CONV env selects for experiments;
            # default "auto" picks per width — see below).
            # 800x1344 b2 whole-model bench (r2): inshift 9.33 clips/s,
            # outshift 8.34 — the packed-output conv's 3x-wide HBM
            # roundtrip costs more than the copies it saves.
            #   y[τ] = Σ_k W_k * x[τ + k·d − lpad]  ≡  Σ_k z_k[τ + k·d − lpad]
            # with z_k[τ] = W_k * x[τ].
            # - "outshift": ONE 4-D conv with batch B·T computing all t taps
            #   as extra OUTPUT channels, then a time-shifted sum (static
            #   slice + zero-pad feeding adds). Zero-fill at clip edges ==
            #   the 5-D conv's temporal zero padding.
            # - "inshift" (r2 form): t time-shifted 4-D convs summed — the
            #   t shifted conv operands materialize as full-activation
            #   copies (~16% device time in the r3-early 800×1344 trace).
            # - "native5d": the direct NTHWC conv.
            # No bias here — bias/affine land after the sum.
            impl = os.environ.get("DAT_TEMPORAL_CONV", "inshift")
            b, tt, h, w, cin = x.shape
            d_t = self.dilation[0]
            lpad, rpad = pads[0]
            g = self.groups
            f = self.features
            if impl == "auto":
                # Experiment (measured and REJECTED as default): per-width
                # policy — native5d for lane-starved cin<128, inshift
                # above. In ISOLATION native5d wins the res2 shape
                # (tools/bench_conv.py res2, b4 T=8 200x336 cin=64:
                # native5d 8.70 ms vs inshift 10.83, timefold 12.07,
                # outshift 19.60). At WHOLE-MODEL scale it loses: r5
                # headline bench 10.718 clips/s / 47.0% MFU under auto vs
                # 11.35 / 49.9% under inshift — the 5-D emitter's internal
                # layouts force extra transitions against the 4-D (B·T
                # merged) form every neighboring op uses, costing more
                # than the lane fill buys. Kept selectable so the A/B is
                # reproducible; microbench wins must re-prove themselves
                # in context before becoming defaults.
                impl = "native5d" if cin < 128 else "inshift"
            if impl == "timefold" and g == 1:
                # Fold the t taps into INPUT channels and run ONE conv
                # with cin' = t·cin — the conv1 timefold trick applied to
                # mid-net temporal convs. Motivation (r5 roofline): the
                # res2 tap convs (cin=64) run at 38.6% MXU ≈ 77% of their
                # 64/128 lane ceiling; one t·cin-channel conv raises the
                # lane fill (192 → 2 tiles at 75%) and pays the grid setup
                # once. Exact: same taps, same adds. Gated to groups==1
                # (grouped kernels are block-diagonal over cin — folding
                # taps into channels would cross the group boundaries).
                xp = jnp.pad(x.astype(self.dtype),
                             ((0, 0), (lpad, rpad), (0, 0), (0, 0),
                              (0, 0)))
                xcat = jnp.concatenate(
                    [jax.lax.dynamic_slice_in_dim(xp, kt * d_t, tt,
                                                  axis=1)
                     for kt in range(t)], axis=-1)
                kcat = (kernel.astype(self.dtype)
                        .transpose(1, 2, 0, 3, 4)   # (kh, kw, t, cin, f)
                        .reshape(kh, kw, t * cin, f))
                y = jax.lax.conv_general_dilated(
                    xcat.reshape(b * tt, h, w, t * cin), kcat,
                    window_strides=self.strides[1:],
                    padding=pads[1:],
                    rhs_dilation=self.dilation[1:],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                y = y.reshape(b, tt, y.shape[1], y.shape[2], f)
            elif impl == "outshift":
                # (t, kh, kw, cin/g, f) → (kh, kw, cin/g, g, t, f/g) →
                # (kh, kw, cin/g, t·f): group-major output layout so
                # feature_group_count still sees g contiguous channel
                # groups (t-major within a group ⇒ per-tap slices are
                # channel-contiguous when g == 1).
                kw_ = (kernel.astype(self.dtype)
                       .reshape(t, kh, kw, cin // g, g, f // g)
                       .transpose(1, 2, 3, 4, 0, 5)
                       .reshape(kh, kw, cin // g, t * f))
                z = jax.lax.conv_general_dilated(
                    x.astype(self.dtype).reshape(b * tt, h, w, cin),
                    kw_,
                    window_strides=self.strides[1:],
                    padding=pads[1:],
                    rhs_dilation=self.dilation[1:],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=g,
                )
                hh, ww = z.shape[1], z.shape[2]
                z = z.reshape(b, tt, hh, ww, g, t, f // g)
                y = None
                for kt in range(t):
                    zk = z[..., kt, :].reshape(b, tt, hh, ww, f)
                    o = kt * d_t - lpad
                    if o >= 0:
                        zk = jnp.pad(zk[:, o:],
                                     ((0, 0), (0, o), (0, 0), (0, 0),
                                      (0, 0)))
                    else:
                        zk = jnp.pad(zk[:, :tt + o],
                                     ((0, 0), (-o, 0), (0, 0), (0, 0),
                                      (0, 0)))
                    y = zk if y is None else y + zk
            elif impl in ("inshift", "timefold"):
                # (timefold lands here when groups>1: the grouped fallback
                # is the inshift form.)
                xp = jnp.pad(x.astype(self.dtype),
                             ((0, 0), (lpad, rpad), (0, 0), (0, 0),
                              (0, 0)))
                y = None
                for kt in range(t):
                    xs = jax.lax.dynamic_slice_in_dim(xp, kt * d_t, tt,
                                                      axis=1)
                    yk = jax.lax.conv_general_dilated(
                        xs.reshape(b * tt, h, w, cin),
                        kernel[kt].astype(self.dtype),
                        window_strides=self.strides[1:],
                        padding=pads[1:],
                        rhs_dilation=self.dilation[1:],
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        feature_group_count=g,
                    )
                    y = yk if y is None else y + yk
                y = y.reshape(b, tt, y.shape[1], y.shape[2], y.shape[3])
            else:  # native5d
                y = jax.lax.conv_general_dilated(
                    x.astype(self.dtype),
                    kernel.astype(self.dtype),
                    window_strides=self.strides,
                    padding=pads,
                    rhs_dilation=self.dilation,
                    dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
                    feature_group_count=g,
                )
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                window_strides=self.strides,
                padding=pads,
                rhs_dilation=self.dilation,
                dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
                feature_group_count=self.groups,
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class ConvAffine(nn.Module):
    """conv → frozen-BN affine (reference detector.ConvAffine helper)."""

    features: int
    kernel: Tuple[int, int, int] = (1, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    dtype: Any = jnp.float32
    dilation: Tuple[int, int, int] = (1, 1, 1)
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        x = Conv3d(self.features, self.kernel, self.strides,
                   dtype=self.dtype, dilation=self.dilation,
                   groups=self.groups, name="conv")(x)
        return AffineChannel(self.features, dtype=self.dtype, name="bn")(x)


def _conv1_default() -> str:
    """Default conv1 decomposition. On TPU the hand-written Pallas kernel
    (kernels/conv1.py) measures fastest end-to-end (11.57 vs 11.35
    clips/s at the r5 headline, tools/bench_conv.py region 35.4 vs
    40.1 ms); off-TPU it would run in interpret mode (orders of magnitude
    slower), so CPU/GPU default to the exactness-pinned timefold form."""
    import jax
    return "pallas" if jax.default_backend() == "tpu" else "timefold"


class _Conv1Kernel(nn.Module):
    """Holds conv1's canonical (t, 7, 7, 3, 64) kernel so the param tree
    (conv1/conv/kernel) is identical whether or not the space-to-depth
    fast path is active (checkpoints/importers see one layout)."""

    time_kernel: int = 1

    @nn.compact
    def __call__(self):
        init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
        return self.param("kernel", init, (self.time_kernel, 7, 7, 3, 64))


class Conv1S2D(nn.Module):
    """conv1 as space-to-depth: 7×7/s2 on C=3 is MXU-hostile (3/128 lanes;
    ~6% MFU, the single most expensive op in the r2 800×1344 trace). The
    exact equivalent: 2×2-block the input to 12 channels and run a 4×4/s1
    conv whose kernel K'[by, bx, (py, px, c)] = K[2·by+py−1, 2·bx+px−1]
    (zero where the tap falls outside the 7×7 support), with asymmetric
    (2, 1) padding — the MLPerf ResNet conv1 trick, provably identical
    output (tested vs the plain path)."""

    time_kernel: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        t = self.time_kernel
        k = _Conv1Kernel(time_kernel=t, name="conv")()
        b, tt, h, w, _ = x.shape
        if h % 2 or w % 2:                  # odd sizes: plain path
            pads = [((t - 1) // 2, t // 2), (3, 3), (3, 3)]
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), k.astype(self.dtype),
                window_strides=(1, 2, 2), padding=pads,
                dimension_numbers=("NTHWC", "THWIO", "NTHWC"))
            return AffineChannel(64, dtype=self.dtype, name="bn")(y)

        # Scatter K (t,7,7,3,64) → K' (t,4,4,2,2,3,64) by tap parity.
        kp = jnp.zeros((t, 4, 4, 2, 2, 3, 64), k.dtype)
        for by in range(4):
            for py in range(2):
                dy = 2 * by + py - 1
                if not 0 <= dy < 7:
                    continue
                for bx in range(4):
                    for px in range(2):
                        dx = 2 * bx + px - 1
                        if 0 <= dx < 7:
                            kp = kp.at[:, by, bx, py, px].set(k[:, dy, dx])
        kp = kp.reshape(t, 4, 4, 12, 64)

        s2d_impl = os.environ.get("DAT_S2D_IMPL", "reshape")
        conv1_impl = os.environ.get("DAT_CONV1_IMPL") or _conv1_default()
        if conv1_impl == "pallas":
            # Hand-written Pallas kernel (kernels/conv1.py): folds the
            # whole 7x7xt window into the MXU contraction (K=7*6t) —
            # escapes both the emitter's 36/128 lane ceiling and its
            # ~21 ms/iter of 36-channel layout copies (r5 roofline).
            from detectandtrack_tpu.kernels.conv1 import conv1_s2d_pallas
            y = conv1_s2d_pallas(x, k, t, self.dtype,
                                 jax.default_backend() != "tpu")
            return AffineChannel(64, dtype=self.dtype, name="bn")(y)
        if s2d_impl == "fold":
            # Experiment (measured and REJECTED as default, kept for
            # reproducibility): the r5 trace shows the S2D transpose +
            # temporal pad + tap concat each materializing as a SEPARATE
            # slow layout copy (58-260 GB/s vs 819 peak; ~21 ms/iter at
            # b4 800x1344). Hypothesis: fold the W-parity into channels
            # as a pure reshape (px, c already adjacent in memory) and do
            # only the H-parity split with row-strided slices. On-chip
            # A/B (tools/bench_conv.py conv1, b4): fold 43.0 ms vs
            # reshape 40.3 — SLOWER. The copies are not assembly-order
            # bound; they are the conv emitter's own input relayout plus
            # the tiny-minor-dim (6 of 128 lanes) tiling, which every
            # assembly of a 36-channel tensor pays.
            xr = x.astype(self.dtype).reshape(b, tt, h, w // 2, 6)
            if t > 1 and conv1_impl == "timefold":
                # Build the timefold input DIRECTLY: one concat producing
                # channel order (kt, py, px, c) — no intermediate 12-ch
                # tensor, no separate pad pass (XLA fuses the pad into
                # the concat operands).
                xrp = jnp.pad(
                    xr, ((0, 0), ((t - 1) // 2, t // 2), (0, 0), (0, 0),
                         (0, 0)))
                xcat = jnp.concatenate(
                    [xrp[:, kt:kt + tt, py::2]
                     for kt in range(t) for py in range(2)], axis=-1)
                kcat = (kp.astype(self.dtype)
                        .transpose(1, 2, 0, 3, 4)  # (4, 4, t, 12, 64)
                        .reshape(4, 4, t * 12, 64))
                y = jax.lax.conv_general_dilated(
                    xcat.reshape(b * tt, h // 2, w // 2, t * 12),
                    kcat,
                    window_strides=(1, 1),
                    padding=[(2, 1), (2, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                y = y.reshape(b, tt, y.shape[1], y.shape[2], 64)
                return AffineChannel(64, dtype=self.dtype, name="bn")(y)
            xs = jnp.concatenate([xr[:, :, 0::2], xr[:, :, 1::2]],
                                 axis=-1)
        elif s2d_impl == "slices":
            # Space-to-depth as 4 strided slices + channel concat (exact
            # same (py, px, c) channel order as the reshape/transpose
            # form). A/B'd because the 7-D transpose materializes as a
            # slow layout copy (41-76 GB/s in the r4/r5 traces).
            xs = jnp.concatenate(
                [x[:, :, py::2, px::2, :]
                 for py in range(2) for px in range(2)], axis=-1)
        else:
            xs = x.reshape(b, tt, h // 2, 2, w // 2, 2, 3)
            xs = xs.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
                b, tt, h // 2, w // 2, 12)
        xs = jnp.pad(xs.astype(self.dtype),
                     ((0, 0), ((t - 1) // 2, t // 2), (0, 0), (0, 0),
                      (0, 0)))
        if t > 1 and (os.environ.get("DAT_CONV1_IMPL")
                      or _conv1_default()) == "timefold":
            # Fold the t temporal taps into INPUT CHANNELS and run ONE
            # 4-D conv with cin = 12·t. Motivation (r5 b4 trace): the
            # 12-channel tap convs ran at 9.4% MXU ≈ 12/128 — the conv
            # emitter lane-pads tiny cin, so each of the 3 taps paid for
            # a 128-lane conv. One 36-channel conv pays that price once.
            # Measured on chip (tools/bench_conv.py conv1, b4 800×1344,
            # whole region incl. relu+maxpool): timefold 40.5 ms vs
            # inshift 51.7 ms (−22%). Exact: same taps, same adds,
            # f32-accumulated either way (equivalence pinned by
            # tests/test_models.py::test_conv1_space_to_depth_exact).
            xcat = jnp.concatenate(
                [jax.lax.dynamic_slice_in_dim(xs, kt, tt, axis=1)
                 for kt in range(t)], axis=-1)
            kcat = (kp.astype(self.dtype)
                    .transpose(1, 2, 0, 3, 4)      # (4, 4, t, 12, 64)
                    .reshape(4, 4, t * 12, 64))
            y = jax.lax.conv_general_dilated(
                xcat.reshape(b * tt, h // 2, w // 2, t * 12),
                kcat,
                window_strides=(1, 1),
                padding=[(2, 1), (2, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = y.reshape(b, tt, y.shape[1], y.shape[2], 64)
            return AffineChannel(64, dtype=self.dtype, name="bn")(y)
        # Temporal taps as t shifted 4-D convs with batch B·T (the Conv3d
        # "inshift" decomposition): the 5-D NTHWC conv emitter chose
        # internal layouts that materialized ~15 ms/iter of pure copies
        # around conv1 in the r3 800×1344 trace; the 4-D form matches the
        # layout every other conv in the net uses.
        y = None
        for kt in range(t):
            xk = jax.lax.dynamic_slice_in_dim(xs, kt, tt, axis=1)
            yk = jax.lax.conv_general_dilated(
                xk.reshape(b * tt, h // 2, w // 2, 12),
                kp[kt].astype(self.dtype),
                window_strides=(1, 1),
                padding=[(2, 1), (2, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = yk if y is None else y + yk
        y = y.reshape(b, tt, y.shape[1], y.shape[2], 64)
        return AffineChannel(64, dtype=self.dtype, name="bn")(y)


class Bottleneck(nn.Module):
    """1x1 → txkxk → 1x1 bottleneck; stride on the 1x1 (Caffe/Detectron
    convention, RESNETS.STRIDE_1X1) or on the 3x3."""

    features: int                       # inner width
    out_features: int
    spatial_stride: int = 1
    time_kernel: int = 1
    stride_1x1: bool = True
    dtype: Any = jnp.float32
    spatial_dilation: int = 1
    time_dilation: int = 1
    groups: int = 1                     # ResNeXt cardinality (RESNETS.NUM_GROUPS)

    @nn.compact
    def __call__(self, x):
        s = (1, self.spatial_stride, self.spatial_stride)
        s1, s2 = (s, (1, 1, 1)) if self.stride_1x1 else ((1, 1, 1), s)
        # Temporal kernel lives on the spatial (middle) conv, mirroring the
        # paper's center-conv inflation.
        tk = self.time_kernel
        dil = (self.time_dilation, self.spatial_dilation,
               self.spatial_dilation)
        shortcut = x
        if (x.shape[-1] != self.out_features) or self.spatial_stride != 1:
            shortcut = ConvAffine(self.out_features, (1, 1, 1), s,
                                  dtype=self.dtype, name="proj")(x)
        y = ConvAffine(self.features, (1, 1, 1), s1,
                       dtype=self.dtype, name="a")(x)
        y = nn.relu(y)
        y = ConvAffine(self.features, (tk, 3, 3), s2,
                       dtype=self.dtype, dilation=dil, groups=self.groups,
                       name="b")(y)
        y = nn.relu(y)
        y = ConvAffine(self.out_features, (1, 1, 1), (1, 1, 1),
                       dtype=self.dtype, name="c")(y)
        return nn.relu(y + shortcut)


class BasicBlock(nn.Module):
    """Two 3x3 convs (ResNet-18/34 transform)."""

    features: int
    out_features: int
    spatial_stride: int = 1
    time_kernel: int = 1
    stride_1x1: bool = True             # unused; kept for a uniform signature
    dtype: Any = jnp.float32
    spatial_dilation: int = 1
    time_dilation: int = 1

    @nn.compact
    def __call__(self, x):
        s = (1, self.spatial_stride, self.spatial_stride)
        tk = self.time_kernel
        dil = (self.time_dilation, self.spatial_dilation,
               self.spatial_dilation)
        shortcut = x
        if (x.shape[-1] != self.out_features) or self.spatial_stride != 1:
            shortcut = ConvAffine(self.out_features, (1, 1, 1), s,
                                  dtype=self.dtype, name="proj")(x)
        y = ConvAffine(self.out_features, (tk, 3, 3), s,
                       dtype=self.dtype, dilation=dil, name="a")(x)
        y = nn.relu(y)
        y = ConvAffine(self.out_features, (tk, 3, 3), (1, 1, 1),
                       dtype=self.dtype, dilation=dil, name="b")(y)
        return nn.relu(y + shortcut)


class ResNet(nn.Module):
    """ResNet body returning {res2..res5} feature maps, (B, T, H/s, W/s, C).

    `time_kernels` gives the temporal kernel size for (conv1, res2..res5);
    all 1s → the 2D model. Matches the reference's per-stage
    VIDEO.TIME_KERNEL_DIM switches.
    """

    depth: str = "resnet50"
    time_kernels: Tuple[int, ...] = (1, 1, 1, 1, 1)
    num_groups: int = 1                 # ResNeXt support (1 = plain)
    width_per_group: int = 64
    stride_1x1: bool = True
    dtype: Any = jnp.float32
    # RES5_DILATION: spatial dilation on res5 3x3s; dilation 2 keeps stride
    # 16 (spatial stride of res5 becomes 1), the lineage's C4/dilated-head
    # geometry.
    res5_dilation: int = 1
    # VIDEO.DILATE_TIME: dilate the temporal kernel of res5 (doubles the
    # temporal receptive field without extra params).
    dilate_time: bool = False

    @nn.compact
    def __call__(self, x):
        blocks = STAGE_BLOCKS[self.depth]
        basic = self.depth in BASIC_ARCHS
        block_cls = BasicBlock if basic else Bottleneck
        expansion = 1 if basic else 4

        tk1 = self.time_kernels[0]
        y = Conv1S2D(time_kernel=tk1, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(y)
        y = nn.max_pool(y, (1, 3, 3), strides=(1, 2, 2),
                        padding=((0, 0), (1, 1), (1, 1)))

        feats = {}
        # ResNeXt (Detectron RESNETS.NUM_GROUPS/WIDTH_PER_GROUP): the
        # bottleneck's inner width is groups*width_per_group (256 for
        # 32x8d/64x4d at res2) but stage OUTPUT channels stay the plain-ResNet
        # 256/512/1024/2048 so FPN laterals and heads are unchanged.
        width = self.width_per_group * self.num_groups
        for stage, n_blocks in enumerate(blocks):            # res2..res5
            inner = width * (2 ** stage)
            out = 64 * expansion * (2 ** stage)
            tk = self.time_kernels[stage + 1]
            is_res5 = stage == len(blocks) - 1
            sdil = self.res5_dilation if is_res5 else 1
            tdil = 2 if (is_res5 and self.dilate_time and tk > 1) else 1
            stride = 1 if stage == 0 else 2
            if is_res5 and sdil > 1:
                stride = 1                # dilated res5 keeps stride 16
            extra = {} if basic else {"groups": self.num_groups}
            for b in range(n_blocks):
                y = block_cls(
                    features=inner,
                    out_features=out,
                    spatial_stride=stride if b == 0 else 1,
                    time_kernel=tk,
                    stride_1x1=self.stride_1x1,
                    dtype=self.dtype,
                    spatial_dilation=sdil,
                    time_dilation=tdil,
                    name=f"res{stage + 2}_{b}",
                    **extra,
                )(y)
            feats[f"res{stage + 2}"] = y
        return feats


def backbone_from_cfg(cfg) -> ResNet:
    """Build the ResNet from a Config (MODEL.CONV_BODY + VIDEO.*)."""
    tks = cfg.VIDEO.TIME_KERNEL_DIM if cfg.VIDEO.VIDEO_ON else (1, 1, 1, 1, 1)
    dtype = jnp.bfloat16 if cfg.MODEL.COMPUTE_DTYPE == "bfloat16" else (
        jnp.float32)
    return ResNet(
        depth=cfg.MODEL.CONV_BODY,
        time_kernels=tuple(tks),
        num_groups=cfg.RESNETS.NUM_GROUPS,
        width_per_group=cfg.RESNETS.WIDTH_PER_GROUP,
        stride_1x1=cfg.RESNETS.STRIDE_1X1,
        dtype=dtype,
        res5_dilation=cfg.RESNETS.RES5_DILATION,
        dilate_time=cfg.VIDEO.DILATE_TIME if cfg.VIDEO.VIDEO_ON else False,
    )
