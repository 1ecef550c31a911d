"""Pallas TPU kernel for conv1 (7x7 stride-2, temporal taps) on 3-channel
video input.

Why a hand-written kernel for ONE convolution: conv1 is the only conv in
the network whose input channel count (3) cannot fill the MXU's 128-lane
contraction, and the r5 realistic-mix roofline (artifacts/roofline_r5_*)
shows the XLA space-to-depth+timefold form costing ~33.5 ms/iter at
800x1344 b4 T=8: a 12.5 ms conv pinned at its 36/128 lane ceiling
(25.7% MXU) plus ~21 ms of layout copies the conv emitter materializes
around any 36-channel tensor (58-260 GB/s). Both terms are structural to
XLA's conv emitter (K = cin per MXU pass); the only escape is a
contraction that aggregates the kernel window into K.

The kernel formulates conv1 as K = 7 * 6t row-window matmuls
(ky, kt, W-parity, rgb all folded into the contraction) against an
XLA-side prepared tensor:

    xk[b, tau, row*(6t) + kt*6 + px*3 + c, 2 + xc]
        = x[b, tau + kt - (t-1)//2, row - 3, 2*xc + px, c]

i.e. W-parity folded into channels (pure reshape), temporal taps
kt-interleaved (so one contiguous DMA per grid step carries all frames),
channels transposed to sublanes (lanes = folded column), rows padded by
(3, 2), lanes by (2, 2), frames zero-padded. This prep is ONE fused XLA
copy (concat+transpose+pad). Inside the kernel, the four kx phases
(raw dx - 3 = 2m' + px, m' in -2..1) become four static lane-rolls of the
DMA'd slab, each contracted with its own (64, K) weight slice; stride-2
row windows are contiguous sublane slices at offset 12t*r. f32
accumulation, per-row VMEM transpose to NHWC on the way out.

MXU fill: K = 126 -> 128 (98%) x N = W/2 -> lane tiles, vs the emitter's
36/128 = 28% ceiling. Measured on chip (b4 T=8 800x1344, whole region):
see tools/bench_conv.py conv1 and STATUS r5.

Reference parity: Detectron's conv1 is a plain 7x7/s2 Caffe2 conv
(SURVEY.md section 2.2 conv ops); this kernel is bit-compatible with the
plain lax 5-D conv path (tests/test_models.py::test_conv1_space_to_depth
_exact), sharing the same canonical (t, 7, 7, 3, 64) parameter.
"""

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE_PAD = 2          # lanes: folded col xc lives at lane xc + 2
_MAX_YB = 12           # output rows per grid step (largest divisor wins)


def _pick_yb(h2: int, t: int):
    """Largest yb <= _MAX_YB dividing h2 whose grid-step HBM offset
    (2*yb*6t rows) is a multiple of the 8-row sublane tile — Mosaic
    rejects unaligned dynamic memref slices. 2*yb*6t = 12*yb*t, so the
    requirement is yb*t even. None -> caller falls back to plain conv."""
    for yb in range(min(_MAX_YB, h2), 0, -1):
        if h2 % yb == 0 and (yb * t) % 2 == 0:
            return yb
    return None


def _prep_input(x, t, dtype, tail_pad=0, lane_tail=0):
    """(B, T, H, W, 3) -> (B, T, H'*(6t) + tail_pad, W/2 + 4 + lane_tail)
    kt-interleaved, channel-on-sublane, padded. One XLA copy
    (concat+transpose+pad fuse). tail_pad: extra zero rows on the flat
    window axis so the kernel's tile-rounded last DMA stays in bounds.
    lane_tail: pads lanes to the 128 tile (Mosaic requires tile-aligned
    HBM slices; the tiled buffer is lane-padded anyway, so this is free)."""
    b, tt, h, w, _ = x.shape
    w2 = w // 2
    xr = x.astype(dtype).reshape(b, tt, h, w2, 6)
    pt0, pt1 = (t - 1) // 2, t // 2
    xp = jnp.pad(xr, ((0, 0), (pt0, pt1), (3, 2), (0, 0), (0, 0)))
    if t > 1:
        xp = jnp.concatenate([xp[:, kt:kt + tt] for kt in range(t)],
                             axis=-1)                   # (B,T,H',W2,6t)
    else:
        xp = xp[:, :tt]
    xp = xp.transpose(0, 1, 2, 4, 3)                    # (B,T,H',6t,W2)
    xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, 0),
                      (_LANE_PAD, _LANE_PAD + lane_tail)))
    hp = h + 5
    xk = xp.reshape(b, tt, hp * 6 * t, w2 + 2 * _LANE_PAD + lane_tail)
    if tail_pad:
        xk = jnp.pad(xk, ((0, 0), (0, 0), (0, tail_pad), (0, 0)))
    return xk


def _prep_weights(k7, t, dtype):
    """(t, 7, 7, 3, 64) -> (4, 64, 7*6t): per-kx-phase (m) weight slabs in
    the kernel's window K-order (ky, kt, px, c). kx = 2(m-2) + 3 + px;
    the (m=0, px=0) slot falls outside the 7-tap support and is zero."""
    k7p = jnp.pad(k7.astype(dtype),
                  ((0, 0), (0, 0), (1, 0), (0, 0), (0, 0)))
    w = jnp.stack([k7p[:, :, 2 * m:2 * m + 2] for m in range(4)])
    w = w.transpose(0, 5, 2, 1, 3, 4)       # (4, 64, ky, kt, px, c)
    return w.reshape(4, 64, 7 * t * 6)


def _conv1_kernel(xk_ref, w_ref, out_ref, scratch, sems, *, t, yb, w2,
                  tt, ny):
    """Flat 1-D grid over (b, tt, h2/yb) with a 2-slot DMA pipeline:
    grid step i computes slot i%2 while slot (i+1)%2 is in flight — the
    single-buffer form serialized 1280 synchronous ~0.7 MB copies behind
    the compute (same structure as kernels/roi_align.py's gang slots)."""
    g = 6 * t                               # rows per input image row
    k = 7 * g                               # contraction per output row
    i = pl.program_id(0)
    n = pl.num_programs(0)
    # Slice length rounded up to the 8-row sublane tile (Mosaic requires
    # tile-aligned dynamic HBM slices); _prep_input pads the input so the
    # last window's round-up stays in bounds. The offset step 2*yb*g is
    # 8-aligned by _pick_yb's yb*t-even rule.
    rows = scratch.shape[1]

    def start(idx, sl):
        bi = idx // (tt * ny)
        ti = (idx // ny) % tt
        yi = idx % ny
        pltpu.make_async_copy(
            xk_ref.at[bi, ti, pl.ds(yi * (2 * yb) * g, rows), :],
            scratch.at[sl], sems.at[sl]).start()

    @pl.when(i == 0)
    def _():
        start(0, 0)

    @pl.when(i + 1 < n)
    def _():
        start(i + 1, jax.lax.rem(i + 1, 2))

    def compute(sl):
        # Matching-shape descriptor: wait() only needs the byte count.
        pltpu.make_async_copy(
            xk_ref.at[0, 0, pl.ds(0, rows), :], scratch.at[sl],
            sems.at[sl]).wait()
        flat = scratch[sl]
        acc = [None] * yb
        for m in range(4):
            # out[l] = flat[l + m] for the used lanes l < w2 (l + m <=
            # w2 + 2 < lanes). Expressed as a static two-slice concat:
            # Mosaic's tpu.dynamic_rotate (what pltpu.roll lowers to)
            # only supports 32-bit element types; this kernel runs bf16.
            rolled = (jnp.concatenate([flat[:, m:], flat[:, :m]], axis=1)
                      if m else flat)
            wm = w_ref[m]
            for r in range(yb):
                win = rolled[2 * r * g:2 * r * g + k, :]
                d = jax.lax.dot_general(
                    wm, win, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc[r] = d if m == 0 else acc[r] + d
        for r in range(yb):
            out_ref[0, 0, r] = acc[r][:, :w2].T.astype(out_ref.dtype)

    # Statically-predicated slot read (same idiom as roi_align.py).
    cur = jax.lax.rem(i, 2)
    for sl in range(2):
        @pl.when(cur == sl)
        def _(sl=sl):
            compute(sl)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def conv1_s2d_pallas(x, k7, t, dtype, interpret=False):
    """conv1: x (B, T, H, W, 3), k7 (t, 7, 7, 3, 64) -> (B, T, H/2, W/2,
    64). 7x7 spatial stride-2 pad-3, t temporal taps zero-padded
    ((t-1)//2, t//2). H, W must be even."""
    b, tt, h, w, _ = x.shape
    h2, w2 = h // 2, w // 2
    yb = _pick_yb(h2, t)
    if yb is None:          # no tile-aligned row blocking (odd h2, odd t)
        return _conv1_reference(x, k7, t, dtype)
    g = 6 * t
    rows = (2 * yb + 5) * g
    rows_up = -(-rows // 8) * 8             # kernel's tile-rounded DMA
    wp = -(-(w2 + 2 * _LANE_PAD) // 128) * 128
    xk = _prep_input(x, t, dtype, tail_pad=rows_up - rows,
                     lane_tail=wp - (w2 + 2 * _LANE_PAD))
    wm = _prep_weights(k7, t, dtype)

    ny = h2 // yb
    kern = functools.partial(_conv1_kernel, t=t, yb=yb, w2=w2, tt=tt,
                             ny=ny)
    return pl.pallas_call(
        kern,
        grid=(b * tt * ny,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, yb, w2, 64),
            lambda i: (i // (tt * ny), (i // ny) % tt, i % ny, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, tt, h2, w2, 64), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, rows_up, wp), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xk, wm)


def _conv1_reference(x, k7, t, dtype):
    """The plain 5-D conv this kernel must match (used for the VJP)."""
    pads = [((t - 1) // 2, t // 2), (3, 3), (3, 3)]
    return jax.lax.conv_general_dilated(
        x.astype(dtype), k7.astype(dtype),
        window_strides=(1, 2, 2), padding=pads,
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"))


def _conv1_fwd(x, k7, t, dtype, interpret):
    return conv1_s2d_pallas(x, k7, t, dtype, interpret), (x, k7)


def _conv1_bwd(t, dtype, interpret, res, g):
    x, k7 = res
    _, vjp = jax.vjp(lambda xx, kk: _conv1_reference(xx, kk, t, dtype),
                     x, k7)
    return vjp(g.astype(dtype))


conv1_s2d_pallas.defvjp(_conv1_fwd, _conv1_bwd)
