"""RoIAlign / RoIAlign-3D as Pallas TPU kernels.

Reference parity: the reference ships custom Caffe2 C++/CUDA ops `RoIAlign`
and its 3D/tube variant (SURVEY.md §2.2) doing per-sample bilinear gather.
A gather kernel is the CUDA-native design; the TPU-native redesign exploits
that RoIAlign is **separable**:

    out[p, q, c] = Σ_i Σ_j A[p, i] · B[q, j] · patch[i, j, c]

where A (P×PH) and B (P×PW) are per-RoI interpolation matrices (bilinear hat
weights averaged over the sampling grid — sample y-coords depend only on the
bin row, x-coords only on the bin column, and the bilinear weight factorizes
as wy·wx). So the kernel is: DMA a fixed patch around the RoI from HBM into
VMEM, build A and B on the VPU, and run two small matmuls on the MXU. No
gathers, no scalar loops, MXU-friendly, double-buffered across the RoI grid.

RoIAlign-3D ("tube pooling": per-frame RoIAlign along a tube, time axis
preserved) is the same kernel with the grid flattened over (roi, frame) pairs
and per-pair feature-slab indices.

Coordinate semantics match Detectron's RoIAlign: continuous coordinates,
`spatial_scale` applied to box coords, `roi_size = max(end - start, 1)`,
sampling_ratio² samples per bin at bin-interior positions, samples STRICTLY outside
[-1, size] contribute zero (Caffe2 skips only y < -1 or y > height —
boundary samples are clamped and included), in-range samples clamp to
[0, size-1].

A pure-XLA reference implementation (`roi_align_reference`) provides the
numpy-checkable oracle, the CPU path, and the backward pass (the Pallas
forward is wrapped in custom_vjp whose backward is the XLA vjp of the
reference — identical math).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Default patch slab DMA'd per RoI. With FPN level assignment an RoI spans at
# most ~2× the canonical 14 feature cells (+bilinear halo). The W-origin of
# the per-RoI DMA must be 8-aligned (sublane tiling), so the x-origin is
# rounded down by up to 7 cells and the wrapper pads the map's W by `patch`.
# CONTRACT: correct for RoIs spanning <= patch-8 cells in x and patch-1 in y
# (or when the map itself fits in the patch); callers pick patch accordingly
# (the FPN wrapper does).
_PATCH = 40
_ALIGN = 8


# ---------------------------------------------------------------------------
# Pure-XLA reference (oracle, CPU path, and source of the backward pass)
# ---------------------------------------------------------------------------

def roi_align_reference(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    output_size: int = 7,
    sampling_ratio: int = 2,
    spatial_scale: float = 1.0,
) -> jnp.ndarray:
    """Exact RoIAlign on a (H, W, C) feature map; rois (R, 4) → (R, P, P, C)."""
    h, w, _ = features.shape
    p, s = output_size, sampling_ratio

    def one(roi):
        x1, y1, x2, y2 = roi * spatial_scale
        roi_w = jnp.maximum(x2 - x1, 1.0)
        roi_h = jnp.maximum(y2 - y1, 1.0)
        bin_w = roi_w / p
        bin_h = roi_h / p
        # Sample positions: (P, s) each axis.
        iy = jnp.arange(p)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s
        ys = y1 + iy * bin_h                                  # (P, s)
        xs = x1 + iy * bin_w
        yv = ((ys >= -1.0) & (ys <= h)).astype(features.dtype)
        xv = ((xs >= -1.0) & (xs <= w)).astype(features.dtype)
        yc = jnp.clip(ys, 0.0, h - 1.0)
        xc = jnp.clip(xs, 0.0, w - 1.0)

        def hat(coords, n):  # (P, s) vs grid (n,) → (P, s, n) bilinear basis
            grid = jnp.arange(n, dtype=features.dtype)
            return jnp.maximum(
                0.0, 1.0 - jnp.abs(coords[..., None] - grid[None, None, :]))

        ay = hat(yc, h) * yv[..., None]          # (P, s, H)
        ax = hat(xc, w) * xv[..., None]          # (P, s, W)
        a = ay.sum(1) / s                        # (P, H) mean over samples
        b = ax.sum(1) / s                        # (P, W)
        tmp = jnp.einsum("ph,hwc->pwc", a, features)
        return jnp.einsum("qw,pwc->pqc", b, tmp)

    return jax.vmap(one)(jnp.asarray(rois, features.dtype))


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _interp_matrix(start, bin_size, origin, p, s, patch, size, dtype):
    """Per-axis interpolation matrix (p, patch) in patch-local coords."""
    # Mosaic requires integer iota; cast afterwards.
    iy = (jax.lax.broadcasted_iota(jnp.int32, (p, s), 0).astype(jnp.float32)
          + (jax.lax.broadcasted_iota(jnp.int32, (p, s), 1).astype(
              jnp.float32) + 0.5) / s)
    coords = start + iy * bin_size                          # (p, s) global
    valid = ((coords >= -1.0) & (coords <= size)).astype(jnp.float32)
    coords = jnp.clip(coords, 0.0, size - 1.0) - origin     # patch-local
    # Patch is positioned to contain all in-range samples; clamp is a no-op
    # except for degenerate oversized RoIs (see _patch_origin).
    coords = jnp.clip(coords, 0.0, patch - 1.0)
    grid = jax.lax.broadcasted_iota(jnp.int32, (p, s, patch), 2).astype(
        jnp.float32)
    hat = jnp.maximum(0.0, 1.0 - jnp.abs(coords[..., None] - grid))
    return (hat * valid[..., None]).sum(1).astype(dtype) / s  # (p, patch)


def _interp_matrix_gang(starts, bin_sizes, origins, p, s, patch, sizes,
                        dtype):
    """Batched interp matrices (g, p, patch); args are length-g scalar
    lists.

    The cheap (p, s) coordinate math stays per-roi (SMEM scalars broadcast
    over tiny arrays — Mosaic rejects reshaping stacked scalars into
    broadcastable vectors), but the patch-wide hat/mask/sum — the dominant
    VPU cost — runs ONCE for the whole gang. Per-roi vector-op issue costs
    were the measured floor (~10 µs/pair ungamged; patch size and matmul
    width barely moved it)."""
    g = len(starts)
    iy = (jax.lax.broadcasted_iota(jnp.int32, (p, s), 0).astype(jnp.float32)
          + (jax.lax.broadcasted_iota(jnp.int32, (p, s), 1).astype(
              jnp.float32) + 0.5) / s)
    coords_l, valid_l = [], []
    for gg in range(g):
        cg = starts[gg] + iy * bin_sizes[gg]                # (p, s) global
        valid_l.append(((cg >= -1.0)
                        & (cg <= sizes[gg])).astype(jnp.float32))
        cg = jnp.clip(cg, 0.0, sizes[gg] - 1.0) - origins[gg]
        coords_l.append(jnp.clip(cg, 0.0, patch - 1.0))
    coords = jnp.stack(coords_l)                            # (g, p, s)
    valid = jnp.stack(valid_l)
    grid = jax.lax.broadcasted_iota(jnp.int32, (g, p, s, patch), 3).astype(
        jnp.float32)
    hat = jnp.maximum(0.0, 1.0 - jnp.abs(coords[..., None] - grid))
    return (hat * valid[..., None]).sum(2).astype(dtype) / s  # (g, p, patch)


def _roi_align_kernel(
    # scalar-prefetch refs
    rois_ref,       # (N·4,) f32 — scaled to feature coords, flattened so
                    # SMEM packs densely (a (N, 4) table is row-padded and
                    # blows the 1MB SMEM budget at N ≈ 5k)
    slab_ref,       # (N,) i32 — source slab (frame) index
    # tensor refs
    feat_ref,       # (S, H, W, C) in ANY/HBM
    out_ref,        # (1, P, P, C) VMEM block for this program
    # scratch
    patch0, patch1, sems,
    *, p: int, s: int, h: int, w: int, c: int, n: int, patch: int,
):
    i = pl.program_id(0)

    def patch_origin_y(lo):
        # H origin: covering [floor(lo), ...), clamped into bounds (H dim is
        # not sublane-tiled, any origin is legal).
        o = jnp.floor(lo).astype(jnp.int32)
        return jnp.clip(o, 0, max(h - min(patch, h), 0))

    def patch_origin_x(lo):
        # W origin: 8-aligned for the DMA; the map is W-padded by `patch`
        # so no upper clamp is needed (padded cells get zero weight).
        o = jnp.floor(lo).astype(jnp.int32)
        o = (o // _ALIGN) * _ALIGN
        return pl.multiple_of(jnp.maximum(o, 0), _ALIGN)

    def roi_params(idx):
        x1 = rois_ref[idx * 4 + 0]
        y1 = rois_ref[idx * 4 + 1]
        x2 = rois_ref[idx * 4 + 2]
        y2 = rois_ref[idx * 4 + 3]
        bin_h = jnp.maximum(y2 - y1, 1.0) / p
        bin_w = jnp.maximum(x2 - x1, 1.0) / p
        return x1, y1, bin_w, bin_h

    def start_dma(idx, slot_ref, sem):
        x1, y1, _, _ = roi_params(idx)
        oy = patch_origin_y(jnp.clip(y1, 0.0, h - 1.0))
        ox = patch_origin_x(jnp.clip(x1, 0.0, w - 1.0))
        slab = slab_ref[idx]
        pltpu.make_async_copy(
            feat_ref.at[slab, pl.ds(oy, min(patch, h)), pl.ds(ox, patch), :],
            slot_ref,
            sem,
        ).start()
        return oy, ox

    # Double buffer: program i waits on the DMA started at program i-1 (or
    # kicks off its own at i == 0), and starts the DMA for i + 1.
    @pl.when(i == 0)
    def _():
        start_dma(0, patch0, sems.at[0])

    @pl.when(i + 1 < n)
    def _():
        slot = jax.lax.rem(i + 1, 2)
        jax.lax.cond(
            slot == 0,
            lambda: start_dma(i + 1, patch0, sems.at[0]) and None,
            lambda: start_dma(i + 1, patch1, sems.at[1]) and None,
        )

    cur = jax.lax.rem(i, 2)
    pltpu.make_async_copy(feat_ref.at[0, pl.ds(0, min(patch, h)),
                                      pl.ds(0, patch), :],
                          patch0, sems.at[cur]).wait()

    x1, y1, bin_w, bin_h = roi_params(i)
    oy = patch_origin_y(jnp.clip(y1, 0.0, h - 1.0)).astype(jnp.float32)
    ox = patch_origin_x(jnp.clip(x1, 0.0, w - 1.0)).astype(jnp.float32)
    ph = min(patch, h)
    pw = patch
    a = _interp_matrix(y1, bin_h, oy, p, s, ph, float(h), jnp.float32)
    b = _interp_matrix(x1, bin_w, ox, p, s, pw, float(w), jnp.float32)

    def pool(slot_ref):
        # Feature-dtype matmuls with f32 accumulation, reading the patch
        # straight from the statically-chosen scratch ref (see the
        # multilevel kernel note — a cond on the buffer VALUE cost a
        # patch-sized VMEM copy per roi).
        pt = slot_ref[...]
        aa = a.astype(pt.dtype)
        bb = b.astype(pt.dtype)
        tmp = jnp.dot(aa, pt.reshape(ph, pw * c),
                      preferred_element_type=jnp.float32)       # (P, PW*C)
        tmp = tmp.astype(pt.dtype).reshape(p, pw, c)
        tmp = tmp.transpose(1, 0, 2).reshape(pw, p * c)
        out = jnp.dot(bb, tmp, preferred_element_type=jnp.float32)
        out = out.reshape(p, p, c).transpose(1, 0, 2)           # (p, q, c)
        out_ref[0] = out.astype(out_ref.dtype)

    @pl.when(cur == 0)
    def _():
        pool(patch0)

    @pl.when(cur != 0)
    def _():
        pool(patch1)


def _roi_align_pallas(
    features: jnp.ndarray,       # (S, H, W, C)
    rois: jnp.ndarray,           # (N, 4) feature coords
    slabs: jnp.ndarray,          # (N,) int32
    output_size: int,
    sampling_ratio: int,
    patch: int = _PATCH,
    interpret: bool = False,
) -> jnp.ndarray:
    s_dim, h, w, c = features.shape
    n = rois.shape[0]
    p = output_size
    ph = min(patch, h)
    pw = patch
    # Pad W by `patch` so 8-aligned x-origins never need an upper clamp; the
    # padded cells are never referenced (sample coords clamp to w-1).
    features = jnp.pad(features, ((0, 0), (0, 0), (0, patch), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, p, p, c), lambda i, *_: (i, 0, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((ph, pw, c), features.dtype),
            pltpu.VMEM((ph, pw, c), features.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _roi_align_kernel, p=p, s=sampling_ratio, h=h, w=w, c=c, n=n,
        patch=patch)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, p, p, c), features.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            # Double-buffered patches + padded out block + Mosaic scratch;
            # generous headroom (an exact bound under-counted and OOM'd).
            vmem_limit_bytes=32 * 2 ** 20,
        ),
    )(jnp.asarray(rois, jnp.float32).reshape(-1),
      jnp.asarray(slabs, jnp.int32), features)


# ---------------------------------------------------------------------------
# Single-launch multilevel Pallas kernel
# ---------------------------------------------------------------------------
#
# One grid step per (roi, slab) pair; the roi's FPN level picks which
# pyramid ref the 64×64 patch is DMA'd from (4-way branch around the DMA
# only — the interpolation uses per-roi size scalars and is branch-free).
# Measured ~1.7 µs/step on v5e: the whole 4800-roi box stage in ~8 ms vs
# ~70 ms for the dense-einsum path (which pays full-map matmuls, a layout
# relayout copy of the (K·P, W, C) intermediate, and L× level masking).
#
# Span contract: the 64-cell patch covers every roi whose x-span is
# ≤ 56 cells at its assigned level. FPN level assignment bounds
# sqrt(area) ≤ 28 cells, so any aspect ratio ≤ 4:1 fits; the coarsest
# level's whole (padded) map fits inside one patch at MAX_SIZE ≤ 1344, so
# clamped oversized rois are exact there. Beyond-4:1 boxes at finer levels
# get a window-clipped (still well-formed) pooling — `dense` remains the
# exact-everywhere fallback behind MODEL.ROI_ALIGN_IMPL.

_ML_PATCH = 64

# Gang size (rois per grid step) and pipeline depth (scratch slots) are
# env-tunable for on-chip A/B (`DAT_ROI_GANG`, `DAT_ROI_SLOTS`); defaults
# are the measured r4 winners at the realistic roi mix (v5e, µs/pair
# box/kps): g4s2 9.03/24.18 · g8s2 9.13/24.20 · g16s2 9.72/23.82 ·
# g8s3 12.19/25.91 · g16s3 VMEM-OOM. The single wait-per-gang is worth
# ~9% over r3's per-patch waits; wider gangs and deeper pipelines are
# not. VMEM: slots·g·patch²·C·2B = 16 MB at (4, 2) with C=256 bf16.
_ML_GANG = int(__import__("os").environ.get("DAT_ROI_GANG", "4"))
_ML_SLOTS = int(__import__("os").environ.get("DAT_ROI_SLOTS", "2"))


def _roi_align_ml_kernel(
    rois_ref,        # (N·4,) f32 — level-prescaled feature coords
    slab_ref,        # (N,) i32
    lvl_ref,         # (N,) i32
    *rest,
    p: int, s: int, n: int, n_lvl: int, hs, ws, c: int, g: int,
    n_slots: int,
):
    feat_refs = rest[:n_lvl]
    out_ref, scratch, sems = rest[n_lvl:]
    i = pl.program_id(0)
    patch = _ML_PATCH
    nsteps = n // g                      # wrapper pads N to a multiple of g

    def roi_params(idx):
        x1 = rois_ref[idx * 4 + 0]
        y1 = rois_ref[idx * 4 + 1]
        x2 = rois_ref[idx * 4 + 2]
        y2 = rois_ref[idx * 4 + 3]
        return x1, y1, x2, y2

    def level_sizes(idx):
        # Branch-free per-roi map size (true sizes, before host padding).
        lvl = lvl_ref[idx]
        h_f = jnp.float32(hs[0])
        w_f = jnp.float32(ws[0])
        for li in range(1, n_lvl):
            h_f = jnp.where(lvl == li, jnp.float32(hs[li]), h_f)
            w_f = jnp.where(lvl == li, jnp.float32(ws[li]), w_f)
        return h_f, w_f

    def origins(idx):
        x1, y1, _, _ = roi_params(idx)
        h_f, w_f = level_sizes(idx)
        oy = jnp.floor(jnp.clip(y1, 0.0, h_f - 1.0)).astype(jnp.int32)
        oy = jnp.clip(oy, 0, jnp.maximum(h_f.astype(jnp.int32) - patch, 0))
        ox = jnp.floor(jnp.clip(x1, 0.0, w_f - 1.0)).astype(jnp.int32)
        ox = pl.multiple_of(jnp.maximum((ox // _ALIGN) * _ALIGN, 0), _ALIGN)
        return oy, ox

    def start_dma(idx, slot_ref, sem):
        # Every DMA is exactly (patch, patch, C) — levels are host-padded
        # to >= patch rows and + patch cols, so the semaphore byte count is
        # uniform and the gang wait descriptor below always matches.
        oy, ox = origins(idx)
        slab = slab_ref[idx]
        branches = []
        for li in range(n_lvl):
            def mk(li=li):
                def go():
                    pltpu.make_async_copy(
                        feat_refs[li].at[slab, pl.ds(oy, patch),
                                         pl.ds(ox, patch), :],
                        slot_ref,
                        sem,
                    ).start()
                return go
            branches.append(mk())
        jax.lax.switch(jnp.clip(lvl_ref[idx], 0, n_lvl - 1), branches)

    def start_gang(step, slot):
        # Kick off the g patch DMAs of gang `step`. They ALL signal the
        # slot's ONE semaphore: the consumer then waits once per gang with
        # a descriptor covering the whole (g, patch, patch, C) slot —
        # semaphore waits were part of the measured patch-independent
        # per-pair floor (r3 bisection), and this cuts them g×.
        for gg in range(g):
            start_dma(step * g + gg, scratch.at[slot, gg], sems.at[slot])

    @pl.when(i == 0)
    def _():
        # Warm-up: fill the first (n_slots - 1) pipeline slots.
        for sl in range(n_slots - 1):
            if sl < nsteps:
                start_gang(sl, sl)

    nxt = i + n_slots - 1
    @pl.when(nxt < nsteps)
    def _():
        jax.lax.switch(
            jax.lax.rem(nxt, n_slots),
            [(lambda sl=sl: start_gang(nxt, sl)) for sl in range(n_slots)])

    cur = jax.lax.rem(i, n_slots)
    # ONE wait for the whole gang: the self-descriptor's byte count equals
    # the g patch DMAs' total signal.
    for sl in range(n_slots):
        @pl.when(cur == sl)
        def _(sl=sl):
            pltpu.make_async_copy(scratch.at[sl], scratch.at[sl],
                                  sems.at[sl]).wait()

    # Whole-gang batched compute: per-roi scalars gathered into (g,)
    # vectors, interp matrices built in ONE set of VPU ops, and the two
    # interpolation contractions run as g-batched dot_generals — per-roi
    # vector-op/matmul issue overhead was the measured floor (~10 µs/pair
    # ungamged; patch size and dot width barely moved it).
    idxs = [i * g + gg for gg in range(g)]
    prm = [roi_params(ix) for ix in idxs]
    szs = [level_sizes(ix) for ix in idxs]
    ors = [origins(ix) for ix in idxs]
    bin_h = [jnp.maximum(p4[3] - p4[1], 1.0) / p for p4 in prm]
    bin_w = [jnp.maximum(p4[2] - p4[0], 1.0) / p for p4 in prm]
    a = _interp_matrix_gang(
        [p4[1] for p4 in prm], bin_h,
        [o[0].astype(jnp.float32) for o in ors], p, s, patch,
        [sz[0] for sz in szs], jnp.float32)
    b = _interp_matrix_gang(
        [p4[0] for p4 in prm], bin_w,
        [o[1].astype(jnp.float32) for o in ors], p, s, patch,
        [sz[1] for sz in szs], jnp.float32)

    def pool(slot_ref):
        # Matmuls run in the FEATURE dtype (bf16 in production — full-rate
        # MXU and half the VMEM read traffic; f32 under the f32
        # tests/oracle), f32 accumulation either way; patches are read
        # straight from the statically-predicated scratch ref (a lax.cond
        # on the buffer VALUE materialized a 2 MB VMEM copy per roi).
        pt = slot_ref[...]                                  # (g, P, P, C)
        aa = a.astype(pt.dtype)
        bb = b.astype(pt.dtype)
        tmp = jax.lax.dot_general(
            aa, pt.reshape(g, patch, patch * c),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)             # (g, P, PW·C)
        # Cast BEFORE the transpose — halves the shuffle bytes.
        tmp = tmp.astype(pt.dtype).reshape(g, p, patch, c)
        tmp = tmp.transpose(0, 2, 1, 3).reshape(g, patch, p * c)
        out = jax.lax.dot_general(
            bb, tmp, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)             # (g, Pq, P·C)
        out = out.reshape(g, p, p, c).transpose(0, 2, 1, 3)
        out_ref[...] = out.astype(out_ref.dtype)

    # Statically-predicated slot read (a lax.cond/switch on the buffer
    # VALUE materialized a patch-sized VMEM copy per roi).
    for sl in range(n_slots):
        @pl.when(cur == sl)
        def _(sl=sl):
            pool(scratch.at[sl])


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4, 5, 6))
def roi_align_multilevel_pallas(
    features: Sequence[jnp.ndarray],   # per level (S, H_l, W_l, C)
    strides: Sequence[int],
    rois: jnp.ndarray,                 # (S, K, 4) image coords, slab-grouped
    levels: jnp.ndarray,               # (S, K) int32
    output_size: int = 7,
    sampling_ratio: int = 2,
    interpret: bool = False,
) -> jnp.ndarray:
    """FPN RoIAlign in ONE Pallas launch → (S, K, P, P, C).

    Backward (training) is the XLA vjp of the dense-einsum form — the math
    is identical, so mixing a Pallas forward with a dense backward is exact
    up to bf16 rounding.
    """
    s_dim, _, _, c = features[0].shape
    k = rois.shape[1]
    n = s_dim * k
    n_lvl = len(features)
    p = output_size
    patch = _ML_PATCH
    hs = tuple(int(f.shape[1]) for f in features)
    ws = tuple(int(f.shape[2]) for f in features)
    # Pad W by `patch` (8-aligned x-origins never run off the map) and pad
    # H up to >= patch rows, so every DMA is a uniform (patch, patch, C)
    # block — the wait descriptor's byte count then always matches.
    feats_p = [jnp.pad(f, ((0, 0), (0, max(0, patch - f.shape[1])),
                           (0, patch), (0, 0)))
               for f in features]

    lvl = jnp.clip(levels, 0, n_lvl - 1).reshape(-1).astype(jnp.int32)
    scales = jnp.asarray([1.0 / st for st in strides], jnp.float32)
    r = (jnp.asarray(rois, jnp.float32).reshape(n, 4)
         * jnp.take(scales, lvl)[:, None])
    slabs = jnp.repeat(jnp.arange(s_dim, dtype=jnp.int32), k)

    # Gang g rois per grid step: one step waits ONCE on its gang's g patch
    # DMAs and runs g interp matmuls — the per-step fixed cost (grid
    # sequencing, scalar address math, DMA branch dispatch, semaphore
    # wait) amortizes g×. N is padded to a multiple of g with
    # index-0-safe zero rois. `n_slots` pipeline slots keep up to
    # (n_slots-1)·g + g patch DMAs in flight.
    g = _ML_GANG
    n_slots = max(2, _ML_SLOTS)
    n_pad = ((n + g - 1) // g) * g
    if n_pad != n:
        r = jnp.pad(r, ((0, n_pad - n), (0, 0)))
        slabs = jnp.pad(slabs, (0, n_pad - n))
        lvl = jnp.pad(lvl, (0, n_pad - n))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_pad // g,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_lvl,
        out_specs=pl.BlockSpec(
            (g, p, p, c), lambda i, *_: (i, 0, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_slots, g, patch, patch, c), features[0].dtype),
            pltpu.SemaphoreType.DMA((n_slots,)),
        ],
    )
    kernel = functools.partial(
        _roi_align_ml_kernel, p=p, s=sampling_ratio, n=n_pad, n_lvl=n_lvl,
        hs=hs, ws=ws, c=c, g=g, n_slots=n_slots)
    itemsize = jnp.dtype(features[0].dtype).itemsize
    scratch_bytes = n_slots * g * patch * patch * c * itemsize
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, p, p, c), features[0].dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            # Scratch + double-buffered out blocks + Mosaic headroom (an
            # exact bound under-counted and OOM'd).
            vmem_limit_bytes=min(120 * 2 ** 20,
                                 scratch_bytes + 48 * 2 ** 20),
        ),
    )(r.reshape(-1), slabs, lvl, *feats_p)
    return out[:n].reshape(s_dim, k, p, p, c)


def _roi_align_ml_pallas_fwd(features, strides, rois, levels, output_size,
                             sampling_ratio, interpret):
    out = roi_align_multilevel_pallas(features, strides, rois, levels,
                                      output_size, sampling_ratio, interpret)
    return out, (tuple(features), rois, levels)


def _roi_align_ml_pallas_bwd(strides, output_size, sampling_ratio,
                             interpret, res, g):
    features, rois, levels = res
    _, vjp = jax.vjp(
        lambda fs: roi_align_multilevel_dense(
            list(fs), strides, rois, levels, output_size, sampling_ratio),
        features)
    (d_features,) = vjp(g)
    return list(d_features), None, None


roi_align_multilevel_pallas.defvjp(_roi_align_ml_pallas_fwd,
                                   _roi_align_ml_pallas_bwd)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def _use_pallas(override: Optional[bool]) -> bool:
    if override is not None:
        return override
    return jax.default_backend() == "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def roi_align(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    output_size: int = 7,
    sampling_ratio: int = 2,
    spatial_scale: float = 1.0,
    use_pallas: Optional[bool] = None,
    patch_size: int = _PATCH,
) -> jnp.ndarray:
    """RoIAlign. features (H, W, C), rois (R, 4) image coords → (R, P, P, C).

    Forward runs the Pallas kernel on TPU (XLA reference elsewhere); backward
    is the XLA vjp of the reference implementation (identical math).
    """
    if _use_pallas(use_pallas):
        scaled = jnp.asarray(rois, jnp.float32) * spatial_scale
        slabs = jnp.zeros((rois.shape[0],), jnp.int32)
        return _roi_align_pallas(features[None], scaled, slabs,
                                 output_size, sampling_ratio, patch_size)
    return roi_align_reference(features, rois, output_size, sampling_ratio,
                               spatial_scale)


def _roi_align_fwd(features, rois, output_size, sampling_ratio,
                   spatial_scale, use_pallas, patch_size):
    out = roi_align(features, rois, output_size, sampling_ratio,
                    spatial_scale, use_pallas, patch_size)
    return out, (features, rois)


def _roi_align_bwd(output_size, sampling_ratio, spatial_scale, use_pallas,
                   patch_size, res, g):
    features, rois = res
    _, vjp = jax.vjp(
        lambda f: roi_align_reference(f, rois, output_size, sampling_ratio,
                                      spatial_scale), features)
    (d_features,) = vjp(g)
    return d_features, None


roi_align.defvjp(_roi_align_fwd, _roi_align_bwd)


def roi_align_3d(
    features: jnp.ndarray,        # (T, H, W, C)
    tube_rois: jnp.ndarray,       # (R, 4*T) per-frame boxes
    output_size: int = 7,
    sampling_ratio: int = 2,
    spatial_scale: float = 1.0,
    use_pallas: Optional[bool] = None,
    patch_size: int = _PATCH,
) -> jnp.ndarray:
    """Tube pooling: per-frame RoIAlign along each tube → (R, T, P, P, C).

    Parity: the reference's custom RoIAlign-3D Caffe2 op (SURVEY.md §2.2 —
    "per-frame RoIAlign along the tube, preserving the T axis"). One Pallas
    launch over all (roi, frame) pairs; the frame index is the slab index.
    """
    features = jnp.asarray(features)
    t = features.shape[0]
    r = tube_rois.shape[0]
    per_frame = jnp.asarray(tube_rois, jnp.float32).reshape(r, t, 4)
    flat_rois = per_frame.reshape(r * t, 4)
    slabs = jnp.tile(jnp.arange(t, dtype=jnp.int32), (r,))
    if _use_pallas(use_pallas):
        out = _roi_align_pallas(features, flat_rois * spatial_scale, slabs,
                                output_size, sampling_ratio, patch_size)
    else:
        out = jax.vmap(
            lambda roi, fi: roi_align_reference(
                features[fi], roi[None], output_size, sampling_ratio,
                spatial_scale)[0]
        )(flat_rois, slabs)
    p = output_size
    return out.reshape(r, t, p, p, features.shape[-1])


def roi_align_multilevel(
    features: Sequence[jnp.ndarray],      # per level (H_l, W_l, C)
    strides: Sequence[int],
    rois: jnp.ndarray,                    # (R, 4) image coords
    levels: jnp.ndarray,                  # (R,) int32 index into `features`
    output_size: int = 7,
    sampling_ratio: int = 2,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """FPN RoIAlign: each RoI pools from its assigned pyramid level.

    Parity: RoIFeatureTransform + CollectAndDistributeFpnRpnProposals
    (SURVEY.md §2.1). Runs one RoIAlign per level over all R rois and
    selects per-roi — levels are few and maps shrink 4× per level, so the
    overhead is bounded and the shapes stay static.
    """
    def _round8(x):
        return -(-x // 8) * 8

    outs = []
    for i, (feat, stride) in enumerate(zip(features, strides)):
        if i == len(features) - 1:
            # Coarsest level absorbs all clamped oversized RoIs; use a patch
            # covering the whole map (+_ALIGN x-origin slack) so the span
            # contract always holds.
            patch = _round8(max(feat.shape[0], feat.shape[1])) + _ALIGN
        else:
            # The FPN level bound is sqrt(area) < 28 cells, so elongated
            # person boxes span up to ~56 cells on their long side — the
            # 40-cell default patch violated the span contract for any
            # aspect beyond ~2:1 (review r3); use the 64-cell ML patch.
            patch = _ML_PATCH
        outs.append(
            roi_align(feat, rois, output_size, sampling_ratio,
                      1.0 / stride, use_pallas, patch))
    stacked = jnp.stack(outs)                           # (L, R, P, P, C)
    return jnp.take_along_axis(
        stacked, levels[None, :, None, None, None], axis=0)[0]


def assign_fpn_levels(
    rois: jnp.ndarray,
    min_level: int,
    max_level: int,
    canonical_scale: int = 224,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """Map RoIs to FPN levels (Parity: FPN.map_rois_to_fpn_levels).

    k = floor(k0 + log2(sqrt(area) / s0)), clamped to [min, max]; returned
    as an index relative to min_level.
    """
    w = rois[..., 2] - rois[..., 0] + 1.0
    h = rois[..., 3] - rois[..., 1] + 1.0
    scale = jnp.sqrt(jnp.maximum(w * h, 1e-6))
    lvl = jnp.floor(canonical_level +
                    jnp.log2(scale / canonical_scale + 1e-8))
    lvl = jnp.clip(lvl, min_level, max_level)
    return (lvl - min_level).astype(jnp.int32)


def roi_align_batched(
    features: jnp.ndarray,        # (S, H, W, C) slabs (batch and/or frames)
    rois: jnp.ndarray,            # (R, 4) image coords
    slabs: jnp.ndarray,           # (R,) int32 slab per roi
    output_size: int = 7,
    sampling_ratio: int = 2,
    spatial_scale: float = 1.0,
    use_pallas: Optional[bool] = None,
    patch_size: int = _PATCH,
) -> jnp.ndarray:
    """RoIAlign across a stack of feature slabs → (R, P, P, C).

    One Pallas launch covers every (roi, slab) pair — this is how the
    detector pools all proposals of a whole batch/clip at once.
    """
    features = jnp.asarray(features)
    scaled = jnp.asarray(rois, jnp.float32) * spatial_scale
    if _use_pallas(use_pallas):
        return _roi_align_pallas(features, scaled, slabs, output_size,
                                 sampling_ratio, patch_size)
    return jax.vmap(
        lambda roi, si: roi_align_reference(
            features[si], roi[None], output_size, sampling_ratio, 1.0)[0]
    )(scaled, jnp.asarray(slabs, jnp.int32))


def roi_align_multilevel_batched(
    features: Sequence[jnp.ndarray],   # per level (S, H_l, W_l, C)
    strides: Sequence[int],
    rois: jnp.ndarray,                 # (R, 4) image coords
    levels: jnp.ndarray,               # (R,) int32
    slabs: jnp.ndarray,                # (R,) int32
    output_size: int = 7,
    sampling_ratio: int = 2,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Batched FPN RoIAlign: level-assigned pooling over slab stacks."""
    def _round8(x):
        return -(-x // 8) * 8

    outs = []
    for i, (feat, stride) in enumerate(zip(features, strides)):
        if i == len(features) - 1:
            patch = _round8(max(feat.shape[1], feat.shape[2])) + _ALIGN
        else:
            patch = _ML_PATCH    # span contract: see roi_align_multilevel
        outs.append(
            roi_align_batched(feat, rois, slabs, output_size, sampling_ratio,
                              1.0 / stride, use_pallas, patch))
    stacked = jnp.stack(outs)                          # (L, R, P, P, C)
    return jnp.take_along_axis(
        stacked, levels[None, :, None, None, None], axis=0)[0]


# ---------------------------------------------------------------------------
# Dense (two-einsum) RoIAlign — the MXU-native fast path
# ---------------------------------------------------------------------------
#
# The separable form  out[p, q, c] = Σ_i Σ_j A[p, i] · B[q, j] · F[i, j, c]
# evaluated densely over the full (H, W) map is two large matmuls:
#     (R·P, H) @ (H, W·C)   then a batched (P·?, W) contraction
# which is exactly what the MXU wants (M in the tens of thousands, K and N in
# the hundreds/thousands). The per-RoI Pallas patch kernel measured ~4 ms per
# RoI on v5e (per-grid-step overhead + Mosaic transposes); the dense form
# runs the whole 4800-RoI box stage in milliseconds despite doing ~10× the
# FLOPs — MXU peak is >100× the serial path's effective rate. This is the
# default RoIAlign on TPU; the Pallas kernel remains for study/comparison.

def _hat_matrix(starts, bin_sizes, p, s, size, dtype):
    """Batched interpolation matrices: (R,) starts/bins → (R, P, size)."""
    iy = (jnp.arange(p, dtype=jnp.float32)[:, None]
          + (jnp.arange(s, dtype=jnp.float32)[None, :] + 0.5) / s)  # (P, s)
    coords = starts[:, None, None] + iy[None] * bin_sizes[:, None, None]
    valid = ((coords >= -1.0) & (coords <= size)).astype(jnp.float32)
    coords = jnp.clip(coords, 0.0, size - 1.0)
    grid = jnp.arange(size, dtype=jnp.float32)
    hat = jnp.maximum(0.0, 1.0 - jnp.abs(coords[..., None] - grid))
    return (hat * valid[..., None]).sum(2).astype(dtype) / s  # (R, P, size)


def _roi_align_dense_block(features, rois, output_size, sampling_ratio,
                           spatial_scale, weight=None):
    """One K-block of the dense RoIAlign (see roi_align_dense)."""
    s_dim, h, w, c = features.shape
    k = rois.shape[1]
    p = output_size
    r = jnp.asarray(rois, jnp.float32).reshape(s_dim * k, 4) * spatial_scale
    x1, y1, x2, y2 = r[:, 0], r[:, 1], r[:, 2], r[:, 3]
    bin_w = jnp.maximum(x2 - x1, 1.0) / p
    bin_h = jnp.maximum(y2 - y1, 1.0) / p

    dtype = features.dtype
    a = _hat_matrix(y1, bin_h, p, sampling_ratio, h, dtype)   # (S·K, P, H)
    b = _hat_matrix(x1, bin_w, p, sampling_ratio, w, dtype)   # (S·K, P, W)
    if weight is not None:
        # Per-roi multiplier (FPN level mask) folded into A, so masked rois
        # contribute exact zeros and level outputs can be summed.
        a = a * weight.reshape(s_dim * k, 1, 1).astype(dtype)
    a = a.reshape(s_dim, k * p, h)
    # (S, K·P, H) @ (S, H, W, C) → (S, K·P, W, C). W and C stay separate
    # free dims: merging them forced a (H·W·C-sized) f32 RETILING reshape
    # downstream — 53% of the isolated align's device time in the r2
    # trace. With them separate, the follow-up reshape only regroups
    # major dims (a free view), and the f32→bf16 convert fuses into the
    # dot output.
    tmp = jax.lax.dot_general(
        a, features,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dtype).reshape(s_dim * k, p, w, c)
    # (S·K, Pq, W) ⊗ (S·K, Pp, W, C) → (S·K, Pq, Pp, C)
    out = jax.lax.dot_general(
        b, tmp,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    out = out.swapaxes(1, 2)                     # (S·K, Pp, Pq, C)
    return out.astype(dtype).reshape(s_dim, k, p, p, c)


# HBM budget for the (S, kc·P, W·C) f32 matmul intermediate of one K-block.
# The full-K version materialized 26 GB at batch 8 and OOM'd the 16 GB HBM;
# the other extreme (fixed chunk 32) ran 10+ sequential lax.map steps of
# M=224 matmuls at ~7% MXU efficiency (the dominant `while`s in the r2
# trace). The chunk is therefore sized to the budget per call: small W·C
# (high FPN levels, low resolutions) → big chunks → few big matmul steps.
_DENSE_INTERMEDIATE_BUDGET = 3 * 1024**3


def _auto_chunk(s_dim, p, w, c, k):
    per_roi = p * w * c * 4 * s_dim          # f32 intermediate bytes / roi
    chunk = max(32, _DENSE_INTERMEDIATE_BUDGET // max(per_roi, 1))
    # Round to a multiple of 8 sublanes; never beyond K itself.
    return int(min(k, (chunk // 8) * 8))


def roi_align_dense(
    features: jnp.ndarray,      # (S, H, W, C) slab stack
    rois: jnp.ndarray,          # (S, K, 4) rois grouped by slab
    output_size: int = 7,
    sampling_ratio: int = 2,
    spatial_scale: float = 1.0,
    weight: Optional[jnp.ndarray] = None,   # (S, K) multiplier
    chunk: Optional[int] = None,
) -> jnp.ndarray:
    """Slab-batched dense RoIAlign → (S, K, P, P, C), K-chunked."""
    s_dim, h, w, c = features.shape
    k = rois.shape[1]
    if chunk is None:
        chunk = _auto_chunk(s_dim, output_size, w, c, k)
    if k <= chunk:
        return _roi_align_dense_block(features, rois, output_size,
                                      sampling_ratio, spatial_scale, weight)
    n_chunks = -(-k // chunk)
    pad = n_chunks * chunk - k
    rois_p = jnp.pad(jnp.asarray(rois, jnp.float32),
                     ((0, 0), (0, pad), (0, 0)))
    w_p = (jnp.pad(weight, ((0, 0), (0, pad))) if weight is not None
           else None)
    # Unrolled chunk loop: n_chunks is static and small (the auto-chunk
    # sizing), so unrolling lets XLA schedule the blocks back-to-back with
    # no lax.map/while plumbing (the chunked maps were ~30% of inference
    # device time in the r2 trace as tiny-M sequential matmuls).
    outs = []
    for i in range(n_chunks):
        rc = jax.lax.dynamic_slice_in_dim(rois_p, i * chunk, chunk, axis=1)
        wc = (jax.lax.dynamic_slice_in_dim(w_p, i * chunk, chunk, axis=1)
              if w_p is not None else None)
        outs.append(_roi_align_dense_block(
            features, rc, output_size, sampling_ratio, spatial_scale, wc))
    out = jnp.concatenate(outs, axis=1)         # (S, n_chunks·chunk, ...)
    return out[:, :k]


def _roi_align_hybrid_block(features, rois, output_size, sampling_ratio,
                            spatial_scale, weight=None):
    """One K-block of the hybrid RoIAlign (see roi_align_hybrid)."""
    s_dim, h, w, c = features.shape
    k = rois.shape[1]
    p, s = output_size, sampling_ratio
    ps = p * s
    dtype = features.dtype
    r = jnp.asarray(rois, jnp.float32).reshape(s_dim * k, 4) * spatial_scale
    x1, y1, x2, y2 = r[:, 0], r[:, 1], r[:, 2], r[:, 3]
    bin_w = jnp.maximum(x2 - x1, 1.0) / p
    bin_h = jnp.maximum(y2 - y1, 1.0) / p

    # Y axis: dense interpolation matrix, contracted on the MXU with
    # M = K·P (large). Output keeps (W, C) as separate free dims so the
    # result is directly consumable without a retiling reshape.
    a = _hat_matrix(y1, bin_h, p, s, h, dtype)               # (S·K, P, H)
    if weight is not None:
        a = a * weight.reshape(s_dim * k, 1, 1).astype(dtype)
    a = a.reshape(s_dim, k * p, h)
    tmp = jax.lax.dot_general(
        a, features,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dtype).reshape(s_dim * k, p, w, c)              # (S·K, P, W, C)

    # X axis: the dense form here is a batched matmul with M = P (7/14) at
    # ~5% MXU efficiency — instead gather the two bilinear corner columns
    # of each sample position from the P rows (contiguous C-minor rows, the
    # embedding-lookup pattern) and do the weighted sum on the VPU.
    iy = (jnp.arange(p, dtype=jnp.float32)[:, None]
          + (jnp.arange(s, dtype=jnp.float32)[None, :] + 0.5) / s).reshape(-1)
    xs = x1[:, None] + iy[None, :] * bin_w[:, None]          # (S·K, PS)
    xv = ((xs >= -1.0) & (xs <= w)).astype(jnp.float32)
    xc = jnp.clip(xs, 0.0, w - 1.0)
    x0 = jnp.floor(xc)
    wx1 = xc - x0
    x0i = x0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)
    idx = jnp.concatenate([x0i, x1i], axis=1)                # (S·K, 2·PS)
    g = jnp.take_along_axis(tmp, idx[:, None, :, None], axis=2)
    wts = jnp.concatenate([(1.0 - wx1) * xv, wx1 * xv],
                          axis=1) / s                        # (S·K, 2·PS)
    g = g.astype(jnp.float32) * wts[:, None, :, None]
    # (S·K, Py, 2, Px, s, C) → sum corners + average samples → (Py, Px)
    # output order, matching roi_align_reference's (p, q, c).
    out = g.reshape(s_dim * k, p, 2, p, s, c).sum(axis=(2, 4))
    return out.astype(dtype).reshape(s_dim, k, p, p, c)


def roi_align_hybrid(
    features: jnp.ndarray,      # (S, H, W, C) slab stack
    rois: jnp.ndarray,          # (S, K, 4) rois grouped by slab
    output_size: int = 7,
    sampling_ratio: int = 2,
    spatial_scale: float = 1.0,
    weight: Optional[jnp.ndarray] = None,   # (S, K) multiplier
    chunk: Optional[int] = None,
) -> jnp.ndarray:
    """Hybrid einsum-y / gather-x RoIAlign → (S, K, P, P, C), K-chunked."""
    s_dim, h, w, c = features.shape
    k = rois.shape[1]
    if chunk is None:
        # bf16 (S, kc·P, W, C) intermediate — half the dense form's bytes.
        per_roi = output_size * w * c * 2 * s_dim
        chunk = max(32, _DENSE_INTERMEDIATE_BUDGET // max(per_roi, 1))
        chunk = int(min(k, (chunk // 8) * 8))
    if k <= chunk:
        return _roi_align_hybrid_block(features, rois, output_size,
                                       sampling_ratio, spatial_scale, weight)
    n_chunks = -(-k // chunk)
    pad = n_chunks * chunk - k
    rois_p = jnp.pad(jnp.asarray(rois, jnp.float32),
                     ((0, 0), (0, pad), (0, 0)))
    w_p = (jnp.pad(weight, ((0, 0), (0, pad))) if weight is not None
           else None)
    outs = []
    for i in range(n_chunks):
        rc = jax.lax.dynamic_slice_in_dim(rois_p, i * chunk, chunk, axis=1)
        wc = (jax.lax.dynamic_slice_in_dim(w_p, i * chunk, chunk, axis=1)
              if w_p is not None else None)
        outs.append(_roi_align_hybrid_block(
            features, rc, output_size, sampling_ratio, spatial_scale, wc))
    return jnp.concatenate(outs, axis=1)[:, :k]


def roi_align_multilevel_hybrid(
    features: Sequence[jnp.ndarray],
    strides: Sequence[int],
    rois: jnp.ndarray,
    levels: jnp.ndarray,
    output_size: int = 7,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """FPN hybrid RoIAlign with per-roi level masks (summed, like dense)."""
    out = None
    for li, (feat, stride) in enumerate(zip(features, strides)):
        mask = (levels == li)
        o = roi_align_hybrid(feat, rois, output_size, sampling_ratio,
                             1.0 / stride, weight=mask)
        out = o if out is None else out + o
    return out


def roi_align_multilevel_gather(
    features: Sequence[jnp.ndarray],   # per level (S, H_l, W_l, C)
    strides: Sequence[int],
    rois: jnp.ndarray,                 # (S, K, 4) image coords, slab-grouped
    levels: jnp.ndarray,               # (S, K) int32
    output_size: int = 7,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """FPN RoIAlign via embedding-style row gathers → (S, K, P, P, C).

    The dense two-einsum form pays for the whole feature map per RoI chunk
    and its second contraction is a batched matmul with M = P = 7 (≈5% MXU
    efficiency — the dominant fusions in the r2 800×1344 trace). This form
    reads only the 4·(P·s)² bilinear corner rows each RoI actually touches:
    the pyramid is flattened level-major into one (S, ΣH_l·W_l, C) buffer,
    per-sample flat indices are built from each RoI's own level (no
    per-level masking, no L× redundant compute), and 4 take_along_axis row
    gathers + a fused weighted sum do the interpolation. Pure HBM-bandwidth
    cost: ~4·S·K·(P·s)²·C values per call.

    Coordinate semantics identical to `roi_align_reference` (Detectron):
    sample centers at bin-interior positions, samples outside (-1, size)
    contribute zero, in-range samples clamp to [0, size-1].
    """
    s_dim, _, _, c = features[0].shape
    k = rois.shape[1]
    p, s = output_size, sampling_ratio
    ps = p * s

    hs = jnp.asarray([f.shape[1] for f in features], jnp.float32)
    ws = jnp.asarray([f.shape[2] for f in features], jnp.float32)
    sizes = [f.shape[1] * f.shape[2] for f in features]
    offs = jnp.asarray([0] + list(jnp.cumsum(jnp.asarray(sizes))[:-1]),
                       jnp.int32)
    scales = jnp.asarray([1.0 / st for st in strides], jnp.float32)

    flat = jnp.concatenate(
        [f.reshape(s_dim, -1, c) for f in features], axis=1)

    lvl = jnp.clip(levels, 0, len(features) - 1)
    h_l = jnp.take(hs, lvl)                                  # (S, K)
    w_l = jnp.take(ws, lvl)
    base = jnp.take(offs, lvl)                               # (S, K) int32
    sc = jnp.take(scales, lvl)

    r = jnp.asarray(rois, jnp.float32) * sc[..., None]
    x1, y1, x2, y2 = r[..., 0], r[..., 1], r[..., 2], r[..., 3]
    bin_h = jnp.maximum(y2 - y1, 1.0) / p                    # (S, K)
    bin_w = jnp.maximum(x2 - x1, 1.0) / p

    # Sample centers: (P·s,) bin-interior offsets (oracle's iy flattened).
    iy = (jnp.arange(p, dtype=jnp.float32)[:, None]
          + (jnp.arange(s, dtype=jnp.float32)[None, :] + 0.5) / s).reshape(-1)
    ys = y1[..., None] + iy * bin_h[..., None]               # (S, K, PS)
    xs = x1[..., None] + iy * bin_w[..., None]

    yv = (ys >= -1.0) & (ys <= h_l[..., None])
    xv = (xs >= -1.0) & (xs <= w_l[..., None])
    yc = jnp.clip(ys, 0.0, h_l[..., None] - 1.0)
    xc = jnp.clip(xs, 0.0, w_l[..., None] - 1.0)

    y0 = jnp.floor(yc)
    x0 = jnp.floor(xc)
    wy1 = yc - y0                                            # (S, K, PS)
    wx1 = xc - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, h_l[..., None].astype(jnp.int32) - 1)
    x1i = jnp.minimum(x0i + 1, w_l[..., None].astype(jnp.int32) - 1)

    w_li = w_l.astype(jnp.int32)
    # Sample validity + 1/s² bin average folded into the corner weights.
    vw = (yv[..., :, None] & xv[..., None, :]).astype(jnp.float32) / (s * s)

    out = None
    for yi, wy in ((y0i, 1.0 - wy1), (y1i, wy1)):
        row = base[..., None] + yi * w_li[..., None]         # (S, K, PS)
        for xi, wx in ((x0i, 1.0 - wx1), (x1i, wx1)):
            idx = row[..., :, None] + xi[..., None, :]       # (S, K, PS, PS)
            g = jnp.take_along_axis(
                flat, idx.reshape(s_dim, -1)[..., None], axis=1)
            g = g.reshape(s_dim, k, ps, ps, c)
            w = (wy[..., :, None] * wx[..., None, :] * vw)[..., None]
            term = g.astype(jnp.float32) * w
            out = term if out is None else out + term
    # (S, K, P, s, P, s, C): the s axes were averaged via vw.
    out = out.reshape(s_dim, k, p, s, p, s, c).sum(axis=(3, 5))
    return out.astype(features[0].dtype)


def roi_align_multilevel_dense(
    features: Sequence[jnp.ndarray],   # per level (S, H_l, W_l, C)
    strides: Sequence[int],
    rois: jnp.ndarray,                 # (S, K, 4) image coords, slab-grouped
    levels: jnp.ndarray,               # (S, K) int32
    output_size: int = 7,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """FPN dense RoIAlign with per-roi level selection → (S, K, P, P, C).

    Levels are applied as masks folded into the interpolation matrices and
    the per-level outputs are SUMMED (each roi selects exactly one level),
    so only one (S, K, P, P, C) accumulator is live — the stack+select form
    kept L of them and dominated HBM.
    """
    out = None
    for li, (feat, stride) in enumerate(zip(features, strides)):
        mask = (levels == li)
        o = roi_align_dense(feat, rois, output_size, sampling_ratio,
                            1.0 / stride, weight=mask)
        out = o if out is None else out + o
    return out
