"""Microbench multilevel RoIAlign implementations at production shapes.

Measures the kernels ALONE at a realistic roi/level mix — the full-model
bench with random weights produces proposals that degenerate to one FPN
level and understate patch-DMA spread (STATUS r3 "Where the time goes").
This is the probe behind the MODEL.ROI_ALIGN_IMPL production default: all
four implementations (pallas / dense / hybrid / gather) run the same box
(7x7, K=300) and keypoint (14x14, K=100) stages at the 800x1344 FPN
pyramid.

The jitted fn reduces the pooled output to a scalar IN-GRAPH: device_get
of the full (N, P, P, C) output crosses the axon tunnel at ~10 MB/s and
would dominate wall time (a 120 MB fetch measured 14 s).

Usage: python tools/bench_roialign.py [iters] [impl,impl,...]
Env: DAT_ROI_GANG / DAT_ROI_SLOTS tune the pallas kernel's gang width and
pipeline depth.

r3 record (v5e, bf16, gang=4, patch=64): pallas box ≈ 9.9 µs/pair,
kps ≈ 25.5 µs/pair — a fixed per-pair floor that patch size (64→32:
−17%), gang width, and dot dtype barely moved; bisection pinned ~75% of
it on patch-independent per-pair machinery (semaphore wait + DMA issue +
pipeline), which the r4 gang-wait/gang-8 rework attacks.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "dat_jax_cache"))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from detectandtrack_tpu.kernels.roi_align import (
        roi_align_multilevel_dense, roi_align_multilevel_gather,
        roi_align_multilevel_hybrid, roi_align_multilevel_pallas)
    from detectandtrack_tpu.utils.profiling import device_time

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    impls = (sys.argv[2].split(",") if len(sys.argv) > 2
             else ["pallas", "dense", "hybrid", "gather"])
    s_dim, c = 16, 256                      # B=2 x T=8 slabs
    rng = np.random.default_rng(0)
    shapes = [(200, 336), (100, 168), (50, 84), (25, 42)]  # 800x1344 FPN
    strides = [4, 8, 16, 32]
    feats = [jnp.asarray(rng.normal(size=(s_dim, h, w, c)), jnp.bfloat16)
             for h, w in shapes]

    def make_rois(k):
        # Person-shaped boxes, mixed scales, FPN-assigned levels.
        areas = rng.uniform(32, 448, size=(s_dim, k)) ** 2
        aspect = rng.uniform(0.33, 1.2, size=(s_dim, k))  # mostly tall
        w = np.sqrt(areas * aspect)
        h = np.sqrt(areas / aspect)
        cx = rng.uniform(0, 1344, size=(s_dim, k))
        cy = rng.uniform(0, 800, size=(s_dim, k))
        rois = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                        -1)
        lvl = np.clip(np.floor(2 + np.log2(np.sqrt(areas) / 224.0)), 0,
                      3).astype(np.int32)
        return jnp.asarray(rois, jnp.float32), jnp.asarray(lvl)

    fns = {"pallas": roi_align_multilevel_pallas,
           "dense": roi_align_multilevel_dense,
           "hybrid": roi_align_multilevel_hybrid,
           "gather": roi_align_multilevel_gather}

    for name, k, p, s in [("box 7x7 K=300", 300, 7, 2),
                          ("kps 14x14 K=100", 100, 14, 2)]:
        rois, lvl = make_rois(k)
        n = s_dim * k
        for impl in impls:
            align = fns[impl]
            fn = jax.jit(lambda f, r, l, p=p, s=s, align=align: align(
                f, strides, r, l, p, s).astype(jnp.float32).sum())
            dt = device_time(fn, feats, rois, lvl, iters=iters, warmup=3)
            print(f"{name} [{impl:6s}]: {dt*1e3:7.3f} ms  "
                  f"({dt/n*1e6:5.2f} us/pair)", flush=True)


if __name__ == "__main__":
    main()
