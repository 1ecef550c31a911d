"""Microbench the multilevel Pallas RoIAlign at production shapes.

Measures the kernel ALONE at a realistic roi/level mix — the full-model
bench initializes random weights, whose proposals degenerate to one FPN
level and understate patch-DMA spread (STATUS r3 "Where the time goes").

The jitted fn reduces the pooled output to a scalar IN-GRAPH: device_get
of the full (N, P, P, C) output crosses the axon tunnel at ~10 MB/s and
would dominate wall time (a 120 MB fetch measured 14 s).

Usage: python tools/bench_roialign.py [iters]
r3 record (v5e, bf16, gang=4, patch=64): box 7x7 K=300 ≈ 9.9 µs/pair,
kps 14x14 K=100 ≈ 25.5 µs/pair — a fixed per-pair floor that patch size
(64→32: −17%), gang width, and dot dtype barely move; suspected Mosaic
per-DMA/step latency.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from detectandtrack_tpu.kernels.roi_align import (
        roi_align_multilevel_pallas)
    from detectandtrack_tpu.utils.profiling import device_time

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
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

    for name, k, p, s in [("box 7x7 K=300", 300, 7, 2),
                          ("kps 14x14 K=100", 100, 14, 2)]:
        rois, lvl = make_rois(k)
        fn = jax.jit(lambda f, r, l, p=p, s=s: roi_align_multilevel_pallas(
            f, strides, r, l, p, s).astype(jnp.float32).sum())
        dt = device_time(fn, feats, rois, lvl, iters=iters, warmup=3)
        n = s_dim * k
        print(f"{name}: {dt*1e3:7.3f} ms  ({dt/n*1e6:5.2f} us/pair, "
              f"{n*64*64*c*2/dt/1e9:6.1f} GB/s patch DMA)", flush=True)


if __name__ == "__main__":
    main()
