"""Attribute the RoIAlign per-pair cost floor: switch vs DMA vs compute.

STATUS r3: the multilevel kernel's per-pair cost (~10 µs box / ~25 µs kps
at realistic roi mixes) is ~75% patch-size-independent. This script times
four mini-kernels sharing the production structure to localize the floor:

  full    — per-roi patch DMA behind a 4-way level switch + interp dots
            (the production shape)
  noswitch— same, but single source ref (no lax.switch around the DMA)
  nodma   — dots on a resident patch (no per-roi DMA at all)
  nodot   — per-roi DMA + trivial reduce (no interp matmuls)

Usage: python tools/diag_roialign.py [n_pairs] [p]
Run when the chip is idle; one compile per variant (~minutes each over
the axon remote-compile tunnel).
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PATCH = 64
C = 256


def mini_kernel(rois_ref, lvl_ref, *rest, p, n, n_lvl, variant):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    feat_refs = rest[:n_lvl]
    out_ref, patch0, patch1, sems = rest[n_lvl:]
    i = pl.program_id(0)

    def start_dma(idx, slot_ref, sem):
        oy = jnp.int32(0)
        ox = pl.multiple_of(
            (rois_ref[idx * 4].astype(jnp.int32) // 8) * 8, 8)
        ox = jnp.clip(ox, 0, 64)
        if variant == "noswitch":
            pltpu.make_async_copy(
                feat_refs[0].at[0, pl.ds(oy, PATCH), pl.ds(ox, PATCH), :],
                slot_ref, sem).start()
            return
        branches = []
        for li in range(n_lvl):
            def mk(li=li):
                def go():
                    pltpu.make_async_copy(
                        feat_refs[li].at[0, pl.ds(oy, PATCH),
                                         pl.ds(ox, PATCH), :],
                        slot_ref, sem).start()
                return go
            branches.append(mk())
        jax.lax.switch(jnp.clip(lvl_ref[idx], 0, n_lvl - 1), branches)

    use_dma = variant != "nodma"
    if use_dma:
        @pl.when(i == 0)
        def _():
            start_dma(0, patch0, sems.at[0])

        @pl.when(i + 1 < n)
        def _():
            slot = jax.lax.rem(i + 1, 2)
            jax.lax.cond(
                slot == 0,
                lambda: start_dma(i + 1, patch0, sems.at[0]),
                lambda: start_dma(i + 1, patch1, sems.at[1]),
            )

        cur = jax.lax.rem(i, 2)
        pltpu.make_async_copy(
            feat_refs[0].at[0, pl.ds(0, PATCH), pl.ds(0, PATCH), :],
            patch0, sems.at[cur]).wait()
    else:
        cur = jnp.int32(0)

    x1 = rois_ref[i * 4]

    def pool(slot_ref):
        pt = slot_ref[...]
        if variant == "nodot":
            out_ref[0] = (pt[:p, :p, :]
                          + x1.astype(pt.dtype)).astype(out_ref.dtype)
            return
        iy = jax.lax.broadcasted_iota(jnp.int32, (p, PATCH), 1).astype(
            jnp.float32)
        a = jnp.maximum(0.0, 1.0 - jnp.abs(iy - x1)).astype(pt.dtype)
        tmp = jnp.dot(a, pt.reshape(PATCH, PATCH * C),
                      preferred_element_type=jnp.float32)
        tmp = tmp.astype(pt.dtype).reshape(p, PATCH, C)
        tmp = tmp.transpose(1, 0, 2).reshape(PATCH, p * C)
        out = jnp.dot(a, tmp, preferred_element_type=jnp.float32)
        out = out.reshape(p, p, C).transpose(1, 0, 2)
        out_ref[0] = out.astype(out_ref.dtype)

    @pl.when(cur == 0)
    def _():
        pool(patch0)

    @pl.when(cur != 0)
    def _():
        pool(patch1)


def run_variant(variant, n, p):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from detectandtrack_tpu.utils.profiling import device_time

    n_lvl = 4
    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.normal(size=(1, 256, 256 + PATCH, C)),
                         jnp.bfloat16) for _ in range(n_lvl)]
    rois = jnp.asarray(rng.uniform(0, 64, size=(n * 4,)), jnp.float32)
    lvls = jnp.asarray(rng.integers(0, n_lvl, size=(n,)), jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_lvl,
        out_specs=pl.BlockSpec((1, p, p, C), lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((PATCH, PATCH, C), jnp.bfloat16),
            pltpu.VMEM((PATCH, PATCH, C), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kern = functools.partial(mini_kernel, p=p, n=n, n_lvl=n_lvl,
                             variant=variant)
    call = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((n, p, p, C), jnp.bfloat16),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2 ** 20))

    fn = jax.jit(lambda r, l, f: call(r, l, *f).astype(jnp.float32).sum())
    dt = device_time(fn, rois, lvls, feats, iters=20, warmup=3)
    print(f"{variant:9s}: {dt*1e3:8.3f} ms  ({dt/n*1e6:6.2f} us/pair)",
          flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4800
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    for variant in ("full", "noswitch", "nodma", "nodot"):
        run_variant(variant, n, p)


if __name__ == "__main__":
    main()
