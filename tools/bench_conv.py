"""Microbench variants of the hot conv shapes from tools/conv_roofline.py.

The r5 800x1344 b4 trace shows the keypoint head's 8 conv_fcn layers
(bf16[B*T*rois,14,14,512], 3x3) at 176 TF/s — which turned out to be ~90%
of the TRUE v5e bf16 peak (197; the repo's old 394 constant was the int8
figure) — and conv1-S2D's 12-channel tap convs at ~19% with ~20 ms/iter
of layout copies around them. This tool A/Bs semantically-exact
reformulations of those convs in isolation on the real chip, so the model
only adopts measured wins (same discipline as the DAT_TEMPORAL_CONV and
DAT_CONV1X1_DOT experiments, backbone.py).

Usage: python tools/bench_conv.py [kps|conv1|res2] [iters]
Prints one table row per variant: ms/iter, achieved TFLOP/s, %MXU.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "dat_jax_cache"))

import numpy as np  # noqa: E402

PEAK = 197e12  # v5e bf16 peak (394 is the int8 figure; see bench.py)


def timed(fn, args, iters=20):
    """Time one application of fn by running a CHAINED loop of `iters`
    data-dependent applications inside one jit and fetching a scalar
    reduction: the axon runtime elides dispatches whose outputs are never
    fetched (block_until_ready alone is NOT enough — measured: a 3 ms
    conv 'ran' in 25 us), and chaining amortizes the ~33 ms per-fetch
    tunnel floor across all iterations. fn must be shape-preserving in
    its first argument."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(*a):
        x = a[0]
        for _ in range(iters):
            x = fn(x, *a[1:])
        return jnp.sum(x.astype(jnp.float32))

    float(chain(*args))                     # compile + warm
    t0 = time.perf_counter()
    got = float(chain(*args))
    dt = (time.perf_counter() - t0) / iters
    assert got == got, "NaN from chained bench"
    return dt


def report(name, sec, flops, note=""):
    tf = flops / sec / 1e12
    print(f"{name:>14}: {sec * 1e3:8.3f} ms  {tf:7.1f} TF/s  "
          f"{tf * 1e12 / PEAK * 100:5.1f}% MXU  {note}")


def bench_kps(iters):
    """conv_fcn shape: (N, 14, 14, 512) -> 512, 3x3 SAME. N = B*T*rois
    (b4 headline: 4 clips x 8 frames x 100 rois = 3200)."""
    import jax
    import jax.numpy as jnp

    n, h, w, c = (int(os.environ.get("BK_N", "3200")), 14, 14, 512)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, h, w, c)), jnp.bfloat16)
    kf32 = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.01, jnp.float32)
    flops = 2.0 * n * h * w * c * c * 9  # SAME edge taps ~count as full

    conv = functools.partial(
        jax.lax.conv_general_dilated,
        window_strides=(1, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def asis(x, k):            # model-faithful: f32 param cast in-graph
        return conv(x, k.astype(jnp.bfloat16), padding="SAME")

    def affine_relu(x, k, s, b):   # + the ConvAffine/relu epilogue
        y = conv(x, k.astype(jnp.bfloat16), padding="SAME")
        return jax.nn.relu(y * s + b)

    def pad16(x, k):
        # Exact: SAME 3x3 on 14x14 == VALID 3x3 on the zero-padded 16x16.
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        return conv(xp, k.astype(jnp.bfloat16), padding="VALID")

    def plane(x, k):
        # Upper-bound probe (NOT exact at RoI borders): tile 16 RoIs into
        # one 56x56 plane so the emitter sees a big image; untile after so
        # the chained harness sees a shape-preserving op.
        xp = x.reshape(n // 16, 4, 4, h, w, c).transpose(
            0, 1, 3, 2, 4, 5).reshape(n // 16, 4 * h, 4 * w, c)
        y = conv(xp, k.astype(jnp.bfloat16), padding="SAME")
        return y.reshape(n // 16, 4, h, 4, w, c).transpose(
            0, 1, 3, 2, 4, 5).reshape(n, h, w, c)

    def dots9(x, k):
        # 3x3 conv as 9 shifted (N*196, 512)x(512, 512) dots.
        kb = k.astype(jnp.bfloat16)
        y = None
        for dy in range(3):
            for dx in range(3):
                xs = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))[
                    :, dy:dy + h, dx:dx + w, :]
                z = jax.lax.dot_general(
                    xs.reshape(n * h * w, c), kb[dy, dx],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                y = z if y is None else y + z
        return y.astype(jnp.bfloat16).reshape(n, h, w, c)

    s = jnp.asarray(rng.normal(size=(c,)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(c,)), jnp.bfloat16)
    report("asis", timed(asis, (x, kf32), iters), flops)
    report("affine_relu", timed(affine_relu, (x, kf32, s, b), iters), flops,
           "(epilogue included)")
    report("pad16", timed(pad16, (x, kf32), iters), flops, "(exact)")
    report("plane", timed(plane, (x, kf32), iters), flops,
           "(border-inexact probe)")
    report("dots9", timed(dots9, (x, kf32), iters), flops)


def bench_conv1(iters):
    """conv1 region: clips (B,T,800,1344,3) -> S2D -> 3-tap 4x4 conv ->
    affine+relu -> maxpool. Measures the whole region incl. the layout
    copies the r3 trace blames on it (~20 ms/iter at b2). A/Bs every
    env-selectable decomposition (DAT_CONV1_IMPL x DAT_S2D_IMPL) in one
    process — all exact, equivalence pinned in tests/test_models.py."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from detectandtrack_tpu.models.backbone import Conv1S2D

    bsz, t, h, w = (int(os.environ.get("BK_B", "2")), 8, 800, 1344)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(bsz, t, h, w, 3)), jnp.float32)
    mod = Conv1S2D(time_kernel=3, dtype=jnp.bfloat16)
    params = mod.init(jax.random.PRNGKey(0), x)
    # conv1 flops: 3 time taps x 4x4x12 -> 64 at (h/2, w/2)
    flops = 2.0 * bsz * t * (h // 2) * (w // 2) * 64 * (4 * 4 * 12) * 3

    def region(p, x):
        y = nn.relu(mod.apply(p, x))
        return nn.max_pool(y, (1, 3, 3), strides=(1, 2, 2),
                           padding=((0, 0), (1, 1), (1, 1)))

    def measure(label):
        # region is not shape-preserving (maxpool downsamples), so chain
        # by feeding a negligible function of the output back into the
        # input — keeps every iteration data-dependent (nothing for the
        # runtime to elide) without changing what is computed.
        @jax.jit
        def chain(p, x):
            acc = jnp.float32(0)
            for _ in range(iters):
                s = jnp.sum(region(p, x).astype(jnp.float32))
                acc = acc + s
                x = x + s * 1e-30
            return acc

        float(chain(params, x))
        t0 = time.perf_counter()
        float(chain(params, x))
        report(label, (time.perf_counter() - t0) / iters, flops,
               "(incl. relu+maxpool)")

    variants = os.environ.get(
        "BK_VARIANTS",
        "pallas/reshape,timefold/fold,timefold/reshape,timefold/slices,"
        "inshift/fold,inshift/reshape,inshift/slices")
    for v in variants.split(","):
        c1, s2d = v.strip().split("/")
        os.environ["DAT_CONV1_IMPL"] = c1
        os.environ["DAT_S2D_IMPL"] = s2d
        measure(v.strip())


def bench_res2(iters):
    """res2's 3x3x3 temporal conv: (B, T, 200, 336, 64) -> 64. The r5
    roofline shows its 3 inshift tap convs at 38.6% MXU (= 77% of the
    cin=64 lane ceiling 64/128) costing 6 x 2.08 ms/iter at b4. A/Bs the
    DAT_TEMPORAL_CONV decompositions on the exact shape (all exact —
    tests/test_models.py::test_temporal_conv_shift_decomposition_exact)."""
    import jax
    import jax.numpy as jnp
    from detectandtrack_tpu.models.backbone import Conv3d

    bsz, t, h, w, cin = (int(os.environ.get("BK_B", "4")), 8, 200, 336, 64)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(bsz, t, h, w, cin)), jnp.bfloat16)
    flops = 2.0 * bsz * t * h * w * 9 * cin * 64 * 3

    variants = os.environ.get(
        "BK_VARIANTS", "inshift,timefold,outshift,native5d")
    for v in (s.strip() for s in variants.split(",")):
        os.environ["DAT_TEMPORAL_CONV"] = v
        mod = Conv3d(64, (3, 3, 3), dtype=jnp.bfloat16)
        params = mod.init(jax.random.PRNGKey(0), x)
        sec = timed(lambda x, p: mod.apply(p, x), (x, params), iters)
        report(v, sec, flops)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "kps"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    {"kps": bench_kps, "conv1": bench_conv1, "res2": bench_res2}[which](iters)


if __name__ == "__main__":
    main()
