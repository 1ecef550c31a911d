"""Capture a jax.profiler trace of the inference hot loop (one artifact per
bucket). Usage: python tools/capture_trace.py [HxW] [batch] [outdir] [mix]

`mix` = "realistic" (default; deterministic banded proposal tubes through
the precomputed-proposals path with the RPN kept live — the bench.py
headline graph) or "degenerate" (random-weight RPN proposals, the r1-r3
graph). Keeps the committed trace artifacts under artifacts/ reproducible:
same detector build path as bench.py, 3 traced iterations after warmup.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "dat_jax_cache"))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from detectandtrack_tpu.core.config import load_cfg
    from detectandtrack_tpu.models.detector import (GeneralizedRCNN,
                                                    build_model)
    from detectandtrack_tpu.utils.profiling import trace, force_outputs

    bucket = sys.argv[1] if len(sys.argv) > 1 else "800x1344"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    bh, bw = (int(x) for x in bucket.split("x"))
    mix = sys.argv[4] if len(sys.argv) > 4 else "realistic"
    outdir = (sys.argv[3] if len(sys.argv) > 3
              else f"artifacts/trace_{bucket}_b{batch}_{mix}")
    cfg = load_cfg(opts=[
        "VIDEO.VIDEO_ON", True, "VIDEO.NUM_FRAMES", 8,
        "VIDEO.TIME_KERNEL_DIM", "[3, 3, 3, 3, 1]",
        "TEST.SHAPE_BUCKETS", f"[[{bh}, {bw}]]",
        "TEST.SCORE_THRESH", 0.0,
    ])
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    clips = jnp.asarray(rng.normal(size=(batch, 8, bh, bw, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), clips[:1])
    if mix == "realistic":
        import bench
        tubes = jnp.asarray(bench.make_realistic_tubes(
            batch, cfg.RPN.POST_NMS_TOP_N_TEST, 8, bh, bw))
        # Tubes passed as an ARGUMENT (not a closed-over constant) and the
        # same output leaves selected, so this is the exact headline graph
        # benched by bench.py and the two tools share one compile-cache
        # entry (identical jaxpr -> identical cache key).
        @jax.jit
        def detect_realistic(p, c, tb):
            out = model.apply(p, c, tb, True,
                              method=GeneralizedRCNN.detect_with_proposals)
            return (out["boxes"], out["scores"], out["valid"],
                    out.get("keypoints"))
        det = lambda p, c: detect_realistic(p, c, tubes)
    else:
        det = jax.jit(lambda p, c: model.apply(p, c))
    force_outputs(det(params, clips))        # compile + warm
    force_outputs(det(params, clips))
    with trace(outdir):
        for _ in range(3):
            force_outputs(det(params, clips))
    print("trace written to", outdir)


if __name__ == "__main__":
    main()
