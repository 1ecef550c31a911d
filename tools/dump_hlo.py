"""Dump the optimized HLO of the inference graph (for correlating profiler
op names like `reshape.1903` back to the producing source ops).

Usage: python tools/dump_hlo.py [HxW] [batch] [out.txt] [grep-name ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from detectandtrack_tpu.core.config import load_cfg
    from detectandtrack_tpu.models.detector import build_model

    bucket = sys.argv[1] if len(sys.argv) > 1 else "800x1344"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/detect_hlo.txt"
    bh, bw = (int(x) for x in bucket.split("x"))
    cfg = load_cfg(opts=[
        "VIDEO.VIDEO_ON", True, "VIDEO.NUM_FRAMES", 8,
        "VIDEO.TIME_KERNEL_DIM", "[3, 3, 3, 3, 1]",
        "TEST.SHAPE_BUCKETS", f"[[{bh}, {bw}]]",
        "TEST.SCORE_THRESH", 0.0,
    ])
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    clips = jnp.asarray(rng.normal(size=(batch, 8, bh, bw, 3)), jnp.float32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), clips[:1])
    params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    det = jax.jit(lambda p, c: model.apply(p, c))
    txt = det.lower(params, clips).compile().as_text()
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {out}")
    for name in sys.argv[4:]:
        for line in txt.splitlines():
            if f"%{name} " in line or f"{name} =" in line:
                print(line.strip()[:400])


if __name__ == "__main__":
    main()
