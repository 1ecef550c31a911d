"""Benchmark harness: clips/sec/chip on PoseTrack-style inference.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "clips/sec/chip", "vs_baseline": N}

The reference never published throughput (BASELINE.md), so `vs_baseline`
is computed against an ESTIMATED Caffe2-GPU figure of 0.5 clips/sec/GPU for
the 3D R-50 T=8 pipeline (two device round-trips + host NMS per clip on a
2017 GPU; see BASELINE.md row "Reference inference throughput"). The
north-star target is >= 10x that estimate.

Defaults measure the PoseTrack eval resolution (TEST.SCALE 800 /
MAX_SIZE 1333 → bucket 800x1344), the shape the parity contract cares
about — not the easier small bucket.

RoI-mix honesty (VERDICT r3 #1): random weights collapse every proposal to
ONE FPN level, understating RoIAlign by ~2.4× vs a trained model. The
HEADLINE number therefore runs the full graph with a deterministic,
realistic proposal distribution injected through the model's
precomputed-proposals path (`detect_with_proposals(run_rpn=True)` — the
RPN + proposal NMS still execute; only the selected tubes are replaced).
The level mix is banded person-box sampling at the eval scale
(P2/P3/P4/P5 ≈ .35/.35/.20/.10 of sqrt-area bands — PoseTrack-shaped; no
dataset is on this machine to measure the true histogram, see STATUS).
The old random-proposal number is kept as `*_degenerate` fields.

Env knobs: BENCH_BATCH (default 4), BENCH_BUCKET ("800x1344"),
BENCH_ITERS (default 10), BENCH_BODY (resnet50), BENCH_T (8),
BENCH_KPS_BUDGET (0 = keypoints for all detections),
BENCH_SKIP_DEGENERATE=1 (headline only), BENCH_MODE=train (training-step
throughput instead of inference; see `bench_train`).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CAFFE2_GPU_CLIPS_PER_SEC_ESTIMATE = 0.5

# TPU v5e (v5 lite) peak: 197 bf16 TFLOP/s per chip (394 is the INT8 TOPS
# figure). Rounds 1-4 divided by 394e12, understating MFU 2x; corrected r5
# after an on-chip probe: a dense 8192^3 bf16 matmul sustains 172 TF/s and
# the model's own conv fusions reach 185 TF/s - both impossible against a
# 394 peak, both ~90% of 197 (STATUS r5). f32-typed dots run at the same
# rate (jax default matmul precision lowers them to bf16 multiplies), so
# one constant serves both compute dtypes.
PEAK_BF16_FLOPS = 197e12

# Persistent compilation cache: every cold compile over the axon
# remote-compile tunnel costs 10-20 min (STATUS measurement notes); a warm
# cache turns a repeat bench (e.g. the driver's end-of-round run after a
# builder already benched the same graph) into seconds. Must be set before
# jax initializes. User-scoped (not a fixed world-writable /tmp path) so
# another user on a shared host can't pre-create or poison it (ADVICE r3).
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "dat_jax_cache"))

# Realistic FPN level mix for person boxes at the 800-px eval scale:
# (sqrt-area band, fraction). Bands follow assign_fpn_levels with
# canonical (224, lvl 4) over ROI levels P2..P5.
_LEVEL_BANDS = [((32.0, 112.0), 0.35), ((112.0, 224.0), 0.35),
                ((224.0, 448.0), 0.20), ((448.0, 720.0), 0.10)]


def make_realistic_tubes(batch, k, t, im_h, im_w, seed=0):
    """Deterministic person-shaped proposal tubes (B, K, 4T) spanning the
    FPN levels with the documented fractions; small per-frame drift makes
    them genuine tubes."""
    import numpy as np

    rng = np.random.default_rng(seed)
    counts = [int(round(f * k)) for _, f in _LEVEL_BANDS]
    counts[0] += k - sum(counts)
    sa = np.concatenate([rng.uniform(lo, hi, size=(batch, c))
                         for ((lo, hi), _), c in zip(_LEVEL_BANDS, counts)
                         if c > 0], axis=1)                  # (B, K)
    aspect = rng.uniform(0.33, 0.8, size=sa.shape)           # w/h: tall
    h = sa / np.sqrt(aspect)
    w = sa * np.sqrt(aspect)
    cx = rng.uniform(0.0, im_w, size=sa.shape)
    cy = rng.uniform(0.0, im_h, size=sa.shape)
    drift = rng.normal(scale=3.0, size=(batch, k, t, 2))
    boxes = np.stack([
        cx[..., None] + drift[..., 0] - w[..., None] / 2,
        cy[..., None] + drift[..., 1] - h[..., None] / 2,
        cx[..., None] + drift[..., 0] + w[..., None] / 2,
        cy[..., None] + drift[..., 1] + h[..., None] / 2,
    ], axis=-1)                                              # (B, K, T, 4)
    boxes[..., 0::2] = boxes[..., 0::2].clip(0, im_w - 1)
    boxes[..., 1::2] = boxes[..., 1::2].clip(0, im_h - 1)
    return boxes.reshape(batch, k, 4 * t).astype(np.float32)


def _timed(fn, args, iters, fetch):
    """Double-buffered dispatch/consume loop → seconds total.

    Measurement rules (verify skill): device_get EVERY output leaf — the
    axon runtime can elide un-fetched dispatches. Dispatch batch i+1
    before consuming batch i, the exact pattern of
    engine/inference.run_inference, so device compute and host transfer
    overlap as they do in production; every output is still fully forced
    before the clock stops.
    """
    t0 = time.perf_counter()
    pending = fn(*args)
    for _ in range(iters - 1):
        nxt = fn(*args)
        fetch(pending)
        pending = nxt
    fetch(pending)
    return time.perf_counter() - t0


def _flops(lowerable, *args):
    """XLA's own flop count for the compiled program → MFU (the honest
    absolute metric; the Caffe2 multiple rests on an estimate)."""
    try:
        cost = lowerable.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) or None
    except Exception:
        return None


def bench_infer():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from detectandtrack_tpu.core.config import load_cfg
    from detectandtrack_tpu.models.detector import (GeneralizedRCNN,
                                                    build_model)

    batch = int(os.environ.get("BENCH_BATCH", "4"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    body = os.environ.get("BENCH_BODY", "resnet50")
    t = int(os.environ.get("BENCH_T", "8"))
    bucket = os.environ.get("BENCH_BUCKET", "800x1344")
    bh, bw = (int(x) for x in bucket.split("x"))

    kps_budget = int(os.environ.get("BENCH_KPS_BUDGET", "0"))
    cfg = load_cfg(opts=[
        "MODEL.CONV_BODY", body,
        "VIDEO.VIDEO_ON", t > 1,
        "VIDEO.NUM_FRAMES", t,
        "VIDEO.TIME_KERNEL_DIM", "[3, 3, 3, 3, 1]",
        "TEST.SHAPE_BUCKETS", f"[[{bh}, {bw}]]",
        "TEST.SCORE_THRESH", 0.0,
        "KRCNN.MAX_ROIS_PER_IM", kps_budget,
    ])
    model = build_model(cfg)

    rng = np.random.default_rng(0)
    clips = jnp.asarray(
        rng.normal(size=(batch, t, bh, bw, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), clips[:1])

    tubes = jnp.asarray(make_realistic_tubes(
        batch, cfg.RPN.POST_NMS_TOP_N_TEST, t, bh, bw))

    def _outs(out):
        return (out["boxes"], out["scores"], out["valid"],
                out.get("keypoints"))

    @jax.jit
    def detect_realistic(p, c, tb):
        return _outs(model.apply(
            p, c, tb, True, method=GeneralizedRCNN.detect_with_proposals))

    @jax.jit
    def detect_degenerate(p, c):
        return _outs(model.apply(p, c))

    def fetch(o):
        jax.tree.map(lambda x: np.asarray(x) if x is not None else None, o)

    flops = _flops(detect_realistic, params, clips, tubes)
    fetch(detect_realistic(params, clips, tubes))    # warm-up / compile
    dt = _timed(detect_realistic, (params, clips, tubes), iters, fetch)
    clips_per_sec = batch * iters / dt

    peak = PEAK_BF16_FLOPS  # bf16 MXU peak; f32 dots lower to bf16
    mfu = flops * iters / dt / peak * 100.0 if flops else None

    result = {
        "metric": f"PoseTrack inference clips/sec/chip "
                  f"({body} T={t} {bh}x{bw} b{batch}, realistic RoI mix)",
        "value": round(clips_per_sec, 3),
        "unit": "clips/sec/chip",
        # The reference never published throughput; the denominator is a
        # self-chosen ESTIMATE (0.5 clips/s/GPU Caffe2), unmeasurable here.
        # mfu_pct / frames_per_sec are the honest absolute numbers.
        "vs_baseline": round(
            clips_per_sec / CAFFE2_GPU_CLIPS_PER_SEC_ESTIMATE, 2),
        "vs_baseline_is_estimate": True,
        "baseline_denominator_clips_per_sec":
            CAFFE2_GPU_CLIPS_PER_SEC_ESTIMATE,
        "frames_per_sec": round(clips_per_sec * t, 1),
        "mfu_pct": round(mfu, 2) if mfu is not None else None,
        "mfu_peak_dtype": cfg.MODEL.COMPUTE_DTYPE,
        "model_tflops_per_clip": (round(flops / batch / 1e12, 3)
                                  if flops else None),
        "roi_mix": "banded P2/P3/P4/P5=.35/.35/.20/.10 sqrt-area, "
                   "K=%d proposals/clip" % cfg.RPN.POST_NMS_TOP_N_TEST,
        "roi_align_impl": cfg.MODEL.ROI_ALIGN_IMPL,
    }

    if os.environ.get("BENCH_SKIP_DEGENERATE") != "1":
        # r1-r3 comparable number: random-weight proposals (collapse to
        # one FPN level — optimistic for RoIAlign; kept for continuity).
        fetch(detect_degenerate(params, clips))
        dt_d = _timed(detect_degenerate, (params, clips), iters, fetch)
        cps_d = batch * iters / dt_d
        flops_d = _flops(detect_degenerate, params, clips)
        result["clips_per_sec_degenerate"] = round(cps_d, 3)
        result["mfu_pct_degenerate"] = (
            round(flops_d * iters / dt_d / peak * 100.0, 2)
            if flops_d else None)
    print(json.dumps(result))


def bench_train():
    """Training-step throughput (VERDICT r3 #6): the sharded train step —
    forward + in-XLA targets + losses + backward + SGD — on synthetic
    clips at the TRAIN scale. BENCH_TRAIN_BATCH (default 1 clip/step)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from detectandtrack_tpu.core.config import load_cfg
    from detectandtrack_tpu.engine.train import (create_train_state,
                                                 make_train_step)
    from detectandtrack_tpu.models.detector import build_model

    batch = int(os.environ.get("BENCH_TRAIN_BATCH", "1"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    body = os.environ.get("BENCH_BODY", "resnet50")
    t = int(os.environ.get("BENCH_T", "8"))
    bucket = os.environ.get("BENCH_BUCKET", "800x1344")
    bh, bw = (int(x) for x in bucket.split("x"))

    cfg = load_cfg(opts=[
        "MODEL.CONV_BODY", body,
        "VIDEO.VIDEO_ON", t > 1,
        "VIDEO.NUM_FRAMES", t,
        "VIDEO.TIME_KERNEL_DIM", "[3, 3, 3, 3, 1]",
        "TRAIN.SCALES", f"[{bh}]",
        "TRAIN.MAX_SIZE", bw,
        # Keep the 11 repeated steps on one synthetic batch numerically
        # finite for the loss sanity field. Random-init RPN emits
        # degenerate proposal tubes whose bbox-encode targets are ~1e7
        # (smooth-L1 VALUE is huge; its gradient saturates at 1/coord),
        # and the resulting O(30)-norm updates blow bf16 activations to
        # NaN within ~4 steps at any LR. Grad-norm clipping (the same
        # knob the synthetic training recipe uses) plus a modest LR keep
        # the trajectory finite; the clip adds one global-norm pass to
        # the measured step — honest, since real from-scratch runs need
        # it too.
        "SOLVER.BASE_LR", "0.0005",
        "SOLVER.CLIP_GRAD_NORM", "10.0",
    ])
    model = build_model(cfg)

    rng = np.random.default_rng(0)
    g = cfg.TRAIN.MAX_GT_PER_IM
    k = cfg.KRCNN.NUM_KEYPOINTS
    clips = jnp.asarray(rng.normal(size=(batch, t, bh, bw, 3)), jnp.float32)
    # Person-shaped GT spanning FPN levels (same banding as inference).
    gtb = jnp.asarray(make_realistic_tubes(batch, g, t, bh, bw, seed=1))
    gtk = jnp.asarray(rng.uniform(0, min(bh, bw),
                                  size=(batch, g, t, k, 3)), jnp.float32)
    gtk = gtk.at[..., 2].set(2.0)
    batch_d = {
        "clips": clips,
        "gt_boxes": gtb,
        "gt_keypoints": gtk,
        "gt_valid": jnp.ones((batch, g), bool),
    }

    params = model.init(jax.random.PRNGKey(0), clips[:1])
    state = create_train_state(cfg, params)
    step_fn = make_train_step(model, cfg, mesh=None, donate=False)

    flops = _flops(step_fn, state, batch_d)

    def _force(state, metrics):
        # block_until_ready does NOT force execution on the axon runtime
        # (unfetched dispatches are elided — STATUS measurement rules);
        # fetch a scalar metrics leaf AND one updated param leaf so both
        # the fwd/bwd chain and the final SGD update actually run.
        loss = float(np.asarray(metrics["loss_total"]))
        np.asarray(jax.tree.leaves(state.params)[0]).ravel()[0]
        return loss

    state, metrics = step_fn(state, batch_d)        # compile + warm-up
    _force(state, metrics)

    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step_fn(state, batch_d)
    final_loss = _force(state, metrics)
    dt = time.perf_counter() - t0

    steps_per_sec = iters / dt
    peak = PEAK_BF16_FLOPS  # bf16 MXU peak; f32 dots lower to bf16
    mfu = flops * iters / dt / peak * 100.0 if flops else None
    print(json.dumps({
        "metric": f"PoseTrack TRAIN steps/sec/chip "
                  f"({body} T={t} {bh}x{bw} b{batch})",
        "value": round(steps_per_sec, 3),
        "unit": "steps/sec/chip",
        "clips_per_sec": round(steps_per_sec * batch, 3),
        "mfu_pct": round(mfu, 2) if mfu is not None else None,
        "mfu_peak_dtype": cfg.MODEL.COMPUTE_DTYPE,
        "model_tflops_per_step": (round(flops / 1e12, 3) if flops
                                  else None),
        "loss_total": final_loss,
    }))


def bench_stream():
    """Streaming (online detect→track) per-frame latency (VERDICT r4 #4).

    Runs the REAL `run_inference` streaming path — bucketed batches,
    double-buffered dispatch/consume, StreamingTrackingSink fed while the
    next batch is in flight — over a synthetic dataset generated at the
    eval resolution, and reports per-frame dispatch→tracked-frame-out
    latency p50/p95/p99 plus the sink's out-of-order buffer high-water.
    The north star is the host tracker consuming device tensors
    asynchronously; this measures what an ONLINE user of that mode sees.

    Env: BENCH_BODY (resnet50; use resnet101 for the config-5 backbone),
    BENCH_STREAM_BATCH (default 1 = lowest latency; raise for throughput),
    BENCH_STREAM_FRAMES (default 64 frames/video), BENCH_BUCKET.
    """
    import numpy as np

    from detectandtrack_tpu.core.config import load_cfg
    from detectandtrack_tpu.data.posetrack import PosetrackDataset
    from detectandtrack_tpu.data.synthetic import generate_synthetic_posetrack
    from detectandtrack_tpu.engine.inference import run_inference
    from detectandtrack_tpu.models.detector import build_model
    from detectandtrack_tpu.tracking.engine import StreamingTrackingSink
    import jax
    import jax.numpy as jnp

    batch = int(os.environ.get("BENCH_STREAM_BATCH", "1"))
    body = os.environ.get("BENCH_BODY", "resnet50")
    t = int(os.environ.get("BENCH_T", "8"))
    bucket = os.environ.get("BENCH_BUCKET", "800x1344")
    frames = int(os.environ.get("BENCH_STREAM_FRAMES", "64"))
    bh, bw = (int(x) for x in bucket.split("x"))

    cfg = load_cfg(opts=[
        "MODEL.CONV_BODY", body,
        "VIDEO.VIDEO_ON", t > 1,
        "VIDEO.NUM_FRAMES", t,
        "VIDEO.TIME_KERNEL_DIM",
        "[3, 3, 3, 1, 1]" if body == "resnet101" else "[3, 3, 3, 3, 1]",
        # Config-5 streaming semantics: kps for the top detections only,
        # online Hungarian tracker (stream_3d_R101_online.yaml).
        "KRCNN.MAX_ROIS_PER_IM", 20,
        "TRACKING.BIPARTITE_MATCHING_ALGO", "hungarian",
        "TEST.SCALE", bh, "TEST.MAX_SIZE", bw,
        "TEST.SHAPE_BUCKETS", f"[[{bh}, {bw}]]",
    ])

    data_dir = os.path.join("/tmp", f"dat_stream_{bh}x{bw}")
    json_path = os.path.join(data_dir, "train.json")
    if not os.path.exists(json_path):
        json_path = generate_synthetic_posetrack(
            data_dir, num_videos=2, frames_per_video=frames,
            image_hw=(bh, bw), people_per_video=3, seed=0)
    ds = PosetrackDataset(json_path, data_dir)

    model = build_model(cfg)
    clip = jnp.zeros((1, t, bh, bw, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), clip)

    sink = StreamingTrackingSink(cfg)
    dispatch_log = {}
    latencies = {}

    def timed_sink(vid, ordinal, total, frame):
        # stride=1 full coverage → ordinal == frame index (asserted by
        # every frame finding its dispatch stamp).
        latencies[(vid, ordinal)] = (
            time.perf_counter() - dispatch_log[(vid, ordinal)])
        sink(vid, ordinal, total, frame)

    t0 = time.perf_counter()
    run_inference(cfg, model, params, ds, batch_size=batch,
                  frame_sink=timed_sink, dispatch_log=dispatch_log)
    wall = time.perf_counter() - t0
    sink.results()                       # asserts every video completed

    # Warm frames only for the latency percentiles: the first two batches
    # pay one-off compile/warm cost that an online deployment pays once.
    # Exclude by DISPATCH order (earliest-dispatched frames), not by
    # magnitude — dropping the largest values would bias the tail stats.
    by_dispatch = sorted(latencies, key=lambda k: dispatch_log[k])
    n_frames = len(by_dispatch)
    keep = by_dispatch[min(2 * batch * t, max(n_frames - 1, 0)):]
    warm = np.array([latencies[k] for k in keep]) * 1e3
    hw = max(sink.buffer_high_water.values()) if sink.buffer_high_water \
        else 0
    print(json.dumps({
        "metric": f"PoseTrack STREAM per-frame latency p50 "
                  f"({body} T={t} {bh}x{bw} b{batch}, online track)",
        "value": round(float(np.percentile(warm, 50)), 1),
        "unit": "ms",
        "p95_ms": round(float(np.percentile(warm, 95)), 1),
        "p99_ms": round(float(np.percentile(warm, 99)), 1),
        "max_ms": round(float(warm.max()), 1),
        "frames": n_frames,
        "fps_end_to_end": round(n_frames / wall, 1),
        "sink_buffer_high_water": int(hw),
        "note": "latency = detection-batch dispatch -> tracked frame out "
                "of the online sink; percentiles exclude the first "
                "2 batches' frames by dispatch order (one-off "
                "compile/warm cost an online deployment pays once)",
    }))


def main():
    mode = os.environ.get("BENCH_MODE", "infer")
    if mode == "train":
        bench_train()
    elif mode == "stream":
        bench_stream()
    else:
        bench_infer()


if __name__ == "__main__":
    try:
        main()
    except BaseException as e:  # noqa: BLE001 — still emit ONE JSON line
        # A dead TPU tunnel (or any init/compile failure) should leave a
        # diagnosable record instead of an empty BENCH artifact.
        print(json.dumps({
            "metric": "PoseTrack inference clips/sec/chip",
            "value": None,
            "unit": "clips/sec/chip",
            "error": f"{type(e).__name__}: {e}"[:400],
        }))
        raise
