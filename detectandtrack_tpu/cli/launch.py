"""CLI launcher: `python -m detectandtrack_tpu.cli.launch --cfg ... --mode ...`.

Reference parity: `launch.py` + `tools/train_net.py` + `tools/test_net.py`
(SURVEY.md §2.1, §3): one entry point that merges the YAML config and dotted
overrides, then dispatches to train / test (dataset inference) / track
(stage-2 linking + eval) / bench.

Usage:
  launch --cfg configs/video/foo.yaml --mode train [KEY VALUE]...
  launch --cfg ... --mode test --weights ckpt.npz
  launch --cfg ... --mode track --detections dets.npz
  launch --cfg ... --mode eval  --detections tracks_dir   (score saved tracks)
  launch --cfg ... --mode stream --weights ckpt.npz   (online detect+track)
  launch --mode demo-data --out data/synthetic   (generate synthetic data)
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time
from typing import Optional

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="DetectAndTrack-TPU launcher")
    p.add_argument("--cfg", default=None, help="experiment YAML")
    p.add_argument("--mode", required=True,
                   choices=["train", "test", "track", "stream", "eval", "bench",
                            "demo-data", "import-weights"])
    p.add_argument("--weights", default=None,
                   help="npz weights (overrides cfg TRAIN/TEST.WEIGHTS)")
    p.add_argument("--detections", default=None,
                   help="detections pickle for --mode track; saved-tracks dir "
                        "for --mode eval")
    p.add_argument("--out", default=None, help="output dir override")
    p.add_argument("--max-clips", type=int, default=None,
                   help="limit inference clips (debug)")
    p.add_argument("--video-range", default=None,
                   help="START:END video slice for sharded inference")
    p.add_argument("--det-out", default=None,
                   help="detections pickle path override (test mode)")
    p.add_argument("--subprocess-shards", type=int, default=0,
                   help="fan dataset inference out over N subprocesses "
                        "(reference multi_gpu_test_net_on_dataset parity; "
                        "prefer the default in-process mesh sharding)")
    p.add_argument("--vis", action="store_true",
                   help="write annotated frames (track mode)")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force the jax backend (the host sitecustomize can "
                        "pin a TPU tunnel that wins over JAX_PLATFORMS; "
                        "'cpu' is the debug escape hatch)")
    p.add_argument("opts", nargs="*",
                   help="dotted config overrides: KEY VALUE ...")
    return p.parse_intermixed_args(argv)


def _load_cfg(args):
    from ..core.config import load_cfg
    cfg = load_cfg(args.cfg, args.opts)
    if args.out:
        import dataclasses
        cfg = dataclasses.replace(cfg, OUTPUT_DIR=args.out)
    return cfg


def _dataset(cfg, names):
    from ..data.posetrack import get_dataset
    if not names:
        raise SystemExit("No dataset configured (TRAIN/TEST.DATASETS)")
    return get_dataset(names[0], cfg.DATA.ROOT)


def _init_model(cfg, weights: Optional[str], seed: int = 0):
    import jax
    from ..models.detector import build_model
    from ..utils.checkpoint import load_weights_npz

    model = build_model(cfg)
    t = cfg.VIDEO.NUM_FRAMES if cfg.VIDEO.VIDEO_ON else 1
    bh, bw = cfg.TEST.SHAPE_BUCKETS[0]
    import jax.numpy as jnp
    clip = jnp.zeros((1, t, bh, bw, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(seed), clip)
    if weights:
        params = load_weights_npz(weights, params)
    return model, params


def mode_train(args, cfg):
    import jax
    from ..data.pipeline import ClipBatcher, DeviceLoader
    from ..engine.train import (TrainState, create_train_state,
                                make_train_step)
    from ..parallel.mesh import batch_sharded, make_mesh, replicate, \
        shard_batch
    from ..utils.checkpoint import (latest_checkpoint_step,
                                    restore_checkpoint, save_checkpoint,
                                    save_weights_npz, wait_for_checkpoints)
    from ..utils.lr_policy import get_lr_at_iter
    from ..utils.logging_utils import setup_logging
    from ..utils.training_stats import TrainingStats
    import logging

    logger = setup_logging(
        level=logging.DEBUG if cfg.DEBUG else logging.INFO)
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    ds = _dataset(cfg, cfg.TRAIN.DATASETS)
    model, params = _init_model(cfg, args.weights or cfg.TRAIN.WEIGHTS
                                or None, cfg.RNG_SEED)

    mesh = make_mesh()
    state = create_train_state(cfg, params)
    ckpt_dir = os.path.join(cfg.OUTPUT_DIR, "checkpoints")
    start_step = 0
    if cfg.TRAIN.AUTO_RESUME:
        restored, step = restore_checkpoint(ckpt_dir, state)
        if restored is not None:
            state, start_step = restored, int(step)
            logger.info("auto-resumed from step %d", start_step)
    state = replicate(mesh, state)

    step_fn = make_train_step(model, cfg, mesh)
    stats = TrainingStats(
        cfg.SOLVER.MAX_ITER,
        jsonl_path=os.path.join(cfg.OUTPUT_DIR, "training_stats.jsonl"))
    batcher = ClipBatcher(ds, cfg, train=True, seed=cfg.RNG_SEED)
    bsh = batch_sharded(mesh)

    def lr_at(i):
        return get_lr_at_iter(
            i, base_lr=cfg.SOLVER.BASE_LR, policy=cfg.SOLVER.LR_POLICY,
            gamma=cfg.SOLVER.GAMMA, steps=cfg.SOLVER.STEPS,
            warm_up_iters=cfg.SOLVER.WARM_UP_ITERS,
            warm_up_factor=cfg.SOLVER.WARM_UP_FACTOR,
            warm_up_method=cfg.SOLVER.WARM_UP_METHOD)

    def log_metrics(pending_metrics, i):
        # Device→host read of a PREVIOUS step's metrics: the current step
        # is already dispatched, so this read never stalls the chip (the
        # reference's per-iteration host sync was the GPU-idle bubble
        # SURVEY §3.1 calls out; round 1 reproduced it by reading the
        # just-dispatched step).
        vals = {k: float(v) for k, v in pending_metrics.items()}
        stats.update_iter_stats(vals, i, lr_at(i))

    it = start_step
    prev = None                          # (device metrics, iter) 1-step lag
    prev_lr = lr_at(max(it - 1, 0))
    while it < cfg.SOLVER.MAX_ITER:
        loader = DeviceLoader(
            batcher.epoch(cfg.TRAIN.IMS_PER_BATCH * mesh.devices.size),
            prefetch=cfg.DATA.PREFETCH, sharding=bsh)
        for batch in loader:
            stats.iter_tic()
            state, metrics = step_fn(state, batch)
            if prev is not None:
                log_metrics(*prev)
            prev = (metrics, it)
            stats.iter_toc()
            lr = lr_at(it)
            ratio = (max(lr, prev_lr) / max(min(lr, prev_lr), 1e-12)
                     if prev_lr > 0 else 1.0)
            if lr != prev_lr and ratio >= (
                    cfg.SOLVER.LOG_LR_CHANGE_THRESHOLD):
                logger.info("lr change: %.6f -> %.6f at iter %d",
                            prev_lr, lr, it)
            prev_lr = lr
            it += 1
            if it % cfg.TRAIN.CHECKPOINT_PERIOD == 0 or (
                    it >= cfg.SOLVER.MAX_ITER):
                if prev is not None:     # drain before snapshotting
                    log_metrics(*prev)
                    prev = None
                host_state = jax.tree.map(np.asarray, state)
                save_checkpoint(ckpt_dir, host_state, it)
            if it >= cfg.SOLVER.MAX_ITER:
                break
    if prev is not None:
        log_metrics(*prev)
    wait_for_checkpoints(ckpt_dir)       # drain async orbax saves
    host_params = jax.tree.map(np.asarray, state.params)
    final = os.path.join(cfg.OUTPUT_DIR, "model_final.npz")
    save_weights_npz(final, host_params)
    logger.info("saved final weights to %s", final)
    stats.close()
    return final


def mode_test(args, cfg):
    import jax
    from ..engine.inference import run_inference
    from ..parallel.mesh import make_mesh
    from ..utils.logging_utils import setup_logging

    logger = setup_logging()
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    ds = _dataset(cfg, cfg.TEST.DATASETS or cfg.TRAIN.DATASETS)
    out = args.det_out or os.path.join(cfg.OUTPUT_DIR, "detections.pkl")

    if args.subprocess_shards and args.subprocess_shards > 1:
        # Cross-process fan-out (parity: test_engine.
        # multi_gpu_test_net_on_dataset + utils/subprocess.py): each child
        # handles a disjoint video range; merge = dict union. Children
        # re-load the experiment from --cfg, so one is required (dotted
        # `opts` alone cannot be round-tripped through a None argv entry).
        # Note: each child initializes its own jax backend — on a TPU host
        # the chip's exclusive lock serializes them; this path is for
        # CPU/multi-GPU hosts.
        if not args.cfg:
            raise SystemExit(
                "--subprocess-shards requires --cfg (children re-parse the "
                "experiment YAML)")
        from ..utils.subprocess_utils import process_in_parallel
        n_videos = len(ds.videos())
        cmd = [sys.executable, "-m", "detectandtrack_tpu.cli.launch",
               "--mode", "test", "--cfg", args.cfg,
               "--video-range", "{start}:{end}", "--det-out", "{out}",
               "--out", cfg.OUTPUT_DIR]
        if args.weights:
            cmd += ["--weights", args.weights]
        cmd += list(args.opts)
        shard_paths = process_in_parallel(
            "detections", n_videos, cmd, cfg.OUTPUT_DIR,
            num_workers=args.subprocess_shards)
        dets = {}
        for p in shard_paths:
            with open(p, "rb") as f:
                dets.update(pickle.load(f))
        with open(out, "wb") as f:
            pickle.dump(dets, f)
        logger.info("merged %d shards -> %s", len(shard_paths), out)
        _eval_detections(cfg, ds, dets, logger)
        return out

    model, params = _init_model(cfg, args.weights or cfg.TEST.WEIGHTS
                                or None, cfg.RNG_SEED)
    # Shard the clip batch over all local devices (parity:
    # multi_gpu_test_net_on_dataset's per-GPU fan-out, SURVEY §3.2).
    mesh = make_mesh() if jax.device_count() > 1 else None
    if mesh is not None:
        logger.info("sharded inference over %d devices", mesh.devices.size)
    vrange = None
    if args.video_range:
        lo, hi = args.video_range.split(":")
        vrange = (int(lo), int(hi))
    t0 = time.time()
    dets = run_inference(cfg, model, params, ds, max_clips=args.max_clips,
                         mesh=mesh, video_range=vrange)
    dt = time.time() - t0
    n_frames = sum(len(v) for v in dets.values())
    logger.info("inference over %d frames in %.1fs (%.2f fps)",
                n_frames, dt, n_frames / max(dt, 1e-9))
    with open(out, "wb") as f:
        pickle.dump(dets, f)
    logger.info("wrote %s", out)

    # Skipped for sharded children (--video-range): the parent scores the
    # merged detections over the full set.
    if vrange is None:
        _eval_detections(cfg, ds, dets, logger)
    return out


def _eval_detections(cfg, ds, dets, logger):
    """Dataset-level per-frame detection eval (parity: the reference's
    test_engine ends in "datasets eval" — keypoint OKS-AP / box AP
    [/ mask AP when MASK_ON], SURVEY §3.2 — scoring the detector before
    tracking can mask a regression)."""
    from ..tracking.evaluation import evaluate_detections
    det_metrics = evaluate_detections(dets, ds, mask_on=cfg.MODEL.MASK_ON)
    logger.info("detection metrics: %s", json.dumps(det_metrics, indent=2))
    with open(os.path.join(cfg.OUTPUT_DIR,
                           "detection_metrics.json"), "w") as f:
        json.dump(det_metrics, f, indent=2)
    return det_metrics


def _finish_tracking(args, cfg, tracked, logger):
    """Shared tail of track/stream modes: write PoseTrack-format results,
    optional visualization, evaluate when GT is available."""
    from ..tracking.engine import evaluate_tracking, write_posetrack_results
    from ..tracking.evaluation import PoseAnnotation

    out_dir = os.path.join(cfg.OUTPUT_DIR, "tracks")
    paths = write_posetrack_results(tracked, out_dir)
    logger.info("wrote %d track files to %s", len(paths), out_dir)

    if args.vis:
        _write_vis(cfg, tracked, logger)

    # Evaluate when GT is available.
    try:
        ds = _dataset(cfg, cfg.TEST.DATASETS or cfg.TRAIN.DATASETS)
    except (SystemExit, FileNotFoundError, KeyError):
        ds = None
    if ds is not None:
        gt = {}
        for vid in ds.videos():
            frames = []
            for fr in ds.video_frames(vid):
                frames.append([
                    PoseAnnotation(
                        keypoints=p["keypoints"], box=p["box"],
                        head_box=p["head_box"], track_id=p["track_id"])
                    for p in ds.gt_poses(fr)])
            gt[vid] = frames
        metrics = evaluate_tracking(tracked, gt,
                                    cfg.KRCNN.NUM_KEYPOINTS)
        summary = {k: v for k, v in metrics.items()
                   if not isinstance(v, list)}
        logger.info("tracking metrics: %s", json.dumps(summary, indent=2))
        with open(os.path.join(cfg.OUTPUT_DIR, "track_metrics.json"),
                  "w") as f:
            json.dump(metrics, f, indent=2)
    return out_dir


def mode_track(args, cfg):
    from ..tracking.engine import run_posetrack_tracking
    from ..utils.logging_utils import setup_logging

    logger = setup_logging()
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    det_path = args.detections or os.path.join(cfg.OUTPUT_DIR,
                                               "detections.pkl")
    with open(det_path, "rb") as f:
        dets = pickle.load(f)
    tracked = run_posetrack_tracking(dets, cfg=cfg)
    return _finish_tracking(args, cfg, tracked, logger)


def mode_eval(args, cfg):
    """Score saved PoseTrack-annolist track files against GT without
    re-running detection or tracking (the reference ecosystem's external
    `poseval` scorer role — also accepts third-party predictions)."""
    from ..tracking.engine import evaluate_tracking, read_posetrack_results
    from ..tracking.evaluation import PoseAnnotation
    from ..utils.logging_utils import setup_logging

    logger = setup_logging()
    tracks_dir = args.detections or os.path.join(cfg.OUTPUT_DIR, "tracks")
    tracked = read_posetrack_results(tracks_dir)
    ds = _dataset(cfg, cfg.TEST.DATASETS or cfg.TRAIN.DATASETS)
    gt = {}
    for vid in ds.videos():
        frames = []
        for fr in ds.video_frames(vid):
            frames.append([
                PoseAnnotation(
                    keypoints=p["keypoints"], box=p["box"],
                    head_box=p["head_box"], track_id=p["track_id"])
                for p in ds.gt_poses(fr)])
        # File stems are the writer's sanitized video ids.
        gt[vid.replace("/", "_")] = frames
    metrics = evaluate_tracking(tracked, gt, cfg.KRCNN.NUM_KEYPOINTS)
    summary = {k: v for k, v in metrics.items()
               if not isinstance(v, list)}
    logger.info("eval metrics: %s", json.dumps(summary, indent=2))
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    with open(os.path.join(cfg.OUTPUT_DIR, "eval_metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    return metrics


def mode_stream(args, cfg):
    """Online detect→track in ONE pass (BASELINE config 5 streaming).

    The detector streams clips through the shape buckets; every consumed
    batch's detections are fed straight from the device buffers to the
    per-video Hungarian trackers while the chip works on the next batch —
    no detections.pkl intermediary (parity: the reference's two-stage
    test_engine→tracking_engine pipeline collapsed into one online pass;
    results are identical to test+track, asserted in tests/test_stream.py).
    """
    import jax
    from ..engine.inference import run_inference
    from ..parallel.mesh import make_mesh
    from ..tracking.engine import StreamingTrackingSink
    from ..utils.logging_utils import setup_logging

    logger = setup_logging()
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    ds = _dataset(cfg, cfg.TEST.DATASETS or cfg.TRAIN.DATASETS)
    model, params = _init_model(cfg, args.weights or cfg.TEST.WEIGHTS
                                or None, cfg.RNG_SEED)
    mesh = make_mesh() if jax.device_count() > 1 else None
    vrange = None
    if args.video_range:
        lo, hi = args.video_range.split(":")
        vrange = (int(lo), int(hi))
    sink = StreamingTrackingSink(cfg=cfg)
    t0 = time.time()
    dets = run_inference(cfg, model, params, ds, max_clips=args.max_clips,
                         mesh=mesh, video_range=vrange, frame_sink=sink)
    tracked = sink.results()
    dt = time.time() - t0
    n_frames = sum(len(v) for v in tracked.values())
    logger.info("streamed detect+track over %d frames in %.1fs (%.2f fps)",
                n_frames, dt, n_frames / max(dt, 1e-9))
    if args.det_out:                      # optional detections artifact
        with open(args.det_out, "wb") as f:
            pickle.dump(dets, f)
        logger.info("wrote %s", args.det_out)
    return _finish_tracking(args, cfg, tracked, logger)


def _write_vis(cfg, tracked, logger):
    """Draw tracked detections over the source frames (parity: utils/vis)."""
    import cv2
    from ..utils.vis import draw_detections
    try:
        ds = _dataset(cfg, cfg.TEST.DATASETS or cfg.TRAIN.DATASETS)
    except (SystemExit, FileNotFoundError, KeyError):
        logger.warning("--vis: no dataset available for source frames")
        return
    vis_dir = os.path.join(cfg.OUTPUT_DIR, "vis")
    os.makedirs(vis_dir, exist_ok=True)
    n_written = 0
    for vid, frames in tracked.items():
        recs = ds.video_frames(vid)
        for fi, fr in enumerate(frames):
            if fi >= len(recs):
                break
            img = cv2.imread(ds.image_path(recs[fi]))
            if img is None:
                continue
            img = draw_detections(
                img, fr["boxes"], fr["scores"],
                keypoints=fr.get("keypoints"),
                track_ids=fr["track_ids"],
                valid=fr["track_ids"] >= 0)
            out = os.path.join(vis_dir, f"{vid.replace('/', '_')}_"
                               f"{fi:06d}.jpg")
            cv2.imwrite(out, img)
            n_written += 1
    logger.info("--vis: wrote %d annotated frames to %s", n_written, vis_dir)


def mode_demo_data(args, cfg):
    from ..data.synthetic import generate_synthetic_posetrack
    out = args.out or os.path.join(cfg.DATA.ROOT, "synthetic")
    json_path = generate_synthetic_posetrack(
        out, num_videos=4, frames_per_video=16, people_per_video=2)
    generate_synthetic_posetrack(
        out, num_videos=2, frames_per_video=16, people_per_video=2,
        seed=1, json_name="val.json")
    # Hard variant (separate dirs; see the catalog in data/posetrack.py).
    hard_out = out.rstrip("/") + "_hard"
    generate_synthetic_posetrack(
        hard_out, num_videos=4, frames_per_video=16, seed=0, hard=True)
    generate_synthetic_posetrack(
        hard_out, num_videos=2, frames_per_video=16, seed=1, hard=True,
        json_name="val.json")
    print(f"synthetic dataset written: {json_path} (+val, +hard train/val)")
    return json_path


def mode_import_weights(args, cfg):
    """Detectron .pkl → npz for --weights (reference weight-loading parity:
    utils/net.initialize_gpu_from_weights_file incl. 2D→3D inflation and
    COCO→PoseTrack head surgery; SURVEY §3.4)."""
    from ..utils.checkpoint import save_weights_npz
    from ..utils.detectron_import import import_detectron_weights
    from ..utils.logging_utils import setup_logging

    logger = setup_logging()
    if not args.weights:
        raise SystemExit("--weights <detectron.pkl> required")
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    model, params = _init_model(cfg, None, cfg.RNG_SEED)
    imported, report = import_detectron_weights(args.weights, params, cfg)
    out = os.path.join(cfg.OUTPUT_DIR, "imported_weights.npz")
    save_weights_npz(out, imported)
    logger.info("mapped %d params (%d surgeries); %d unmatched; "
                "%d source blobs unused", len(report["mapped"]),
                len(report["surgery"]), len(report["missing"]),
                len(report["unused"]))
    for line in report["surgery"]:
        logger.info("surgery: %s", line)
    for line in report["missing"]:
        logger.warning("fresh init kept: %s", line)
    logger.info("wrote %s — pass it via --weights", out)
    return out


def mode_bench(args, cfg):
    import subprocess
    r = subprocess.run([sys.executable,
                        os.path.join(os.path.dirname(os.path.dirname(
                            os.path.dirname(os.path.abspath(__file__)))),
                            "bench.py")])
    return r.returncode


def main(argv=None):
    args = parse_args(argv)
    if args.platform:
        # Must land before the backend initializes; jax.config (not the
        # env var) because a site-installed platform plugin can override
        # JAX_PLATFORMS (observed with the axon TPU tunnel).
        import jax
        jax.config.update("jax_platforms", args.platform)
    # Multi-host bring-up must precede any jax backend use (no-op unless
    # the JAX_COORDINATOR_ADDRESS / DAT_DISTRIBUTED env contract asks).
    from ..parallel.mesh import maybe_init_distributed
    maybe_init_distributed()
    from ..core.config import Config
    cfg = _load_cfg(args) if args.cfg else __import__(
        "detectandtrack_tpu.core.config", fromlist=["Config"]).Config()
    if args.mode == "train":
        return mode_train(args, cfg)
    if args.mode == "test":
        return mode_test(args, cfg)
    if args.mode == "track":
        return mode_track(args, cfg)
    if args.mode == "stream":
        return mode_stream(args, cfg)
    if args.mode == "eval":
        return mode_eval(args, cfg)
    if args.mode == "demo-data":
        return mode_demo_data(args, cfg)
    if args.mode == "import-weights":
        return mode_import_weights(args, cfg)
    if args.mode == "bench":
        return mode_bench(args, cfg)


if __name__ == "__main__":
    main()
