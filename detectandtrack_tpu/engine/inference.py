"""Inference engine: jitted clip detection + dataset-scale orchestration.

Reference parity: `lib/core/test.py` (`im_detect_all`: bbox pass → NMS →
keypoint pass → decode) and `lib/core/test_engine.py` (`run_inference`:
iterate the dataset, accumulate, hand to evaluation/tracking)
(SURVEY.md §3.2). The reference crosses host↔device twice per clip with host
NMS in between; here `detect_clip` is ONE jitted XLA call returning padded
(boxes, scores, keypoints, valid), and the runner overlaps host work with
device compute via jax's async dispatch (dispatch batch i+1 before reading
batch i).

The reference's multi-GPU sharding (one subprocess per GPU over roidb
ranges) maps to sharding the clip list across jax processes/devices — on a
single chip the runner is sequential with double-buffered input.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import Config
from ..data.pipeline import ClipSpec, load_clip
from ..data.posetrack import PosetrackDataset
from ..models.detector import GeneralizedRCNN


def make_detect_fn(model: GeneralizedRCNN, mesh=None,
                   flip_tta: bool = False, with_proposals: bool = False):
    """Jitted `detect(params, clips) → {boxes, scores, valid, keypoints}`.

    With a mesh, the clip batch (dim 0) is sharded across the devices and
    params are replicated — the TPU-native form of the reference's
    one-subprocess-per-GPU `multi_gpu_test_net_on_dataset` (SURVEY §3.2):
    no process boundary, no pickle merge; XLA partitions the one program.

    `flip_tta` switches to the detector's in-graph flip-TTA method (box
    union + heatmap-level averaging — the reference's BBOX_AUG/KPS_AUG
    'hm_avg' semantics) in the SAME single dispatch.

    `with_proposals` builds `detect(params, clips, tubes, tubes_valid)`
    on the RPN-skipped precomputed-proposals path instead (the lineage's
    TEST.PROPOSAL_FILES / Fast-R-CNN-style inference); mutually exclusive
    with `flip_tta` (rejected at config validation).
    """

    def detect(params, clips, tubes=None, tubes_valid=None):
        if with_proposals:
            out = model.apply(
                params, clips, tubes, False, tubes_valid,
                method=GeneralizedRCNN.detect_with_proposals)
        elif flip_tta:
            out = model.apply(params, clips,
                              method=GeneralizedRCNN.detect_tta)
        else:
            out = model.apply(params, clips)
        keep = {"boxes": out["boxes"], "scores": out["scores"],
                "valid": out["valid"], "features": out["features"]}
        if "keypoints" in out:
            keep["keypoints"] = out["keypoints"]
        if "masks" in out:
            # Device-side class select + sigmoid: the detector only emits
            # person detections, so keep that channel's probabilities
            # (last channel; C=1 for class-agnostic heads) — cuts the
            # host transfer by C× (parity: im_detect_mask returns the
            # per-class sigmoid, segm_results keeps the detection's class).
            keep["masks"] = jax.nn.sigmoid(out["masks"][..., -1])
        return keep

    if mesh is None:
        return jax.jit(detect)
    from ..parallel.mesh import batch_sharded, replicated
    bsh = batch_sharded(mesh)
    in_sh = ((replicated(mesh), bsh, bsh, bsh) if with_proposals
             else (replicated(mesh), bsh))
    return jax.jit(detect, in_shardings=in_sh, out_shardings=bsh)


def make_kps_aug_fns(model: GeneralizedRCNN, flip: bool, mesh=None):
    """Jitted pair for the KPS_AUG multi-scale second phase.

    Parity: `im_detect_keypoints_aug` — the reference re-runs the body +
    keypoint head per augmentation ON THE FINAL boxes and averages
    heatmaps ('hm_avg') before a single decode. `hm_fn(params, clips,
    boxes_scaled)` is one scale pass (flip pair folded in-graph when
    `flip`); `decode_fn(params, hms (S, B, M, Tk, hs, hs, K),
    boxes_original)` averages across the S scale passes device-side and
    decodes once — heatmaps never cross the host link.

    With a mesh, both phases shard the CLIP-BATCH dim over the devices
    (dim 0 of clips/boxes; dim 1 of the scale-stacked heatmaps) — the
    phase-2 batches are padded to `batch_size` by the runner, so the
    shard shapes stay static.
    """

    def hm(params, clips, boxes):
        return model.apply(params, clips, boxes, flip,
                           method=GeneralizedRCNN.keypoint_heatmaps_for_boxes)

    def decode(params, hms, boxes):
        return model.apply(params, jnp.mean(hms, axis=0), boxes,
                           method=GeneralizedRCNN.decode_keypoints_from_heatmaps)

    if mesh is None:
        return jax.jit(hm), jax.jit(decode)
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..parallel.mesh import DATA_AXIS, batch_sharded, replicated
    repl, bsh = replicated(mesh), batch_sharded(mesh)
    hms_sh = NamedSharding(mesh, P(None, DATA_AXIS))   # (S, B, ...)
    return (jax.jit(hm, in_shardings=(repl, bsh, bsh), out_shardings=bsh),
            jax.jit(decode, in_shardings=(repl, hms_sh, bsh),
                    out_shardings=bsh))


def window_proposals(db: Dict, dataset: PosetrackDataset, vid: str,
                     start: int, t: int, stride: int, kp: int
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Assemble one clip window's proposal tubes from a proposal-file dict
    `{video_id: {frame_idx: (K_i, 4) boxes}}` (original image coords).

    Row k across the window's frames is tube k (the proposal-file
    contract; trivially true for T=1). Frames past the video end clamp to
    the last frame, mirroring `clip_records`. Returns
    ((kp, 4·t) float32 tubes, (kp,) bool valid): rows are truncated to
    the window's common row count and padded to `kp` as invalid.
    """
    n = len(dataset.video_frames(vid))
    vid_db = db.get(vid, {})
    per = []
    for i in range(t):
        idx = min(start + i * stride, n - 1)
        boxes = np.asarray(vid_db.get(idx, np.zeros((0, 4))), np.float32)
        per.append(boxes.reshape(-1, 4))
    k_eff = min(kp, min(len(b) for b in per))
    tubes = np.zeros((kp, 4 * t), np.float32)
    for i in range(t):
        tubes[:k_eff, 4 * i:4 * i + 4] = per[i][:k_eff]
    valid = np.arange(kp) < k_eff
    return tubes, valid


def clip_slice(det: Dict[str, np.ndarray], i: int) -> Dict[str, np.ndarray]:
    """Batched padded outputs → one clip's dict."""
    out = {"boxes": np.asarray(det["boxes"][i], np.float64),
           "scores": np.asarray(det["scores"][i], np.float64),
           "valid": np.asarray(det["valid"][i], bool)}
    if "keypoints" in det and det["keypoints"] is not None:
        out["keypoints"] = np.asarray(det["keypoints"][i], np.float64)
    if "features" in det and det["features"] is not None:
        out["features"] = np.asarray(det["features"][i], np.float32)
    if "masks" in det and det["masks"] is not None:
        out["masks"] = np.asarray(det["masks"][i], np.float32)
    return out


def detections_to_frames(
    det: Dict[str, np.ndarray],
    num_frames: int,
    scale: float,
) -> List[Dict[str, np.ndarray]]:
    """One clip's padded outputs (already sliced) → per-frame host dicts in
    ORIGINAL image coordinates (parity: the rescale in im_detect_bbox)."""
    boxes = np.asarray(det["boxes"], np.float64)             # (D, 4T)
    scores = np.asarray(det["scores"], np.float64)
    valid = np.asarray(det["valid"], bool)
    kps = (np.asarray(det["keypoints"], np.float64)
           if "keypoints" in det else None)                  # (D, T, K, 4)
    d = boxes.shape[0]
    per_frame = boxes.reshape(d, num_frames, 4) / scale
    frames = []
    for t in range(num_frames):
        fr = {
            "boxes": per_frame[:, t],
            "scores": scores,
            "valid": valid,
        }
        if kps is not None:
            k = kps[:, t].copy()
            k[..., :2] /= scale
            # [x, y, logit, prob] → keep [x, y, prob] as keypoint triple
            fr["keypoints"] = np.stack(
                [k[..., 0], k[..., 1], k[..., 3]], axis=-1)
        if "features" in det:
            # Appearance feature is per tube → shared across its frames.
            fr["features"] = np.asarray(det["features"], np.float32)
        if "masks" in det:
            # (D, S, S) RoI-frame sigmoid probs for this frame; paste into
            # the image with ops.masks.paste_mask (masks are RoI-relative,
            # so the coordinate rescale does not touch them).
            fr["masks"] = np.asarray(det["masks"][:, t], np.float32)
        frames.append(fr)
    return frames


def run_inference(
    cfg: Config,
    model: GeneralizedRCNN,
    params,
    dataset: PosetrackDataset,
    batch_size: Optional[int] = None,
    max_clips: Optional[int] = None,
    mesh=None,
    video_range: Optional[Tuple[int, int]] = None,
    frame_sink=None,
    dispatch_log: Optional[Dict] = None,
) -> Dict[str, List[Dict[str, np.ndarray]]]:
    """Detect over the whole dataset → per-video per-frame detections.

    Clips tile each video (non-overlapping windows) so every frame is
    covered exactly once; the tail of a video shorter than T is covered by
    a final window aligned to the video end, and videos shorter than the
    clip span get one last-frame-padded window.

    With a mesh, each batch is dim-0-sharded over the local devices
    (batch_size defaults to the device count) — the in-process form of the
    reference's subprocess-per-GPU inference sharding;
    `utils/subprocess_utils.py` remains as the cross-process fallback.

    `frame_sink(vid, ordinal, total, frame_dict)` — when given, every
    finished frame is ALSO streamed to the sink as soon as its batch is
    consumed from the device, while the next batch is in flight (config 5
    online mode; see `tracking.engine.StreamingTrackingSink`). A frame
    covered by two windows (the end-aligned tail overlap) is sunk only
    from its final writer, so sink contents == the returned dict.

    `dispatch_log` — when given (a dict), records `(vid, frame_idx) →
    time.perf_counter()` at the moment the frame's detection batch is
    DISPATCHED to the device (async — the call returns before the chip
    finishes). A frame written by two windows keeps its final writer's
    dispatch time, matching the sink's emit source. bench.py's stream mode
    pairs this with a timestamping sink wrapper to measure per-frame
    dispatch→tracked-out latency (the online mode's figure of merit).
    """
    from ..data.pipeline import choose_scale, pick_bucket

    if batch_size is None:
        batch_size = mesh.devices.size if mesh is not None else 1
    if mesh is not None:
        from ..parallel.mesh import replicate
        params = replicate(mesh, params)
    t = cfg.VIDEO.NUM_FRAMES if cfg.VIDEO.VIDEO_ON else 1
    stride = cfg.VIDEO.FRAME_STRIDE if cfg.VIDEO.VIDEO_ON else 1
    use_flip_aug = cfg.TEST.BBOX_AUG_ENABLED or cfg.TEST.KPS_AUG_ENABLED
    # Precomputed-proposal inference (lineage TEST.PROPOSAL_FILES): load
    # the file for this dataset and run the RPN-skipped path. Config
    # validation rejects the TTA combination, so n_passes == 1 here.
    proposal_db = None
    if cfg.TEST.PROPOSAL_FILES:
        import pickle
        with open(cfg.TEST.PROPOSAL_FILES[0], "rb") as f:
            proposal_db = pickle.load(f)
    # One program per bucket; flip TTA runs inside that same program.
    detect = make_detect_fn(model, mesh, flip_tta=use_flip_aug,
                            with_proposals=proposal_db is not None)
    buckets = [tuple(b) for b in cfg.TEST.SHAPE_BUCKETS]
    # Multi-scale TTA (BBOX_AUG_SCALES): every clip runs once per scale;
    # passes are merged (union + NMS) in original-image coordinates.
    aug_scales = (list(cfg.TEST.BBOX_AUG_SCALES)
                  if cfg.TEST.BBOX_AUG_ENABLED else [])
    scale_targets = [cfg.TEST.SCALE] + aug_scales
    n_passes = len(scale_targets)
    # Multi-scale KPS_AUG second phase (reference im_detect_keypoints_aug):
    # after the box-level merge, re-run the keypoint head per scale ON THE
    # MERGED boxes and average heatmaps device-side before one decode.
    kps_aug = (cfg.TEST.KPS_AUG_ENABLED and n_passes > 1
               and cfg.MODEL.KEYPOINTS_ON)
    if kps_aug:
        kps_hm_fn, kps_decode_fn = make_kps_aug_fns(model, use_flip_aug,
                                                    mesh)

    # Build the tiling window list (with end-aligned tails). `video_range`
    # restricts to a contiguous video slice — the unit of the reference's
    # per-GPU subprocess sharding (ranges are disjoint, merging is a dict
    # union; see utils/subprocess_utils + cli mode_test --subprocess-shards).
    work: List[Tuple[str, int]] = []
    span = (t - 1) * stride + 1
    video_list = dataset.videos()
    if video_range is not None:
        video_list = video_list[video_range[0]:video_range[1]]
    for vid in video_list:
        n = len(dataset.video_frames(vid))
        if n < span:
            # Short video: one window padded by repeating the last frame
            # (clip_records clamps); padded frames are dropped on consume so
            # every real frame is still evaluated (reference processes all
            # frames — round-1 silently skipped these videos).
            work.append((vid, 0))
            continue
        starts = list(range(0, n - span + 1, span))
        if starts[-1] + span < n:
            starts.append(n - span)
        for s in starts:
            work.append((vid, s))
    if max_clips is not None:
        work = work[:max_clips]

    # Streaming bookkeeping: which window is the FINAL writer of each frame
    # (end-aligned tail windows overlap their predecessor), and each
    # frame's ordinal in the video's sorted emit order.
    winner: Dict[Tuple[str, int], int] = {}
    ordinals: Dict[str, Dict[int, int]] = {}
    if frame_sink is not None:
        emitted: Dict[str, set] = {}
        for vid, start in work:
            n_vid = len(dataset.video_frames(vid))
            for fi in range(t):
                idx = start + fi * stride
                if idx < n_vid:
                    winner[(vid, idx)] = start
                    emitted.setdefault(vid, set()).add(idx)
        ordinals = {vid: {idx: i for i, idx in enumerate(sorted(s))}
                    for vid, s in emitted.items()}

    results: Dict[str, Dict[int, Dict[str, np.ndarray]]] = {}
    acc: Dict[Tuple[str, int], List[Dict[str, np.ndarray]]] = {}

    pending = []    # (device outputs, metas, bucket)

    def emit(vid, start, single):
        # `single` is in ORIGINAL image coordinates already.
        frames = detections_to_frames(single, t, 1.0)
        slot = results.setdefault(vid, {})
        n_vid = len(dataset.video_frames(vid))
        for fi, fr in enumerate(frames):
            idx = start + fi * stride
            if idx < n_vid:                       # drop padded tail frames
                slot[idx] = fr
                if frame_sink is not None and winner[(vid, idx)] == start:
                    frame_sink(vid, ordinals[vid][idx],
                               len(ordinals[vid]), fr)

    # Phase-2 (KPS_AUG) machinery: merged clips queue per bucket-tuple so
    # every batch stacks one static shape per scale pass; heatmaps stay
    # device-resident across the S passes and the averaged decode — only
    # the small decoded keypoints cross the host link.
    p2_queues: Dict[Tuple, List] = {}
    p2_pending: List = []

    def p2_consume(entry):
        kps, entries = entry
        kps = np.asarray(kps)
        for i, (vid, start, merged, _) in enumerate(entries):
            merged["keypoints"] = np.asarray(kps[i], np.float64)
            emit(vid, start, merged)

    def p2_submit(key):
        entries = p2_queues.pop(key, [])
        if not entries:
            return
        full = list(entries)
        while len(full) < batch_size:   # pad the tail batch by repetition
            full.append(full[-1])
        boxes_orig = np.stack([e[2]["boxes"] for e in full]).astype(
            np.float32)                                     # (B, D, 4T)
        hms = []
        for j in range(n_passes):
            # Reload the scaled clip pixels here instead of pinning them
            # from phase 1 — retaining every in-flight window's padded
            # clip per scale pass costs ~100 MB each at the eval bucket
            # and spikes host RSS by GBs; a deterministic re-decode per
            # pass is the cheaper resource.
            clips_j = jnp.asarray(np.stack([
                load_clip(dataset, ClipSpec(e[0], e[1]), t, stride,
                          cfg.DATA.PIXEL_MEANS, cfg.DATA.PIXEL_STDS,
                          e[3][j][0], cfg.TEST.MAX_SIZE,
                          bucket_hw=e[3][j][2], max_gt=1,
                          num_keypoints=cfg.KRCNN.NUM_KEYPOINTS)["clips"]
                for e in full]))
            scales_j = np.asarray([e[3][j][1] for e in full], np.float32)
            boxes_j = jnp.asarray(boxes_orig * scales_j[:, None, None])
            hms.append(kps_hm_fn(params, clips_j, boxes_j))
        kps = kps_decode_fn(params, jnp.stack(hms),
                            jnp.asarray(boxes_orig))
        p2_pending.append((kps, entries))
        if len(p2_pending) >= 2:
            for e in p2_pending[:-1]:
                p2_consume(e)
            del p2_pending[:-1]

    def consume(entry):
        from .augment import (merge_multiscale_detections,
                              rescale_detections)
        det, metas, bucket = entry
        det = jax.tree.map(np.asarray, det)
        for bi, meta in enumerate(metas):
            vid, start, scale = meta[:3]
            single = clip_slice(det, bi)
            single = rescale_detections(single, scale)
            if n_passes == 1:
                emit(vid, start, single)
                continue
            if kps_aug:
                single["_pass"] = (meta[3], scale, bucket)
            passes = acc.setdefault((vid, start), [])
            passes.append(single)
            if len(passes) == n_passes:
                merged = merge_multiscale_detections(
                    passes, t, cfg.TEST.NMS)
                if not kps_aug:
                    emit(vid, start, merged)
                else:
                    # Canonical pass order (by bucket, then scale) so the
                    # per-scale stacks share static shapes batch-wide.
                    p2p = sorted((p["_pass"] for p in passes),
                                 key=lambda x: (x[2], x[1]))
                    key = tuple(x[2] for x in p2p)
                    q = p2_queues.setdefault(key, [])
                    q.append((vid, start, merged, p2p))
                    if len(q) == batch_size:
                        p2_submit(key)
                del acc[(vid, start)]

    def flush():
        for entry in pending:
            consume(entry)
        pending.clear()
        if kps_aug:
            for key in list(p2_queues):
                p2_submit(key)
            for e in p2_pending:
                p2_consume(e)
            del p2_pending[:]

    # Per-bucket batch queues: clips land in the smallest bucket that fits
    # their scaled shape (config 5 streaming); each bucket shape compiles
    # once and is reused.
    queues: Dict[Tuple[int, int], List] = {b: [] for b in buckets}

    def submit(bucket):
        items = queues[bucket]
        if not items:
            return
        # Pad the final partial batch by repeating the last clip.
        full = list(items)
        while len(full) < batch_size:
            full.append(full[-1])
        clips = jnp.asarray(np.stack([it[2]["clips"] for it in full]))
        if proposal_db is not None:
            # Proposal files are in original image coords; the model runs
            # in bucket coords, so scale each clip's tubes by its scale.
            tubes = jnp.asarray(np.stack(
                [it[2]["tubes"] * np.float32(it[2]["scale"])
                 for it in full]))
            tvalid = jnp.asarray(np.stack(
                [it[2]["tubes_valid"] for it in full]))
            det = detect(params, clips, tubes, tvalid)
        else:
            det = detect(params, clips)
        if dispatch_log is not None:
            import time
            now = time.perf_counter()
            for vid_, start_, _ in items:
                nv = len(dataset.video_frames(vid_))
                for fi in range(t):
                    idx = start_ + fi * stride
                    if idx < nv:      # later (tail) windows overwrite
                        dispatch_log[(vid_, idx)] = now
        # Phase 2 re-runs the body per scale on the merged boxes; the
        # meta carries the scale TARGET so the clip can be re-decoded
        # deterministically at phase-2 submit (pixels are not pinned).
        metas = [(vid, start, float(it["scale"]),
                  it.get("target") if kps_aug else None)
                 for (vid, start, it) in items]
        pending.append((det, metas, bucket))
        if len(pending) >= 2:          # double-buffer: read the older one
            for entry in pending[:-1]:
                consume(entry)
            del pending[:-1]
        queues[bucket] = []

    for vid, start in work:
        first = dataset.video_frames(vid)[start]
        for target in scale_targets:
            scale = choose_scale(first.height or 1, first.width or 1,
                                 target, cfg.TEST.MAX_SIZE)
            sh = int(round((first.height or 1) * scale))
            sw = int(round((first.width or 1) * scale))
            bucket = pick_bucket(sh, sw, buckets)
            item = load_clip(
                dataset, ClipSpec(vid, start), t, stride,
                cfg.DATA.PIXEL_MEANS, cfg.DATA.PIXEL_STDS,
                target, cfg.TEST.MAX_SIZE, bucket_hw=bucket,
                max_gt=1, num_keypoints=cfg.KRCNN.NUM_KEYPOINTS)
            item["target"] = target
            if proposal_db is not None:
                item["tubes"], item["tubes_valid"] = window_proposals(
                    proposal_db, dataset, vid, start, t, stride,
                    cfg.RPN.POST_NMS_TOP_N_TEST)
            queues[bucket].append((vid, start, item))
            if len(queues[bucket]) == batch_size:
                submit(bucket)
    for b in buckets:
        submit(b)
    flush()

    # Dict-of-frame-index → ordered list.
    out: Dict[str, List[Dict[str, np.ndarray]]] = {}
    for vid, frames in results.items():
        out[vid] = [frames[k] for k in sorted(frames)]
    return out
