"""One-command real-data parity check against the reference contract.

Pre-staged runner for the moment the driver delivers the reference
`.pkl` weights and PoseTrack val (VERDICT r2 #7 / BASELINE.json: keypoint
mAP and MOTA within 0.1 of the reference on PoseTrack val). It chains:

  1. `--mode import-weights` on the Detectron `.pkl` (2D→3D inflation +
     COCO→PoseTrack head surgery, `utils/detectron_import.py`);
  2. `--mode stream` (one-pass detect→track) on the val annotations;
  3. reads the evaluator's `track_metrics.json` and prints the deltas
     against the expected reference numbers.

Optionally diffs our detections against a reference Detectron
`detections.pkl` (its `all_boxes`/`all_keyps` per-image lists) at the
raw-output level — per-image best-IoU box deltas and keypoint px deltas —
to localize any metric gap to a pipeline stage.

Usage:
  python tools/parity_check.py --pkl /path/model_final.pkl \
      --ann /path/posetrack_val.json --frames /path/images \
      [--cfg configs/video/3d_R50_T8_tubes_kps.yaml] \
      [--target-map 60.6 --target-mota 55.2] \
      [--ref-dets /path/detections.pkl]

Targets default to BASELINE.md's paper-recalled values (provenance [P]:
re-verify against the reference model zoo before treating the ±0.1
contract as anchored to them).
"""
import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pkl", required=True, help="reference model_final.pkl")
    p.add_argument("--ann", required=True, help="PoseTrack val json")
    p.add_argument("--frames", required=True, help="frames root dir")
    p.add_argument("--cfg", default="configs/video/3d_R50_T8_tubes_kps.yaml")
    p.add_argument("--out", default="out/parity")
    p.add_argument("--target-map", type=float, default=60.6)
    p.add_argument("--target-mota", type=float, default=55.2)
    p.add_argument("--tolerance", type=float, default=0.1)
    p.add_argument("--ref-dets", default=None,
                   help="reference detections.pkl for raw-output diffs")
    p.add_argument("--max-clips", type=int, default=None)
    args = p.parse_args()

    from detectandtrack_tpu.cli.launch import main as launch

    os.makedirs(args.out, exist_ok=True)
    # The CLI dataset catalog resolves names under DATA.ROOT; register the
    # delivered annotation file as an ad-hoc dataset by pointing ROOT at
    # its directory and overriding TEST.DATASETS via the catalog-bypassing
    # direct path (PosetrackDataset accepts absolute paths).
    import detectandtrack_tpu.data.posetrack as ptk
    ptk._CATALOG["parity_val"] = (os.path.abspath(args.ann),
                                  os.path.abspath(args.frames))

    npz = launch(["--mode", "import-weights", "--cfg", args.cfg,
                  "--weights", args.pkl, "--out", args.out])

    stream_args = ["--mode", "stream", "--cfg", args.cfg,
                   "--weights", npz, "--out", args.out,
                   "TEST.DATASETS", "[parity_val]"]
    if args.max_clips:
        stream_args += ["--max-clips", str(args.max_clips)]
    if args.ref_dets:
        stream_args += ["--det-out", os.path.join(args.out, "our_dets.pkl")]
    launch(stream_args)

    with open(os.path.join(args.out, "track_metrics.json")) as f:
        metrics = json.load(f)
    m_ap = metrics.get("mAP")
    mota = metrics.get("MOTA")
    d_ap = m_ap - args.target_map
    d_mota = mota - args.target_mota
    ok = abs(d_ap) <= args.tolerance and abs(d_mota) <= args.tolerance
    print(json.dumps({
        "mAP": m_ap, "MOTA": mota,
        "target_mAP": args.target_map, "target_MOTA": args.target_mota,
        "delta_mAP": round(d_ap, 3), "delta_MOTA": round(d_mota, 3),
        "within_tolerance": ok, "tolerance": args.tolerance,
        "targets_provenance": "BASELINE.md [P] paper-recalled — re-verify",
    }, indent=2))

    if args.ref_dets:
        _diff_against_reference(args)
    return 0 if ok else 1


def _diff_against_reference(args):
    """Best-IoU box + keypoint deltas vs a Detectron detections.pkl."""
    import numpy as np

    with open(args.ref_dets, "rb") as f:
        ref = pickle.load(f, encoding="latin1")
    with open(os.path.join(args.out, "our_dets.pkl"), "rb") as f:
        ours = pickle.load(f)
    # Detectron format: all_boxes[cls][image] = (N, 5); all_keyps[cls]
    # [image] = list of (4, K). Flatten our per-video frames in dataset
    # image order to align.
    ref_boxes = ref["all_boxes"][1]
    ref_keyps = ref.get("all_keyps", [None, []])[1]
    flat = []
    for vid in sorted(ours):
        flat.extend(ours[vid])
    n = min(len(flat), len(ref_boxes))
    ious, kp_px = [], []
    for i in range(n):
        rb = np.asarray(ref_boxes[i], np.float64)
        fr = flat[i]
        ob = np.asarray(fr["boxes"], np.float64)
        ov = np.asarray(fr.get("valid", np.ones(len(ob), bool)))
        ob = ob[ov]
        if not len(rb) or not len(ob):
            continue
        for j, r in enumerate(rb):
            iw = (np.minimum(r[2], ob[:, 2]) - np.maximum(r[0], ob[:, 0])
                  + 1).clip(0)
            ih = (np.minimum(r[3], ob[:, 3]) - np.maximum(r[1], ob[:, 1])
                  + 1).clip(0)
            inter = iw * ih
            area = ((r[2] - r[0] + 1) * (r[3] - r[1] + 1)
                    + (ob[:, 2] - ob[:, 0] + 1) * (ob[:, 3] - ob[:, 1] + 1)
                    - inter)
            best = int(np.argmax(inter / np.maximum(area, 1e-9)))
            ious.append(float((inter / np.maximum(area, 1e-9))[best]))
            if ref_keyps and i < len(ref_keyps) and j < len(ref_keyps[i]) \
                    and "keypoints" in fr:
                rk = np.asarray(ref_keyps[i][j], np.float64)   # (4, K)
                okp = np.asarray(fr["keypoints"], np.float64)[ov][best]
                kp_px.append(float(np.mean(np.hypot(
                    okp[:, 0] - rk[0], okp[:, 1] - rk[1]))))
    print(json.dumps({
        "ref_images_compared": n,
        "mean_best_iou": round(float(np.mean(ious)), 4) if ious else None,
        "mean_kp_px_delta": (round(float(np.mean(kp_px)), 3)
                             if kp_px else None),
    }, indent=2))


if __name__ == "__main__":
    sys.exit(main())
