import numpy as np

from detectandtrack_tpu.tracking.evaluation import (
    PoseAnnotation,
    PosetrackEvaluator,
    eval_keypoint_ap_oks,
)

K = 15


def _pose(offset=0.0, score=1.0, track_id=-1, vis=1):
    kps = np.zeros((K, 3))
    kps[:, 0] = np.arange(K) * 5 + offset
    kps[:, 1] = 10 + offset
    kps[:, 2] = vis if vis else 0
    return PoseAnnotation(keypoints=kps, box=np.array([0, 0, 80, 30]),
                          head_box=np.array([0, 0, 10, 10]),
                          track_id=track_id, score=score)


def test_perfect_predictions_give_100():
    ev = PosetrackEvaluator(K)
    ev.start_video()
    for _ in range(5):
        ev.add_frame([_pose(track_id=0)], [_pose(track_id=0, score=0.9)])
    s = ev.summarize()
    assert s["mAP"] == 100.0
    assert s["MOTA"] == 100.0
    assert s["id_switches"] == 0


def test_missed_frames_hurt_mota():
    ev = PosetrackEvaluator(K)
    ev.start_video()
    ev.add_frame([_pose(track_id=0)], [_pose(track_id=0, score=0.9)])
    ev.add_frame([_pose(track_id=0)], [])            # all joints missed
    s = ev.summarize()
    assert s["fn"] == K
    assert abs(s["MOTA"] - 50.0) < 1e-6              # 1 - K/(2K)


def test_false_positives_hurt():
    ev = PosetrackEvaluator(K)
    ev.start_video()
    ev.add_frame([_pose(track_id=0)],
                 [_pose(track_id=0, score=0.9),
                  _pose(offset=500, track_id=5, score=0.8)])
    s = ev.summarize()
    assert s["fp"] == K
    assert s["MOTA"] == 0.0                          # 1 - K/K


def test_id_switch_detected():
    ev = PosetrackEvaluator(K)
    ev.start_video()
    ev.add_frame([_pose(track_id=0)], [_pose(track_id=10, score=0.9)])
    ev.add_frame([_pose(track_id=0)], [_pose(track_id=11, score=0.9)])
    ev.add_frame([_pose(track_id=0)], [_pose(track_id=11, score=0.9)])
    s = ev.summarize()
    assert s["id_switches"] == K                     # one switch × K joints


def test_far_predictions_zero_ap():
    ev = PosetrackEvaluator(K)
    ev.start_video()
    ev.add_frame([_pose()], [_pose(offset=500, score=0.9)])
    s = ev.summarize()
    assert s["mAP"] == 0.0


def test_score_ranking_matters_for_ap():
    """A high-scored FP above all TPs caps precision below 1."""
    ev_good, ev_bad = PosetrackEvaluator(K), PosetrackEvaluator(K)
    for ev, fp_score in ((ev_good, 0.1), (ev_bad, 0.99)):
        ev.start_video()
        ev.add_frame([_pose()], [_pose(score=0.9)])
        ev.add_frame([], [_pose(offset=500, score=fp_score)])
    assert ev_good.summarize()["mAP"] > ev_bad.summarize()["mAP"]


def test_oks_ap_perfect_and_shifted():
    gts = {"im1": [_pose()], "im2": [_pose()]}
    perfect = {"im1": [_pose(score=0.9)], "im2": [_pose(score=0.8)]}
    res = eval_keypoint_ap_oks(perfect, gts)
    assert res["AP"] > 99.0
    far = {"im1": [_pose(offset=500, score=0.9)],
           "im2": [_pose(offset=500, score=0.8)]}
    res2 = eval_keypoint_ap_oks(far, gts)
    assert res2["AP"] < 1.0


def test_box_ap_perfect_and_misses():
    from detectandtrack_tpu.tracking.evaluation import eval_box_ap
    b = lambda *xs: np.array(xs, np.float64)
    gts = {"im0": [b(0, 0, 10, 10), b(50, 50, 70, 70)]}
    # Perfect detections.
    preds = {"im0": [(b(0, 0, 10, 10), 0.9), (b(50, 50, 70, 70), 0.8)]}
    m = eval_box_ap(preds, gts)
    assert m["AP"] == 100.0 and m["AP50"] == 100.0
    # One perfect + one miss (no overlap): recall caps at 0.5.
    preds = {"im0": [(b(0, 0, 10, 10), 0.9), (b(200, 200, 220, 220), 0.8)]}
    m = eval_box_ap(preds, gts)
    assert m["AP50"] < 100.0
    assert m["AP50"] >= 50.0


def test_box_ap_iou_threshold_ladder():
    """A loose box passes AP50 but fails AP75."""
    from detectandtrack_tpu.tracking.evaluation import eval_box_ap
    gt = np.array([0, 0, 99, 99], np.float64)
    loose = np.array([0, 0, 69, 99], np.float64)   # IoU = 0.7
    m = eval_box_ap({"im0": [(loose, 0.9)]}, {"im0": [gt]})
    assert m["AP50"] == 100.0
    assert m["AP75"] == 0.0


def test_box_ap_duplicate_detection_is_fp():
    from detectandtrack_tpu.tracking.evaluation import eval_box_ap
    gt = np.array([0, 0, 10, 10], np.float64)
    preds = {"im0": [(gt.copy(), 0.9), (gt.copy(), 0.8)]}
    m = eval_box_ap(preds, {"im0": [gt]})
    # Second (greedy-unmatched) duplicate is a FP at full recall →
    # precision drops after recall 1.0, AP stays 100 (all-point at max
    # precision per recall).
    assert m["AP50"] == 100.0
    # But with the duplicate scored HIGHER, precision at recall 1 is 0.5...
    preds = {"im0": [(np.array([100, 100, 110, 110.0]), 0.95),
                     (gt.copy(), 0.8)]}
    m = eval_box_ap(preds, {"im0": [gt]})
    assert m["AP50"] == 50.0


def test_box_ap_truncated_recall_not_inflated():
    """ADVICE r2 (high): recall thresholds above max achieved recall must
    contribute precision 0 (pycocotools), not the last achieved precision.

    1 perfect pred vs 2 GTs: recall caps at 0.5 with precision 1 →
    101-point AP = 51/101 ~= 50.5, NOT 100."""
    from detectandtrack_tpu.tracking.evaluation import eval_box_ap
    b = lambda *xs: np.array(xs, np.float64)
    gts = {"im0": [b(0, 0, 10, 10), b(50, 50, 70, 70)]}
    preds = {"im0": [(b(0, 0, 10, 10), 0.9)]}
    m = eval_box_ap(preds, gts)
    assert abs(m["AP50"] - 100.0 * 51 / 101) < 1e-6


def test_oks_ap_truncated_recall_not_inflated():
    """Same sentinel rule for the OKS keypoint AP path."""
    gts = {"im1": [_pose(), _pose(offset=300)]}
    preds = {"im1": [_pose(score=0.9)]}
    res = eval_keypoint_ap_oks(preds, gts)
    assert abs(res["AP50"] - 100.0 * 51 / 101) < 1e-6
