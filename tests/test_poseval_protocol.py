"""PoseTrack evaluation protocol edge cases (poseval parity).

VERDICT r1 #7: the self-contained evaluator must encode the published
PoseTrack counting rules — per-joint PCKh matching, FP/FN/IDSW accounting,
score-ranked AP — as adversarial fixtures. Each test pins one rule:

  headSize = 0.6 · diag(head_box); a joint matches iff dist ≤ 0.5·headSize.
  Pose-level matching is Hungarian on (1 − matched-joint fraction), gated
  at cost < 1. For matched poses: in-threshold visible joints are TPs;
  visible-but-far joints count BOTH as FN and FP (the predicted location is
  wrong somewhere); predictions on invisible GT joints are FPs. Unmatched
  predictions are all-FP; unmatched GT joints are FNs. IDSW is counted per
  visible joint when a GT track's matched predicted id changes, and resets
  between videos. MOTA_j = 1 − (FN+FP+IDSW)/nGT_j (unclamped, can be < 0).
"""

import numpy as np

from detectandtrack_tpu.tracking.evaluation import (PoseAnnotation,
                                                    PosetrackEvaluator)

# head_box (0,0,3,4): diag 5 → headSize 3 → PCKh radius 1.5
HEAD = np.array([0.0, 0.0, 3.0, 4.0])
RADIUS = 1.5


def pose(pts, vis=None, track=0, score=1.0):
    pts = np.asarray(pts, np.float64)
    k = len(pts)
    v = np.ones(k) * 2 if vis is None else np.asarray(vis, np.float64)
    kps = np.concatenate([pts, v[:, None]], axis=1)
    return PoseAnnotation(keypoints=kps, head_box=HEAD.copy(),
                          track_id=track, score=score)


def test_perfect_match_scores_100():
    ev = PosetrackEvaluator(num_joints=2)
    gt = pose([(0, 0), (10, 10)])
    ev.add_frame([gt], [pose([(0, 0), (10, 10)], track=1, score=0.9)])
    m = ev.summarize()
    assert m["mAP"] == 100.0
    assert m["MOTA"] == 100.0
    assert m["fp"] == 0 and m["fn"] == 0 and m["id_switches"] == 0


def test_pckh_radius_boundary():
    """dist == 0.5·headSize matches; anything beyond does not."""
    ev = PosetrackEvaluator(num_joints=2)
    gt = pose([(0, 0), (10, 10)])
    pr = pose([(RADIUS, 0), (10, 10 + RADIUS + 0.01)], track=1)
    ev.add_frame([gt], [pr])
    m = ev.summarize()
    assert m["AP_per_joint"][0] == 100.0
    assert m["AP_per_joint"][1] == 0.0


def test_matched_far_joint_counts_fn_and_fp():
    """poseval: a visible GT joint missed by a matched pose is a FN AND the
    wrong predicted location is a FP (ADVICE r1: MOTA was inflated)."""
    ev = PosetrackEvaluator(num_joints=2)
    gt = pose([(0, 0), (10, 10)])
    ev.add_frame([gt], [pose([(0, 0), (10, 13)], track=1)])
    m = ev.summarize()
    assert m["fn"] == 1 and m["fp"] == 1
    assert m["MOTA_per_joint"][0] == 100.0
    assert m["MOTA_per_joint"][1] == -100.0       # 1 - (1+1)/1


def test_unmatched_prediction_is_all_fp():
    ev = PosetrackEvaluator(num_joints=2)
    gt = pose([(0, 0), (10, 10)])
    good = pose([(0, 0), (10, 10)], track=1, score=0.9)
    far = pose([(100, 100), (120, 120)], track=2, score=0.8)
    ev.add_frame([gt], [good, far])
    m = ev.summarize()
    assert m["fp"] == 2                            # one per joint
    assert m["fn"] == 0


def test_unmatched_gt_is_fn_for_visible_joints_only():
    ev = PosetrackEvaluator(num_joints=2)
    gt = pose([(0, 0), (10, 10)], vis=[2, 0])      # joint 1 invisible
    ev.add_frame([gt], [])
    m = ev.summarize()
    assert m["fn"] == 1
    assert m["num_gt_joints"] == 1                 # nGT counts visible only


def test_prediction_on_invisible_joint_is_fp():
    ev = PosetrackEvaluator(num_joints=2)
    gt = pose([(0, 0), (10, 10)], vis=[2, 0])
    ev.add_frame([gt], [pose([(0, 0), (10, 10)], track=1)])
    m = ev.summarize()
    assert m["fp"] == 1                            # joint 1 pred vs invisible
    assert m["fn"] == 0


def test_id_switch_counted_per_visible_joint():
    ev = PosetrackEvaluator(num_joints=2)
    gt = pose([(0, 0), (10, 10)], track=5)
    ev.add_frame([gt], [pose([(0, 0), (10, 10)], track=1)])
    ev.add_frame([gt], [pose([(0, 0), (10, 10)], track=2)])
    m = ev.summarize()
    assert m["id_switches"] == 2                   # one per visible joint
    # nGT_j = 2 per joint → MOTA_j = 1 - 1/2
    assert m["MOTA_per_joint"][0] == 50.0


def test_track_state_resets_between_videos():
    ev = PosetrackEvaluator(num_joints=2)
    gt = pose([(0, 0), (10, 10)], track=5)
    ev.add_frame([gt], [pose([(0, 0), (10, 10)], track=1)])
    ev.start_video()
    ev.add_frame([gt], [pose([(0, 0), (10, 10)], track=2)])
    m = ev.summarize()
    assert m["id_switches"] == 0
    assert m["MOTA"] == 100.0


def test_hungarian_pose_matching_is_globally_optimal():
    """Two GTs, two preds: P1 is within radius of both; the assignment must
    leave P2 (only valid for G2) on G2 so both GTs match."""
    ev = PosetrackEvaluator(num_joints=1)
    g1 = pose([(0, 0)], track=1)
    g2 = pose([(2, 0)], track=2)
    p1 = pose([(1, 0)], track=11)                  # within 1.5 of both
    p2 = pose([(2.4, 0)], track=12)                # within 1.5 of G2 only
    ev.add_frame([g1, g2], [p1, p2])
    m = ev.summarize()
    assert m["fp"] == 0 and m["fn"] == 0
    assert m["mAP"] == 100.0


def test_ap_is_score_ranked():
    """Ranked [0.9 TP, 0.8 FP] over nGT=2 → all-point AP = 0.5."""
    ev = PosetrackEvaluator(num_joints=1)
    gt = pose([(0, 0)])
    ev.add_frame([gt], [pose([(0, 0)], track=1, score=0.9)])
    ev.add_frame([gt], [pose([(5, 5)], track=1, score=0.8)])
    m = ev.summarize()
    # frame 2: matched pose (cost gated at 1.0 → unmatched actually: pose
    # distance = 1 - 0 = 1 → gated). So the 0.8 pose is unmatched → FP.
    assert m["AP_per_joint"][0] == 50.0
    assert m["fn"] == 1                            # frame-2 GT missed


def test_mota_can_go_negative():
    ev = PosetrackEvaluator(num_joints=1)
    gt = pose([(0, 0)])
    preds = [pose([(0, 0)], track=1, score=0.9)] + [
        pose([(100 + i, 100)], track=10 + i, score=0.5) for i in range(3)]
    ev.add_frame([gt], preds)
    m = ev.summarize()
    assert m["MOTA"] == -200.0                     # 1 - 3/1


def test_mota_unaffected_by_prediction_scores():
    """MOTA counts detections regardless of score ordering (only the
    score FILTER upstream matters; the evaluator takes what it is given)."""
    ev_hi = PosetrackEvaluator(num_joints=1)
    ev_lo = PosetrackEvaluator(num_joints=1)
    gt = pose([(0, 0)])
    ev_hi.add_frame([gt], [pose([(0, 0)], track=1, score=0.99)])
    ev_lo.add_frame([gt], [pose([(0, 0)], track=1, score=0.01)])
    assert (ev_hi.summarize()["MOTA"] == ev_lo.summarize()["MOTA"]
            == 100.0)
