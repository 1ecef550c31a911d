import numpy as np
import pytest

from detectandtrack_tpu.tracking.tracker import (
    Tracker,
    TrackerConfig,
    bbox_iou_cost,
    cosine_cost,
    greedy_assign,
    pckh_cost,
)
from detectandtrack_tpu.tracking.native import solve_assignment


def _box(x, y, s=20.0):
    return np.array([x, y, x + s, y + s], np.float64)


def test_iou_cost_values():
    c = bbox_iou_cost(np.stack([_box(0, 0)]),
                      np.stack([_box(0, 0), _box(100, 100)]))
    np.testing.assert_allclose(c, [[0.0, 1.0]])


def test_hungarian_beats_greedy_on_crossing():
    # Classic crossing case: greedy picks (0,0) then forced (1,1);
    # hungarian picks the cheaper total (0,1)+(1,0).
    cost = np.array([[0.1, 0.2], [0.15, 1.0]])
    g = dict(greedy_assign(cost))
    h = dict(solve_assignment(cost))
    assert g == {0: 0, 1: 1}
    assert h == {0: 1, 1: 0}


def test_track_ids_stable_across_frames():
    tr = Tracker(TrackerConfig(score_thresh=0.1))
    a, b = _box(0, 0), _box(100, 100)
    ids1 = tr.update(np.stack([a, b]), np.array([0.9, 0.8]))
    # swap order: ids must follow the boxes, not the order
    ids2 = tr.update(np.stack([b + 2, a + 2]), np.array([0.9, 0.8]))
    assert ids1.tolist() == [0, 1]
    assert ids2.tolist() == [1, 0]


def test_new_track_birth_and_death():
    tr = Tracker(TrackerConfig(score_thresh=0.1, max_age=0))
    ids1 = tr.update(np.stack([_box(0, 0)]), np.array([0.9]))
    # disappears for one frame -> killed (max_age=0); new appearance = new id
    ids2 = tr.update(np.stack([_box(200, 200)]), np.array([0.9]))
    ids3 = tr.update(np.stack([_box(0, 0)]), np.array([0.9]))
    assert ids1.tolist() == [0]
    assert ids2.tolist() == [1]
    assert ids3.tolist() == [2]


def test_keep_alive_bridges_gap():
    tr = Tracker(TrackerConfig(score_thresh=0.1, max_age=1))
    ids1 = tr.update(np.stack([_box(0, 0)]), np.array([0.9]))
    _ = tr.update(np.zeros((0, 4)), np.zeros(0))
    ids3 = tr.update(np.stack([_box(1, 1)]), np.array([0.9]))
    assert ids1.tolist() == [0]
    assert ids3.tolist() == [0]        # same track across one missed frame


def test_score_filter_and_valid_mask():
    tr = Tracker(TrackerConfig(score_thresh=0.5))
    ids = tr.update(np.stack([_box(0, 0), _box(50, 50), _box(100, 100)]),
                    np.array([0.9, 0.2, 0.8]),
                    valid=np.array([True, True, False]))
    assert ids[0] >= 0 and ids[1] == -1 and ids[2] == -1


def test_max_cost_gate_prevents_bad_link():
    tr = Tracker(TrackerConfig(score_thresh=0.1, max_cost=0.4))
    tr.update(np.stack([_box(0, 0)]), np.array([0.9]))
    # far box: IoU 0 → cost 1 > 0.4 → new track
    ids = tr.update(np.stack([_box(300, 300)]), np.array([0.9]))
    assert ids.tolist() == [1]


def test_pckh_metric_tracks_poses():
    k = 15
    rng = np.random.default_rng(0)
    pose_a = rng.uniform(0, 50, (k, 3)); pose_a[:, 2] = 1
    pose_b = pose_a + 200
    tr = Tracker(TrackerConfig(distance_metric="pose-pckh",
                               score_thresh=0.1))
    ids1 = tr.update(np.stack([_box(0, 0, 50), _box(200, 200, 50)]),
                     np.array([0.9, 0.9]),
                     keypoints=np.stack([pose_a, pose_b]))
    ids2 = tr.update(np.stack([_box(200, 200, 50), _box(0, 0, 50)]),
                     np.array([0.9, 0.9]),
                     keypoints=np.stack([pose_b + 1, pose_a + 1]))
    assert ids1.tolist() == [0, 1]
    assert ids2.tolist() == [1, 0]


def test_cosine_metric():
    f1 = np.array([1.0, 0.0, 0.0])
    f2 = np.array([0.0, 1.0, 0.0])
    tr = Tracker(TrackerConfig(distance_metric="cnn-cosine",
                               score_thresh=0.1, max_cost=0.5))
    ids1 = tr.update(np.stack([_box(0, 0), _box(30, 30)]),
                     np.array([0.9, 0.9]), features=np.stack([f1, f2]))
    ids2 = tr.update(np.stack([_box(30, 30), _box(0, 0)]),
                     np.array([0.9, 0.9]), features=np.stack([f2, f1]))
    assert ids1.tolist() == [0, 1]
    assert ids2.tolist() == [1, 0]


def test_greedy_vs_hungarian_configurable():
    cost = np.array([[0.1, 0.2], [0.15, 1.0]])
    trg = Tracker(TrackerConfig(algo="greedy", score_thresh=0.0))
    trh = Tracker(TrackerConfig(algo="hungarian", score_thresh=0.0))
    assert trg.config.algo == "greedy" and trh.config.algo == "hungarian"


def test_pckh_norm_options():
    """TRACKING.PCKH_NORM: box-diag vs kps-span normalizations (VERDICT r2
    #9). A drift small vs the keypoint span but large vs a tight box
    diagonal links under kps-span and not under box-diag."""
    from detectandtrack_tpu.tracking.tracker import pckh_cost
    prev_kps = np.zeros((1, 15, 3))
    prev_kps[0, :, 0] = np.linspace(0, 100, 15)   # 100 px wide pose
    prev_kps[0, :, 1] = np.linspace(0, 60, 15)
    prev_box = np.array([[40.0, 20.0, 50.0, 30.0]])  # tiny box: diag ~14
    cur_kps = prev_kps.copy()
    cur_kps[..., 0] += 8.0                        # 8 px drift
    c_box = pckh_cost(prev_kps, prev_box, cur_kps, 0.2, norm="box-diag")
    c_span = pckh_cost(prev_kps, prev_box, cur_kps, 0.2, norm="kps-span")
    # box-diag thresh = 0.2*14 ~= 2.8 < 8 -> no joints match
    assert c_box[0, 0] == 1.0
    # kps-span thresh = 0.2*hypot(100,60) ~= 23 > 8 -> all joints match
    assert c_span[0, 0] == 0.0
    with pytest.raises(ValueError):
        pckh_cost(prev_kps, prev_box, cur_kps, 0.2, norm="head")


def test_pckh_norm_from_cfg():
    from detectandtrack_tpu.core.config import load_cfg
    from detectandtrack_tpu.tracking.tracker import Tracker
    cfg = load_cfg(opts=["TRACKING.DISTANCE_METRIC", "pose-pckh",
                         "TRACKING.PCKH_NORM", "kps-span"])
    assert Tracker.from_cfg(cfg).config.pckh_norm == "kps-span"
    with pytest.raises(ValueError):
        load_cfg(opts=["TRACKING.PCKH_NORM", "head-box"])


def test_posetrack_results_roundtrip(tmp_path):
    """write_posetrack_results → read_posetrack_results is lossless for
    the fields the evaluator consumes (mode eval / third-party scoring)."""
    from detectandtrack_tpu.tracking.engine import (
        read_posetrack_results, write_posetrack_results)

    frames = []
    rng = np.random.default_rng(0)
    for fi in range(3):
        n = 2
        kps = np.zeros((n, 15, 3))
        kps[..., 0] = rng.uniform(0, 100, (n, 15))
        kps[..., 1] = rng.uniform(0, 100, (n, 15))
        kps[..., 2] = rng.uniform(0.1, 1.0, (n, 15))
        frames.append({
            "boxes": rng.uniform(0, 100, (n, 4)),
            "scores": rng.uniform(0.5, 1.0, n),
            "keypoints": kps,
            "track_ids": np.array([fi, fi + 7]),
        })
    tracked = {"vid_a": frames}
    write_posetrack_results(tracked, str(tmp_path))
    back = read_posetrack_results(str(tmp_path))
    assert list(back) == ["vid_a"]
    for fr, orig in zip(back["vid_a"], frames):
        np.testing.assert_allclose(fr["boxes"], orig["boxes"])
        np.testing.assert_allclose(fr["scores"], orig["scores"])
        np.testing.assert_array_equal(fr["track_ids"], orig["track_ids"])
        np.testing.assert_allclose(fr["keypoints"], orig["keypoints"])
