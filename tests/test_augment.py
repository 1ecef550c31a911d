import numpy as np

from detectandtrack_tpu.engine.augment import (
    _unflip_boxes,
    _unflip_keypoints,
    flip_clip,
)


def test_unflip_boxes_roundtrip():
    boxes = np.array([[10.0, 5.0, 30.0, 25.0, 12.0, 6.0, 32.0, 26.0]])
    rt = _unflip_boxes(_unflip_boxes(boxes, 100), 100)
    np.testing.assert_allclose(rt, boxes)
    f = _unflip_boxes(boxes, 100)
    np.testing.assert_allclose(f[0, :4], [69.0, 5.0, 89.0, 25.0])


def test_unflip_keypoints_roundtrip():
    rng = np.random.default_rng(0)
    kps = rng.uniform(0, 99, (3, 2, 15, 4))
    rt = _unflip_keypoints(_unflip_keypoints(kps, 100), 100)
    np.testing.assert_allclose(rt, kps)


def test_flip_clip():
    c = np.arange(12.0).reshape(1, 1, 2, 3, 2)
    f = flip_clip(c)
    np.testing.assert_allclose(f[0, 0, 0, 0], c[0, 0, 0, 2])


def test_merge_multiscale_union_and_dedup():
    from detectandtrack_tpu.engine.augment import (
        merge_multiscale_detections, rescale_detections)
    # Pass A: one detection at [10,10,30,30]; pass B: the SAME object (IoU 1)
    # plus a unique one. Union must dedup the shared box (keep higher score)
    # and keep the unique one.
    a = {
        "boxes": np.array([[10.0, 10, 30, 30], [0, 0, 0, 0]]),
        "scores": np.array([0.8, 0.0]),
        "valid": np.array([True, False]),
        "keypoints": np.full((2, 1, 15, 4), 1.0),
    }
    b = {
        "boxes": np.array([[10.0, 10, 30, 30], [50, 50, 70, 70]]),
        "scores": np.array([0.9, 0.6]),
        "valid": np.array([True, True]),
        "keypoints": np.full((2, 1, 15, 4), 2.0),
    }
    out = merge_multiscale_detections([a, b], num_frames=1, nms_thresh=0.5)
    assert out["valid"].sum() == 2
    # Highest score kept first; its keypoints ride along (pass B's).
    assert out["scores"][0] == 0.9
    np.testing.assert_allclose(out["keypoints"][0], 2.0)
    kept = {tuple(bx) for bx in out["boxes"][out["valid"]].tolist()}
    assert (10.0, 10.0, 30.0, 30.0) in kept
    assert (50.0, 50.0, 70.0, 70.0) in kept


def test_rescale_detections():
    from detectandtrack_tpu.engine.augment import rescale_detections
    det = {"boxes": np.array([[20.0, 40, 60, 80]]),
           "scores": np.array([0.5]),
           "valid": np.array([True]),
           "keypoints": np.array([[[[10.0, 20.0, 3.0, 0.9]]]])}
    out = rescale_detections(det, 2.0)
    np.testing.assert_allclose(out["boxes"][0], [10, 20, 30, 40])
    np.testing.assert_allclose(out["keypoints"][0, 0, 0], [5, 10, 3, 0.9])
    assert out["scores"][0] == 0.5
