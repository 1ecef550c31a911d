import numpy as np

from detectandtrack_tpu.ops.nms import (
    batched_nms_fixed,
    nms_fixed,
    nms_numpy,
    soft_nms_fixed,
    soft_nms_scan,
)


def _rand(rng, n):
    x1 = rng.uniform(0, 100, n)
    y1 = rng.uniform(0, 100, n)
    w = rng.uniform(5, 60, n)
    h = rng.uniform(5, 60, n)
    boxes = np.stack([x1, y1, x1 + w, y1 + h], 1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    return boxes, scores


def test_matches_cython_semantics_oracle():
    rng = np.random.default_rng(0)
    for trial in range(5):
        boxes, scores = _rand(rng, 50)
        ref = nms_numpy(boxes, scores, 0.5)
        idx, mask = nms_fixed(boxes, scores, 0.5, max_out=50)
        got = [int(i) for i, m in zip(np.asarray(idx), np.asarray(mask)) if m]
        assert got == ref, f"trial {trial}"


def test_budget_truncates_in_score_order():
    rng = np.random.default_rng(1)
    boxes, scores = _rand(rng, 40)
    ref = nms_numpy(boxes, scores, 0.5)
    idx, mask = nms_fixed(boxes, scores, 0.5, max_out=3)
    got = [int(i) for i, m in zip(np.asarray(idx), np.asarray(mask)) if m]
    assert got == ref[:3]


def test_valid_mask_excludes():
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10], [50, 50, 60, 60]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    valid = np.array([False, True, True])
    idx, mask = nms_fixed(boxes, scores, 0.5, max_out=3, valid=valid)
    got = [int(i) for i, m in zip(np.asarray(idx), np.asarray(mask)) if m]
    assert got == [1, 2]  # box 0 invalid, so box 1 survives


def test_all_invalid_gives_empty():
    boxes = np.zeros((4, 4), np.float32)
    scores = np.zeros(4, np.float32)
    idx, mask = nms_fixed(boxes, scores, 0.5, max_out=4,
                          valid=np.zeros(4, bool))
    assert not np.asarray(mask).any()


def test_batched_nms_classes_dont_suppress():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    same = np.array([0, 0])
    diff = np.array([0, 1])
    _, m_same = batched_nms_fixed(boxes, scores, same, 0.5, 2)
    _, m_diff = batched_nms_fixed(boxes, scores, diff, 0.5, 2)
    assert int(np.asarray(m_same).sum()) == 1
    assert int(np.asarray(m_diff).sum()) == 2


def test_soft_nms_decays_overlapping():
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10], [50, 50, 60, 60]],
                     np.float32)
    scores = np.array([0.9, 0.85, 0.5], np.float32)
    idx, mask, new_scores = soft_nms_fixed(boxes, scores, max_out=3,
                                           method="gaussian")
    idx, mask, new_scores = (np.asarray(idx), np.asarray(mask),
                             np.asarray(new_scores))
    assert mask.all()
    assert idx[0] == 0 and new_scores[0] == 0.9
    # duplicate box's score decayed below the far box
    pos1 = list(idx).index(1)
    assert new_scores[pos1] < 0.5


def _assert_soft_equal(boxes, scores, max_out, msg="", **kw):
    fi, fm, fs = (np.asarray(a) for a in
                  soft_nms_fixed(boxes, scores, max_out, **kw))
    si, sm, ss = (np.asarray(a) for a in
                  soft_nms_scan(boxes, scores, max_out, **kw))
    assert (fm == sm).all(), msg
    assert (fi == si).all(), msg
    np.testing.assert_allclose(fs, ss, rtol=1e-5, atol=1e-6, err_msg=msg)


def test_soft_nms_fixpoint_matches_scan_random():
    """The bulk-confirmation fixpoint must emit exactly the sequential
    pick-decay scan's (idx, mask, scores) — both methods, random boxes."""
    rng = np.random.default_rng(7)
    for trial in range(4):
        boxes, scores = _rand(rng, 60)
        for method in ("linear", "gaussian"):
            _assert_soft_equal(boxes, scores, 60, method=method,
                               msg=f"trial {trial} {method}")


def test_soft_nms_fixpoint_matches_scan_chain():
    """Decay chain: each box overlaps only its neighbors, so pick order
    resolves one link per fixpoint round — the adversarial depth case."""
    n = 48
    x1 = np.arange(n, dtype=np.float32) * 6.0
    boxes = np.stack([x1, np.zeros(n, np.float32),
                      x1 + 9.0, np.full(n, 9.0, np.float32)], axis=1)
    scores = np.linspace(1.0, 0.5, n).astype(np.float32)
    for method in ("linear", "gaussian"):
        _assert_soft_equal(boxes, scores, n, method=method, msg=method)


def test_soft_nms_fixpoint_budget_valid_and_padding():
    rng = np.random.default_rng(9)
    boxes, scores = _rand(rng, 30)
    valid = rng.uniform(size=30) > 0.3
    # truncating budget
    _assert_soft_equal(boxes, scores, 8, valid=valid, msg="budget")
    # budget larger than N (fixpoint pads its emission)
    _assert_soft_equal(boxes, scores, 45, valid=valid, msg="pad")
    # high score_thresh masks the tail identically
    _assert_soft_equal(boxes, scores, 30, score_thresh=0.5, msg="thresh")


def test_nms_suppression_chain_exact():
    """Worst case for the fixpoint form: a long chain where box i suppresses
    i+1 but NOT i+2 (so suppressed boxes re-enable their successors). The
    Jacobi iteration needs chain-depth rounds; the result must still equal
    the sequential-greedy oracle exactly."""
    n = 64
    # Boxes sliding right by 6px each, 10px wide: IoU(i, i+1) = 4/16 = 0.25
    # > 0.2 thresh; IoU(i, i+2) = 0 — the alternating-keep chain.
    x1 = np.arange(n, dtype=np.float32) * 6.0
    boxes = np.stack([x1, np.zeros(n, np.float32),
                      x1 + 9.0, np.full(n, 9.0, np.float32)], axis=1)
    scores = np.linspace(1.0, 0.5, n).astype(np.float32)
    ref = nms_numpy(boxes, scores, 0.2)
    idx, mask = nms_fixed(boxes, scores, 0.2, n)
    got = [int(i) for i, m in zip(np.asarray(idx), np.asarray(mask)) if m]
    assert got == ref
    # every even box kept (alternating chain)
    assert got == list(range(0, n, 2))
