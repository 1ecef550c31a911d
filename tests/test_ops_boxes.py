import numpy as np
import jax.numpy as jnp

from detectandtrack_tpu.ops import boxes as B


def _rand_boxes(rng, n, size=200):
    x1 = rng.uniform(0, size, n)
    y1 = rng.uniform(0, size, n)
    w = rng.uniform(1, 80, n)
    h = rng.uniform(1, 80, n)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=1).astype(np.float32)


def _np_overlaps(b, q):
    n, k = b.shape[0], q.shape[0]
    out = np.zeros((n, k))
    for i in range(n):
        for j in range(k):
            ix1 = max(b[i, 0], q[j, 0]); iy1 = max(b[i, 1], q[j, 1])
            ix2 = min(b[i, 2], q[j, 2]); iy2 = min(b[i, 3], q[j, 3])
            iw = max(0.0, ix2 - ix1 + 1); ih = max(0.0, iy2 - iy1 + 1)
            inter = iw * ih
            a1 = (b[i, 2] - b[i, 0] + 1) * (b[i, 3] - b[i, 1] + 1)
            a2 = (q[j, 2] - q[j, 0] + 1) * (q[j, 3] - q[j, 1] + 1)
            out[i, j] = inter / (a1 + a2 - inter)
    return out


def test_overlaps_vs_oracle():
    rng = np.random.default_rng(0)
    b, q = _rand_boxes(rng, 17), _rand_boxes(rng, 9)
    got = np.asarray(B.bbox_overlaps(b, q))
    np.testing.assert_allclose(got, _np_overlaps(b, q), atol=1e-5)


def test_transform_roundtrip():
    rng = np.random.default_rng(1)
    ex = _rand_boxes(rng, 32)
    gt = _rand_boxes(rng, 32)
    w = (10.0, 10.0, 5.0, 5.0)
    deltas = B.bbox_transform_inv(ex, gt, w)
    rec = np.asarray(B.bbox_transform(ex, deltas, w))
    # f32 exp/log roundtrip at image-scale coords; TPU transcendental
    # precision needs the looser tolerance.
    np.testing.assert_allclose(rec, gt, atol=2e-2)


def test_transform_multiclass_shape():
    rng = np.random.default_rng(2)
    ex = _rand_boxes(rng, 8)
    deltas = rng.normal(size=(8, 12)).astype(np.float32)  # 3 classes
    out = B.bbox_transform(ex, deltas)
    assert out.shape == (8, 12)


def test_clip_and_flip():
    b = np.array([[-10.0, -5.0, 500.0, 300.0]], np.float32)
    c = np.asarray(B.clip_boxes(b, 200, 300))
    assert c.tolist() == [[0.0, 0.0, 299.0, 199.0]]
    f = np.asarray(B.flip_boxes(c, 300))
    # flip twice = identity
    ff = np.asarray(B.flip_boxes(f, 300))
    np.testing.assert_allclose(ff, c)


def test_pairwise_iou_matches_matrix_diag():
    rng = np.random.default_rng(3)
    a = _rand_boxes(rng, 12)
    m = np.asarray(B.bbox_overlaps(a, a))
    d = np.asarray(B.bbox_iou_pairwise(a, a))
    np.testing.assert_allclose(d, np.diag(m), atol=1e-6)


def test_filter_small_boxes():
    b = np.array([[0, 0, 1, 1], [0, 0, 10, 10]], np.float32)
    m = np.asarray(B.filter_small_boxes(b, 5.0))
    assert m.tolist() == [False, True]
