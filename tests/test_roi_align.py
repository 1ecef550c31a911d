import numpy as np
import jax
import jax.numpy as jnp
import pytest

from detectandtrack_tpu.kernels.roi_align import (
    assign_fpn_levels,
    roi_align,
    roi_align_3d,
    roi_align_multilevel,
    roi_align_reference,
    _roi_align_pallas,
)


def _np_roi_align(feat, rois, p, s, scale):
    """Scalar-loop numpy oracle with Detectron RoIAlign semantics."""
    h, w, c = feat.shape
    out = np.zeros((len(rois), p, p, c), np.float32)
    for r, roi in enumerate(rois):
        x1, y1, x2, y2 = [v * scale for v in roi]
        rw = max(x2 - x1, 1.0)
        rh = max(y2 - y1, 1.0)
        bw, bh = rw / p, rh / p
        for py in range(p):
            for px in range(p):
                acc = np.zeros(c, np.float32)
                for sy in range(s):
                    for sx in range(s):
                        y = y1 + (py + (sy + 0.5) / s) * bh
                        x = x1 + (px + (sx + 0.5) / s) * bw
                        if y <= -1.0 or y >= h or x <= -1.0 or x >= w:
                            continue
                        y = min(max(y, 0.0), h - 1.0)
                        x = min(max(x, 0.0), w - 1.0)
                        y0, x0 = int(y), int(x)
                        y1i, x1i = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
                        ly, lx = y - y0, x - x0
                        acc += ((1 - ly) * (1 - lx) * feat[y0, x0]
                                + (1 - ly) * lx * feat[y0, x1i]
                                + ly * (1 - lx) * feat[y1i, x0]
                                + ly * lx * feat[y1i, x1i])
                out[r, py, px] = acc / (s * s)
    return out


@pytest.fixture(scope="module")
def feat_and_rois():
    rng = np.random.default_rng(0)
    feat = rng.normal(size=(48, 64, 8)).astype(np.float32)
    rois = np.array(
        [[4.0, 8.0, 40.0, 44.0],      # interior
         [0.0, 0.0, 63.0, 47.0],      # full image
         [-5.0, -5.0, 10.0, 10.0],    # out-of-bounds start
         [50.0, 30.0, 90.0, 70.0],    # out-of-bounds end
         [20.0, 20.0, 20.5, 20.5]],   # tiny (sub-pixel)
        np.float32)
    return feat, rois


def test_reference_matches_numpy_oracle(feat_and_rois):
    feat, rois = feat_and_rois
    got = np.asarray(roi_align_reference(feat, rois, 7, 2, 1.0))
    want = _np_roi_align(feat, rois, 7, 2, 1.0)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_reference_with_scale(feat_and_rois):
    feat, rois = feat_and_rois
    got = np.asarray(roi_align_reference(feat, rois * 4, 7, 2, 0.25))
    want = _np_roi_align(feat, rois * 4, 7, 2, 0.25)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_pallas_interpret_matches_reference(feat_and_rois):
    feat, rois = feat_and_rois
    slabs = np.zeros(len(rois), np.int32)
    # patch=64 covers the whole 48x64 map → exact for every RoI incl. huge
    got = np.asarray(_roi_align_pallas(
        jnp.asarray(feat)[None], jnp.asarray(rois), jnp.asarray(slabs),
        7, 2, patch=64, interpret=True))
    want = _np_roi_align(feat, rois, 7, 2, 1.0)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_pallas_default_patch_fpn_legal_rois(feat_and_rois):
    """RoIs spanning <= patch-8 cells in x are exact with the default patch
    (40), including unaligned origins and right/bottom-edge boxes."""
    feat, _ = feat_and_rois
    rois = np.array(
        [[4.0, 8.0, 33.5, 38.0],      # unaligned fractional origin
         [33.0, 14.0, 61.0, 44.0],    # near the right edge (ox aligns to 32)
         [0.0, 0.0, 29.0, 29.0],
         [41.0, 20.0, 63.0, 47.0],    # touches the bottom-right corner
         [7.9, 17.9, 39.9, 47.0]],    # origin just below alignment boundary
        np.float32)
    slabs = np.zeros(len(rois), np.int32)
    got = np.asarray(_roi_align_pallas(
        jnp.asarray(feat)[None], jnp.asarray(rois), jnp.asarray(slabs),
        7, 2, patch=40, interpret=True))
    want = _np_roi_align(feat, rois, 7, 2, 1.0)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_pallas_interpret_multi_slab():
    rng = np.random.default_rng(1)
    feat = rng.normal(size=(3, 40, 40, 8)).astype(np.float32)
    rois = np.array([[2.0, 2.0, 30.0, 30.0]] * 3, np.float32)
    slabs = np.array([0, 1, 2], np.int32)
    got = np.asarray(_roi_align_pallas(
        jnp.asarray(feat), jnp.asarray(rois), jnp.asarray(slabs),
        7, 2, patch=32, interpret=True))
    for t in range(3):
        want = _np_roi_align(feat[t], rois[t:t + 1], 7, 2, 1.0)
        np.testing.assert_allclose(got[t:t + 1], want, atol=1e-3,
                                   err_msg=f"slab {t}")


def test_roi_align_3d_per_frame(feat_and_rois):
    rng = np.random.default_rng(2)
    t = 3
    feat = rng.normal(size=(t, 32, 32, 8)).astype(np.float32)
    # tube: different box per frame
    tube = np.concatenate(
        [np.array([[2.0, 2.0, 20.0, 20.0]]) + 3 * i for i in range(t)],
        axis=1).astype(np.float32)
    out = np.asarray(roi_align_3d(feat, tube, 7, 2, 1.0, use_pallas=False))
    assert out.shape == (1, t, 7, 7, 8)
    for i in range(t):
        want = _np_roi_align(feat[i], tube[:, 4 * i:4 * i + 4], 7, 2, 1.0)
        np.testing.assert_allclose(out[:, i], want, atol=1e-4)


def test_grad_flows_and_matches_reference(feat_and_rois):
    feat, rois = feat_and_rois

    def loss(f):
        return jnp.sum(roi_align(f, rois, 7, 2, 1.0, use_pallas=False) ** 2)

    g = jax.grad(loss)(jnp.asarray(feat))
    assert g.shape == feat.shape
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_assign_fpn_levels():
    rois = np.array(
        [[0, 0, 20, 20],         # tiny → min level
         [0, 0, 223, 223],       # canonical → level 4
         [0, 0, 1000, 1000]],    # huge → max level
        np.float32)
    lvl = np.asarray(assign_fpn_levels(rois, 2, 5))
    assert lvl.tolist() == [0, 2, 3]


def test_multilevel_selects_per_roi():
    rng = np.random.default_rng(3)
    feats = [rng.normal(size=(32 // (2 ** i), 32 // (2 ** i), 4)).astype(
        np.float32) for i in range(2)]
    strides = [4, 8]
    rois = np.array([[0.0, 0.0, 40.0, 40.0], [8.0, 8.0, 100.0, 100.0]],
                    np.float32)
    levels = np.array([0, 1], np.int32)
    out = np.asarray(roi_align_multilevel(
        feats, strides, rois, levels, 7, 2, use_pallas=False))
    want0 = _np_roi_align(feats[0], rois[:1], 7, 2, 1.0 / 4)
    want1 = _np_roi_align(feats[1], rois[1:], 7, 2, 1.0 / 8)
    np.testing.assert_allclose(out[0], want0[0], atol=1e-4)
    np.testing.assert_allclose(out[1], want1[0], atol=1e-4)


def test_dense_matches_oracle_multi_slab():
    from detectandtrack_tpu.kernels.roi_align import roi_align_dense
    rng = np.random.default_rng(7)
    feat = rng.normal(size=(3, 24, 32, 8)).astype(np.float32)
    rois = rng.uniform(2, 18, size=(3, 5, 4)).astype(np.float32)
    rois[..., 2:] = rois[..., :2] + rng.uniform(3, 12, size=(3, 5, 2))
    out = np.asarray(roi_align_dense(jnp.asarray(feat), jnp.asarray(rois),
                                     7, 2, 0.5))
    assert out.shape == (3, 5, 7, 7, 8)
    for s in range(3):
        want = _np_roi_align(feat[s], rois[s], 7, 2, 0.5)
        np.testing.assert_allclose(out[s], want, atol=1e-3,
                                   err_msg=f"slab {s}")


def test_dense_multilevel_selection():
    from detectandtrack_tpu.kernels.roi_align import (
        roi_align_multilevel_dense)
    rng = np.random.default_rng(8)
    feats = [jnp.asarray(rng.normal(size=(2, 32 // 2 ** i, 32 // 2 ** i,
                                          4)).astype(np.float32))
             for i in range(2)]
    rois = jnp.asarray(rng.uniform(0, 60, size=(2, 3, 4)).astype(np.float32))
    rois = rois.at[..., 2:].set(rois[..., :2] + 30.0)
    levels = jnp.asarray(rng.integers(0, 2, size=(2, 3)), jnp.int32)
    out = np.asarray(roi_align_multilevel_dense(feats, [4, 8], rois, levels,
                                                7, 2))
    for s in range(2):
        for r in range(3):
            l = int(levels[s, r])
            want = _np_roi_align(np.asarray(feats[l][s]),
                                 np.asarray(rois[s, r:r + 1]), 7, 2,
                                 1.0 / (4, 8)[l])
            np.testing.assert_allclose(out[s, r], want[0], atol=1e-3)


def test_dense_grad_flows():
    from detectandtrack_tpu.kernels.roi_align import roi_align_dense
    feat = jnp.ones((1, 16, 16, 4))
    rois = jnp.asarray([[[2.0, 2.0, 12.0, 12.0]]])
    g = jax.grad(lambda f: jnp.sum(roi_align_dense(f, rois) ** 2))(feat)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_gather_multilevel_matches_dense():
    """The gather form must be numerically interchangeable with the dense
    two-einsum form (same Detectron sampling semantics) on random
    multi-level RoIs, including out-of-bounds and degenerate boxes."""
    from detectandtrack_tpu.kernels.roi_align import (
        roi_align_multilevel_dense, roi_align_multilevel_gather)
    rng = np.random.default_rng(11)
    feats = [jnp.asarray(rng.normal(size=(2, 40 // 2 ** i, 48 // 2 ** i,
                                          8)).astype(np.float32))
             for i in range(3)]
    strides = [4, 8, 16]
    rois = rng.uniform(-20, 170, size=(2, 7, 4)).astype(np.float32)
    rois[..., 2:] = rois[..., :2] + rng.uniform(0, 120, size=(2, 7, 2))
    rois[0, 3] = [5.0, 5.0, 5.0, 5.0]          # degenerate (zero-size) box
    rois = jnp.asarray(rois)
    levels = jnp.asarray(rng.integers(0, 3, size=(2, 7)), jnp.int32)
    a = np.asarray(roi_align_multilevel_dense(feats, strides, rois, levels,
                                              7, 2))
    b = np.asarray(roi_align_multilevel_gather(feats, strides, rois, levels,
                                               7, 2))
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_gather_multilevel_grad_flows():
    from detectandtrack_tpu.kernels.roi_align import (
        roi_align_multilevel_gather)
    feats = [jnp.ones((1, 16, 16, 4)), jnp.ones((1, 8, 8, 4))]
    rois = jnp.asarray([[[2.0, 2.0, 12.0, 12.0], [1.0, 1.0, 14.0, 14.0]]])
    levels = jnp.asarray([[0, 1]], jnp.int32)
    g = jax.grad(lambda f: jnp.sum(roi_align_multilevel_gather(
        [f, feats[1]], [4, 8], rois, levels) ** 2))(feats[0])
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_hybrid_multilevel_matches_dense():
    from detectandtrack_tpu.kernels.roi_align import (
        roi_align_multilevel_dense, roi_align_multilevel_hybrid)
    rng = np.random.default_rng(12)
    feats = [jnp.asarray(rng.normal(size=(2, 40 // 2 ** i, 48 // 2 ** i,
                                          8)).astype(np.float32))
             for i in range(3)]
    strides = [4, 8, 16]
    rois = rng.uniform(-20, 170, size=(2, 7, 4)).astype(np.float32)
    rois[..., 2:] = rois[..., :2] + rng.uniform(0, 120, size=(2, 7, 2))
    rois[1, 2] = [3.0, 3.0, 3.0, 3.0]
    rois = jnp.asarray(rois)
    levels = jnp.asarray(rng.integers(0, 3, size=(2, 7)), jnp.int32)
    a = np.asarray(roi_align_multilevel_dense(feats, strides, rois, levels,
                                              7, 2))
    b = np.asarray(roi_align_multilevel_hybrid(feats, strides, rois, levels,
                                               7, 2))
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_hybrid_chunked_matches_unchunked():
    from detectandtrack_tpu.kernels.roi_align import roi_align_hybrid
    rng = np.random.default_rng(13)
    feat = jnp.asarray(rng.normal(size=(2, 24, 24, 8)).astype(np.float32))
    rois = rng.uniform(0, 20, size=(2, 21, 4)).astype(np.float32)
    rois[..., 2:] = rois[..., :2] + rng.uniform(2, 14, size=(2, 21, 2))
    rois = jnp.asarray(rois)
    a = np.asarray(roi_align_hybrid(feat, rois, 7, 2, 1.0, chunk=8))
    b = np.asarray(roi_align_hybrid(feat, rois, 7, 2, 1.0, chunk=None))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_pallas_multilevel_matches_dense_interpret():
    """Single-launch multilevel Pallas kernel == dense path (interpret mode;
    maps smaller than the patch exercise the uniform-DMA H padding)."""
    from detectandtrack_tpu.kernels.roi_align import (
        roi_align_multilevel_dense, roi_align_multilevel_pallas)
    rng = np.random.default_rng(21)
    feats = [jnp.asarray(rng.normal(size=(3, 80 // 2 ** i, 96 // 2 ** i,
                                          8)).astype(np.float32))
             for i in range(3)]
    strides = [4, 8, 16]
    # Aspect <= 2 boxes sized for their level (the kernel's span contract).
    rois = np.zeros((3, 6, 4), np.float32)
    lv = rng.integers(0, 3, size=(3, 6))
    for si in range(3):
        for ri in range(6):
            side = 40.0 * 2 ** lv[si, ri]
            x1 = rng.uniform(-10, 300); y1 = rng.uniform(-10, 250)
            rois[si, ri] = [x1, y1, x1 + side * rng.uniform(0.6, 1.8),
                            y1 + side * rng.uniform(0.6, 1.8)]
    rois = jnp.asarray(rois)
    levels = jnp.asarray(lv, jnp.int32)
    a = np.asarray(roi_align_multilevel_dense(feats, strides, rois, levels,
                                              7, 2))
    b = np.asarray(roi_align_multilevel_pallas(feats, strides, rois, levels,
                                               7, 2, interpret=True))
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_pallas_multilevel_grad_matches_dense():
    """The custom vjp (dense-path backward) matches the dense gradient."""
    from detectandtrack_tpu.kernels.roi_align import (
        roi_align_multilevel_dense, roi_align_multilevel_pallas)
    feats = [jnp.ones((1, 16, 16, 4)), jnp.ones((1, 8, 8, 4))]
    rois = jnp.asarray([[[2.0, 2.0, 12.0, 12.0], [1.0, 1.0, 14.0, 14.0]]])
    levels = jnp.asarray([[0, 1]], jnp.int32)

    def loss(fn, f0):
        return jnp.sum(fn([f0, feats[1]], [4, 8], rois, levels, 7, 2) ** 2)

    gd = jax.grad(lambda f: loss(
        lambda *a: roi_align_multilevel_dense(*a), f))(feats[0])
    gp = jax.grad(lambda f: loss(
        lambda *a: roi_align_multilevel_pallas(*a, interpret=True),
        f))(feats[0])
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gp), atol=1e-4)


def test_roi_align_mirror_equivariance_stride1():
    """Bin-alignment contract used by in-graph flip-TTA heatmap averaging:
    pooling the mirrored feature map at the mirrored RoI returns the
    W-mirrored pooled patch (bin S-1-j of the mirrored box covers the same
    pixels as bin j of the original box). Exact at stride 1."""
    import jax.numpy as jnp
    from detectandtrack_tpu.kernels.roi_align import (
        roi_align_multilevel_dense)
    rng = np.random.default_rng(7)
    h, w, c = 24, 32, 4
    fmap = jnp.asarray(rng.normal(size=(1, h, w, c)), jnp.float32)
    rois = jnp.asarray([[[3.0, 2.0, 21.0, 17.0],
                         [10.5, 4.25, 28.0, 20.0]]], jnp.float32)
    levels = jnp.zeros((1, 2), jnp.int32)
    pooled = roi_align_multilevel_dense([fmap], [1], rois, levels, 7, 2)
    fmap_m = fmap[:, :, ::-1]
    w_img = float(w)  # stride 1: image width == map width
    x1, x2 = rois[..., 0], rois[..., 2]
    rois_m = jnp.stack([w_img - 1.0 - x2, rois[..., 1],
                        w_img - 1.0 - x1, rois[..., 3]], axis=-1)
    pooled_m = roi_align_multilevel_dense([fmap_m], [1], rois_m, levels,
                                          7, 2)
    np.testing.assert_allclose(np.asarray(pooled_m),
                               np.asarray(pooled[:, :, :, ::-1]),
                               atol=1e-5)
