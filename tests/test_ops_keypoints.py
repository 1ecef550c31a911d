import numpy as np

from detectandtrack_tpu.ops import keypoints as K


def test_posetrack_has_15_coco_17():
    names, flip = K.get_keypoints("posetrack")
    assert len(names) == 15
    assert flip["left_hip"] == "right_hip"
    names, _ = K.get_keypoints("coco")
    assert len(names) == 17


def test_flip_permutation_involution():
    for ds in ("posetrack", "coco"):
        p = K.flip_permutation(ds)
        np.testing.assert_array_equal(p[p], np.arange(len(p)))
        # non-sided joints stay put
        names, flip_map = K.get_keypoints(ds)
        for i, n in enumerate(names):
            if n not in flip_map:
                assert p[i] == i


def test_flip_keypoints_roundtrip():
    rng = np.random.default_rng(0)
    kps = rng.uniform(0, 100, (2, 15, 3)).astype(np.float32)
    back = K.flip_keypoints(K.flip_keypoints(kps, 100), 100)
    np.testing.assert_allclose(back, kps, atol=1e-5)


def test_heatmap_decode_matches_oracle():
    rng = np.random.default_rng(1)
    hm = rng.normal(size=(3, 15, 56, 56)).astype(np.float32)
    rois = np.array([[10, 20, 110, 220], [0, 0, 56, 56], [5, 5, 6, 6]],
                    np.float32)
    dev = np.asarray(K.heatmaps_to_keypoints(hm, rois))
    ora = K.heatmaps_to_keypoints_numpy(hm, rois)
    np.testing.assert_allclose(dev, ora, atol=1e-4)


def test_heatmap_decode_peak_location():
    hm = np.full((1, 1, 56, 56), -5.0, np.float32)
    hm[0, 0, 28, 14] = 10.0  # py=28, px=14
    rois = np.array([[0.0, 0.0, 112.0, 112.0]], np.float32)
    out = np.asarray(K.heatmaps_to_keypoints(hm, rois))
    # bin 14 of 56 over width 112 → x = (14+0.5)*2 = 29 (±0.5 for offset)
    assert abs(out[0, 0, 0] - 29.0) <= 0.5
    assert abs(out[0, 0, 1] - 57.0) <= 0.5
    assert out[0, 0, 2] == 10.0


def test_flip_heatmaps_consistent_with_decode():
    rng = np.random.default_rng(2)
    hm = rng.normal(size=(1, 15, 56, 56)).astype(np.float32)
    rois = np.array([[0, 0, 56, 56]], np.float32)
    flipped = np.asarray(K.flip_heatmaps(hm))
    a = np.asarray(K.heatmaps_to_keypoints(hm, rois))[0]
    b = np.asarray(K.heatmaps_to_keypoints(flipped, rois))[0]
    perm = K.flip_permutation("posetrack")
    # x mirrored within the 56-wide roi (bin-center mirror), joints permuted
    np.testing.assert_allclose(b[perm, 0], 56.0 - a[:, 0], atol=0.51)


def test_oks_perfect_match():
    gt = np.zeros((1, 15, 3), np.float32)
    gt[0, :, 0] = np.arange(15) * 3
    gt[0, :, 1] = 7
    gt[0, :, 2] = 2
    pred = gt[:, :, :2].copy()
    oks = K.compute_oks(pred, gt, np.array([100.0]))
    np.testing.assert_allclose(oks, [[1.0]], atol=1e-6)
    far = pred + 1000
    oks2 = K.compute_oks(far, gt, np.array([100.0]))
    assert oks2[0, 0] < 1e-3


def test_quadratic_decode_tracks_cubic_resize_oracle():
    """The reference decodes by cv2.INTER_CUBIC-resizing the heatmap to RoI
    size then argmaxing; the in-graph quadratic sub-bin refinement must
    land close to that (and much closer than a bare-argmax decode)."""
    import cv2

    rng = np.random.default_rng(0)
    hh = 14
    roi = np.array([0.0, 0.0, 112.0, 112.0])   # 8 px per bin
    errs_quad, errs_argmax = [], []
    for trial in range(20):
        # Smooth blob with an off-grid peak.
        cy, cx = rng.uniform(3, hh - 4, 2)
        yy, xx = np.mgrid[0:hh, 0:hh]
        hm = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 4.0)
        hm = hm[None, None].astype(np.float32)

        dec = K.heatmaps_to_keypoints_numpy(hm, roi[None])
        # cv2 cubic oracle (the lineage's decode).
        big = cv2.resize(hm[0, 0], (112, 112),
                         interpolation=cv2.INTER_CUBIC)
        idx = int(np.argmax(big))
        oy, ox = divmod(idx, 112)
        ox_img = (ox + 0.5)
        oy_img = (oy + 0.5)
        errs_quad.append(np.hypot(dec[0, 0, 0] - ox_img,
                                  dec[0, 0, 1] - oy_img))
        # Bare argmax decode (bin center only).
        by, bx = np.unravel_index(np.argmax(hm[0, 0]), (hh, hh))
        errs_argmax.append(np.hypot((bx + 0.5) * 8 - ox_img,
                                    (by + 0.5) * 8 - oy_img))
    assert np.mean(errs_quad) < 0.5 * np.mean(errs_argmax)
    assert np.mean(errs_quad) < 2.0   # within 2px of the cubic oracle @8px/bin


def test_quadratic_decode_hard_bound_56():
    """VERDICT r2 #4a: hard acceptance bound for the sub-bin decode at the
    production heatmap size (56^2). Over randomized smooth heatmaps the
    quadratic refinement must stay within 1.0 px (max) of the lineage
    cv2.INTER_CUBIC-resize-then-argmax oracle at 2 px/bin — regressions in
    the decode fail loudly here."""
    import cv2

    rng = np.random.default_rng(7)
    hh = 56
    size = 112                                  # 2 px per bin
    roi = np.array([0.0, 0.0, float(size), float(size)])
    errs = []
    for trial in range(40):
        # Mixture of 1-3 smooth blobs with off-grid peaks; the sharpest
        # blob wins so the argmax bin is unambiguous.
        n_blobs = 1 + trial % 3
        hm = np.zeros((hh, hh), np.float32)
        yy, xx = np.mgrid[0:hh, 0:hh]
        for b in range(n_blobs):
            cy, cx = rng.uniform(4, hh - 5, 2)
            amp = 1.0 if b == 0 else rng.uniform(0.3, 0.7)
            sig = rng.uniform(2.0, 6.0)
            hm += amp * np.exp(
                -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sig ** 2)
            ).astype(np.float32)

        dec = K.heatmaps_to_keypoints_numpy(hm[None, None], roi[None])
        big = cv2.resize(hm, (size, size), interpolation=cv2.INTER_CUBIC)
        oy, ox = divmod(int(np.argmax(big)), size)
        errs.append(np.hypot(dec[0, 0, 0] - (ox + 0.5),
                             dec[0, 0, 1] - (oy + 0.5)))
    assert np.max(errs) < 1.0, (np.max(errs), np.mean(errs))


def test_nms_oks_suppresses_duplicates():
    """Lineage nms_oks: identical poses collapse to the higher-scored one;
    distant poses both survive."""
    rng = np.random.default_rng(3)
    base = rng.uniform(20, 80, size=(15, 2))
    far = base + 500.0
    kps = np.zeros((3, 15, 3))
    kps[0, :, :2] = base
    kps[0, :, 2] = 0.9
    kps[1, :, :2] = base + 0.5          # near-duplicate, lower score
    kps[1, :, 2] = 0.5
    kps[2, :, :2] = far
    kps[2, :, 2] = 0.7
    rois = np.array([[20.0, 20.0, 80.0, 80.0],
                     [20.0, 20.0, 80.0, 80.0],
                     [520.0, 520.0, 580.0, 580.0]])
    keep = K.nms_oks(kps, rois, thresh=0.5)
    assert keep == [0, 2]
    # Permissive threshold keeps everything.
    assert sorted(K.nms_oks(kps, rois, thresh=0.999)) == [0, 1, 2]


def test_nms_oks_suppresses_duplicates_keeps_distinct():
    """Greedy pose NMS (lineage nms_oks): an identical lower-scored pose is
    suppressed; a far-away pose survives. Areas use the +1 convention."""
    from detectandtrack_tpu.ops.keypoints import nms_oks

    rng = np.random.default_rng(0)
    base = np.zeros((15, 3))
    base[:, 0] = rng.uniform(10, 30, 15)
    base[:, 1] = rng.uniform(10, 30, 15)
    base[:, 2] = 0.9
    dup = base.copy()
    dup[:, 2] = 0.5                      # same pose, lower score
    far = base.copy()
    far[:, :2] += 200.0
    far[:, 2] = 0.7
    kps = np.stack([base, dup, far])
    rois = np.array([[10, 10, 30, 30], [10, 10, 30, 30],
                     [210, 210, 230, 230]], np.float64)
    keep = nms_oks(kps, rois, thresh=0.8)
    assert 0 in keep and 2 in keep and 1 not in keep
    # Rank order: scores 0.9 > 0.7.
    assert keep == [0, 2]
