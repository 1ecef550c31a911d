import jax
import jax.numpy as jnp
import numpy as np

from detectandtrack_tpu.engine import losses as L
from detectandtrack_tpu.engine import targets as T


def _anchors_grid():
    xs, ys = np.meshgrid(np.arange(0, 64, 8), np.arange(0, 64, 8))
    a = np.stack([xs.ravel(), ys.ravel(), xs.ravel() + 15, ys.ravel() + 15],
                 axis=1).astype(np.float32)
    return jnp.asarray(a)


def test_rpn_targets_basic():
    anchors = _anchors_grid()
    gt = jnp.asarray([[8.0, 8.0, 23.0, 23.0]])      # aligns with an anchor
    tgt = T.rpn_targets(
        jax.random.PRNGKey(0), anchors, gt, jnp.asarray([True]),
        num_frames=1, image_hw=(64.0, 64.0),
        positive_overlap=0.7, negative_overlap=0.3,
        batch_size=16, fg_fraction=0.5)
    labels = np.asarray(tgt.labels)
    assert (labels == 1).sum() >= 1
    assert (labels == 0).sum() >= 1
    assert (labels >= 0).sum() <= 16
    # the perfectly-matching anchor must be fg
    perfect = np.where((np.asarray(anchors) ==
                        np.array([8, 8, 23, 23])).all(1))[0][0]
    assert labels[perfect] == 1
    # its regression target is ~zero
    np.testing.assert_allclose(np.asarray(tgt.bbox_targets)[perfect], 0,
                               atol=1e-5)


def test_rpn_targets_no_gt_all_bg():
    anchors = _anchors_grid()
    gt = jnp.zeros((2, 4))
    tgt = T.rpn_targets(
        jax.random.PRNGKey(0), anchors, gt, jnp.asarray([False, False]),
        num_frames=1, image_hw=(64.0, 64.0),
        batch_size=16, fg_fraction=0.5)
    labels = np.asarray(tgt.labels)
    assert (labels == 1).sum() == 0
    assert (labels == 0).sum() > 0


def test_proposal_targets_gt_included_and_fg_first():
    props = jnp.asarray([[0.0, 0.0, 10.0, 10.0],
                         [40.0, 40.0, 60.0, 60.0]])
    gt = jnp.asarray([[40.0, 40.0, 61.0, 61.0]])
    gtk = jnp.ones((1, 1, 15, 3))
    tgt = T.proposal_targets(
        jax.random.PRNGKey(0), props, jnp.ones(2, bool), gt, gtk,
        jnp.asarray([True]), num_frames=1, batch_size=4, fg_fraction=0.5)
    labels = np.asarray(tgt.labels)
    is_fg = np.asarray(tgt.is_fg)
    # fg rows sorted first
    assert is_fg[0]
    assert labels[0] == 1
    # one fg is the overlapping proposal or the GT box itself
    rois = np.asarray(tgt.rois)
    assert any(np.allclose(rois[i], [40, 40, 61, 61], atol=1.5) or
               np.allclose(rois[i], [40, 40, 60, 60], atol=1.5)
               for i in range(is_fg.sum()))


def test_keypoint_heatmap_targets_inside_outside():
    rois = jnp.asarray([[0.0, 0.0, 56.0, 56.0]])
    kps = jnp.asarray([[[28.0, 28.0, 2.0],      # center, visible
                        [100.0, 28.0, 2.0],     # outside roi
                        [28.0, 28.0, 0.0]]])    # invisible
    idx, w = T.keypoint_heatmap_targets(rois, kps, heatmap_size=56)
    idx, w = np.asarray(idx), np.asarray(w)
    assert w.tolist() == [[1.0, 0.0, 0.0]]
    assert idx[0, 0] == 28 * 56 + 28


def test_smooth_l1_values():
    pred = jnp.asarray([0.0, 0.0])
    tgt = jnp.asarray([0.5, 2.0])
    out = np.asarray(L.smooth_l1(pred, tgt, beta=1.0))
    np.testing.assert_allclose(out, [0.125, 1.5])


def test_softmax_ce_uniform():
    logits = jnp.zeros((4, 3))
    labels = jnp.asarray([0, 1, 2, 0])
    w = jnp.ones(4)
    out = float(L.softmax_ce(logits, labels, w))
    np.testing.assert_allclose(out, np.log(3), rtol=1e-5)


def test_rpn_losses_ignore_unsampled():
    logits = jnp.asarray([10.0, -10.0, 123.0])
    deltas = jnp.zeros((3, 4))
    labels = jnp.asarray([1, 0, -1])       # third ignored
    tgts = jnp.zeros((3, 4))
    cls, box = L.rpn_losses(logits, deltas, labels, tgts)
    assert float(cls) < 1e-3               # confident & correct
    assert float(box) == 0.0


def test_keypoint_loss_perfect_prediction():
    hm = jnp.full((1, 56, 56, 1), -10.0)
    hm = hm.at[0, 28, 28, 0].set(10.0)
    bins = jnp.asarray([[28 * 56 + 28]])
    w = jnp.ones((1, 1))
    loss = float(L.keypoint_loss(hm, bins, w))
    assert loss < 1e-3
    wrong_bins = jnp.asarray([[0]])
    assert float(L.keypoint_loss(hm, wrong_bins, w)) > 10


def test_fast_rcnn_losses_class_selection():
    s, c, t = 2, 2, 1
    cls_logits = jnp.asarray([[0.0, 10.0], [10.0, 0.0]])
    deltas = jnp.zeros((s, c, t, 4))
    deltas = deltas.at[0, 1].set(1.0)       # person-class deltas off by 1
    labels = jnp.asarray([1, 0])
    tgts = jnp.zeros((s, 4))
    bw = jnp.asarray([1.0, 0.0])
    valid = jnp.ones(s, bool)
    cls_l, box_l = L.fast_rcnn_losses(cls_logits, deltas, labels, tgts, bw,
                                      valid)
    assert float(cls_l) < 1e-3
    # smooth_l1(1,0)=0.5 * 4 coords / 2 valid rows = 1.0
    np.testing.assert_allclose(float(box_l), 1.0, rtol=1e-5)


def test_proposal_targets_no_gt_samples_background():
    """ADVICE r1: an image with no valid GT must still yield background
    RoIs (the lineage treats max_overlaps=0 as background)."""
    props = jnp.asarray([[0.0, 0.0, 10.0, 10.0],
                         [40.0, 40.0, 60.0, 60.0],
                         [20.0, 20.0, 30.0, 30.0]])
    gt = jnp.zeros((1, 4))
    gtk = jnp.zeros((1, 1, 15, 3))
    tgt = T.proposal_targets(
        jax.random.PRNGKey(0), props, jnp.ones(3, bool), gt, gtk,
        jnp.asarray([False]), num_frames=1, batch_size=4, fg_fraction=0.25)
    assert np.asarray(tgt.valid).sum() > 0
    assert np.asarray(tgt.is_fg).sum() == 0
    assert (np.asarray(tgt.labels)[np.asarray(tgt.valid)] == 0).all()


def test_mask_targets_identity_and_shift():
    """RoI == GT box reproduces the bitmap; a half-shifted RoI samples the
    right half plus zero padding outside the GT box."""
    m = 8
    bitmap = jnp.zeros((1, m, m)).at[0, :, :4].set(1.0)   # left half on
    gt_box = jnp.asarray([[10.0, 10.0, 26.0, 26.0]])      # 16×16
    # Identity: same box, output at the same resolution.
    out = T.mask_targets(gt_box, gt_box, bitmap, m)
    np.testing.assert_allclose(np.asarray(out)[0], np.asarray(bitmap)[0])
    # RoI = right half of the GT box → all zeros (right half is off).
    roi = jnp.asarray([[18.0, 10.0, 26.0, 26.0]])
    out = T.mask_targets(roi, gt_box, bitmap, m)
    assert np.asarray(out).sum() == 0
    # RoI = left half → all ones.
    roi = jnp.asarray([[10.0, 10.0, 18.0, 26.0]])
    out = T.mask_targets(roi, gt_box, bitmap, m)
    np.testing.assert_allclose(np.asarray(out)[0], 1.0)
    # RoI extending beyond the GT box: outside samples are zero.
    roi = jnp.asarray([[2.0, 10.0, 18.0, 26.0]])          # half outside
    out = T.mask_targets(roi, gt_box, bitmap, m)
    assert np.asarray(out)[0, :, :m // 2].sum() == 0      # left half pad
    np.testing.assert_allclose(np.asarray(out)[0, :, m // 2:], 1.0)


def test_mask_loss_perfect_and_weighting():
    logits = jnp.full((2, 4, 4), 20.0)        # confident "on"
    targets = jnp.ones((2, 4, 4))
    w = jnp.asarray([1.0, 1.0])
    assert float(L.mask_loss(logits, targets, w)) < 1e-6
    # Wrong prediction on a zero-weight row contributes nothing.
    bad = logits.at[1].set(-20.0)
    assert float(L.mask_loss(bad, targets, jnp.asarray([1.0, 0.0]))) < 1e-6
    assert float(L.mask_loss(bad, targets, w)) > 1.0
