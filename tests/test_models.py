import numpy as np
import jax
import jax.numpy as jnp
import pytest

from detectandtrack_tpu.core.config import load_cfg
from detectandtrack_tpu.models.backbone import ConvAffine, ResNet
from detectandtrack_tpu.models.detector import build_model
from detectandtrack_tpu.models.fpn import FPN, upsample_nearest_2x
from detectandtrack_tpu.models.inflate import inflate_params


def test_backbone_shapes_2d():
    m = ResNet(depth="resnet18")
    x = jnp.zeros((1, 1, 64, 96, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    feats = m.apply(params, x)
    assert feats["res2"].shape == (1, 1, 16, 24, 64)
    assert feats["res3"].shape == (1, 1, 8, 12, 128)
    assert feats["res4"].shape == (1, 1, 4, 6, 256)
    assert feats["res5"].shape == (1, 1, 2, 3, 512)


def test_backbone_bottleneck_channels():
    m = ResNet(depth="resnet50")
    x = jnp.zeros((1, 1, 64, 64, 3))
    shapes = jax.eval_shape(
        lambda: m.init(jax.random.PRNGKey(0), x))
    # res5 bottleneck output: 512 * 4
    feats = jax.eval_shape(
        lambda p: m.apply(p, x), shapes)
    assert feats["res5"].shape == (1, 1, 2, 2, 2048)


def test_backbone_resnext_groups():
    """ResNeXt (RESNETS.NUM_GROUPS > 1, reference lib/modeling/ResNet.py
    dim_inner = num_groups * width_per_group): stage outputs keep the plain
    256·2^s channel plan while the grouped 3x3 kernels shrink their
    in-channel axis to inner/groups."""
    m = ResNet(depth="resnet50", num_groups=4, width_per_group=4)
    x = jnp.zeros((1, 1, 32, 32, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    feats = m.apply(params, x)
    # Output channel plan unchanged vs plain ResNet (FPN/head compatible).
    assert feats["res2"].shape[-1] == 256
    assert feats["res5"].shape[-1] == 2048
    p = params["params"]
    # res2 inner width = 4 groups * 4 = 16; grouped kernel in-ch = 16/4 = 4.
    assert p["res2_0"]["b"]["conv"]["kernel"].shape == (1, 3, 3, 4, 16)
    assert p["res2_0"]["a"]["conv"]["kernel"].shape[-1] == 16
    # Grouped conv == block-diagonal dense conv: zero out cross-group
    # input channels of a dense kernel and compare.
    from detectandtrack_tpu.models.backbone import Conv3d
    rng = np.random.default_rng(1)
    xin = jnp.asarray(rng.normal(size=(1, 1, 8, 8, 8)), jnp.float32)
    gconv = Conv3d(8, (1, 3, 3), groups=2)
    gp = gconv.init(jax.random.PRNGKey(2), xin)
    gk = gp["params"]["kernel"]                       # (1,3,3,4,8)
    dense = np.zeros((1, 3, 3, 8, 8), np.float32)
    dense[..., :4, :4] = np.asarray(gk[..., :4])
    dense[..., 4:, 4:] = np.asarray(gk[..., 4:])
    dconv = Conv3d(8, (1, 3, 3), groups=1)
    out_g = gconv.apply(gp, xin)
    out_d = dconv.apply({"params": {"kernel": jnp.asarray(dense)}}, xin)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_d),
                               atol=1e-5)


def test_resnext_cfg_validation():
    with pytest.raises(ValueError, match="bottleneck"):
        load_cfg(opts=["MODEL.CONV_BODY", "resnet18",
                       "RESNETS.NUM_GROUPS", 2])


def test_t1_conv_is_per_frame():
    """A t=1 network on a T=3 clip == the same net run per frame."""
    m = ResNet(depth="resnet18")
    rng = np.random.default_rng(0)
    clip = jnp.asarray(rng.normal(size=(1, 3, 32, 32, 3)), jnp.float32)
    params = m.init(jax.random.PRNGKey(1), clip[:, :1])
    whole = m.apply(params, clip)["res3"]
    per_frame = [m.apply(params, clip[:, i:i + 1])["res3"]
                 for i in range(3)]
    for i in range(3):
        np.testing.assert_allclose(np.asarray(whole[:, i]),
                                   np.asarray(per_frame[i][:, 0]),
                                   atol=1e-5)


def test_inflation_identity_on_constant_clip():
    """Mean-inflated t=3 conv reproduces the 2D output on a time-constant
    clip (paper §3.1 property), away from the temporal padding boundary."""
    m2 = ConvAffine(16, kernel=(1, 3, 3))
    m3 = ConvAffine(16, kernel=(3, 3, 3))
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.normal(size=(1, 1, 16, 16, 8)), jnp.float32)
    clip = jnp.tile(frame, (1, 5, 1, 1, 1))
    p2 = m2.init(jax.random.PRNGKey(0), frame)
    p3_tmpl = m3.init(jax.random.PRNGKey(1), clip)
    p3 = inflate_params(p2, p3_tmpl, mode="mean")
    out2 = m2.apply(p2, frame)
    out3 = m3.apply(p3, clip)
    # Center frames see a full temporal window → exact match.
    for t in (1, 2, 3):
        np.testing.assert_allclose(np.asarray(out3[:, t]),
                                   np.asarray(out2[:, 0]), atol=1e-5)
    # Boundary frames see zero padding → reduced magnitude, not equal.
    assert not np.allclose(np.asarray(out3[:, 0]), np.asarray(out2[:, 0]),
                           atol=1e-3)


def test_inflation_center_mode():
    m2 = ConvAffine(4, kernel=(1, 3, 3))
    m3 = ConvAffine(4, kernel=(3, 3, 3))
    frame = jnp.ones((1, 1, 8, 8, 2))
    clip = jnp.tile(frame, (1, 3, 1, 1, 1))
    p2 = m2.init(jax.random.PRNGKey(0), frame)
    p3 = inflate_params(p2, m3.init(jax.random.PRNGKey(1), clip),
                        mode="center")
    k3 = p3["params"]["conv"]["kernel"]
    assert np.abs(np.asarray(k3[0])).sum() == 0
    assert np.abs(np.asarray(k3[2])).sum() == 0
    np.testing.assert_allclose(np.asarray(k3[1]),
                               np.asarray(p2["params"]["conv"]["kernel"][0]))


def test_inflation_rejects_mismatched_tree():
    m2 = ConvAffine(4, kernel=(1, 3, 3))
    m3 = ConvAffine(8, kernel=(3, 3, 3))
    frame = jnp.ones((1, 1, 8, 8, 2))
    clip = jnp.tile(frame, (1, 3, 1, 1, 1))
    p2 = m2.init(jax.random.PRNGKey(0), frame)
    p3 = m3.init(jax.random.PRNGKey(1), clip)
    with pytest.raises(ValueError, match="Cannot inflate"):
        inflate_params(p2, p3)


def test_upsample_nearest():
    x = jnp.arange(4.0).reshape(1, 1, 2, 2, 1)
    y = np.asarray(upsample_nearest_2x(x))[0, 0, :, :, 0]
    np.testing.assert_allclose(
        y, [[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]])


def test_fpn_shapes():
    m = FPN(dim=32)
    feats = {f"res{i + 2}": jnp.zeros((1, 1, 32 // 2 ** i, 32 // 2 ** i,
                                       16 * 2 ** i))
             for i in range(4)}
    params = m.init(jax.random.PRNGKey(0), feats)
    out = m.apply(params, feats)
    assert out["p2"].shape == (1, 1, 32, 32, 32)
    assert out["p5"].shape == (1, 1, 4, 4, 32)
    assert out["p6"].shape == (1, 1, 2, 2, 32)


TINY_OPTS = [
    "MODEL.CONV_BODY", "resnet18",
    "MODEL.COMPUTE_DTYPE", "float32",
    "RPN.PRE_NMS_TOP_N_TEST", 50,
    "RPN.POST_NMS_TOP_N_TEST", 20,
    "TEST.DETECTIONS_PER_IM", 5,
    "TEST.SCORE_THRESH", -1.0,
]


@pytest.mark.slow
def test_detector_2d_end_to_end():
    cfg = load_cfg(opts=TINY_OPTS)
    model = build_model(cfg)
    clip = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 1, 64, 64, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), clip)
    out = model.apply(params, clip)
    assert out["boxes"].shape == (1, 5, 4)
    assert out["keypoints"].shape == (1, 5, 1, 15, 4)
    assert np.isfinite(np.asarray(out["scores"])).all()


@pytest.mark.slow
def test_detector_3d_tubes_end_to_end():
    cfg = load_cfg(opts=TINY_OPTS + [
        "VIDEO.VIDEO_ON", True,
        "VIDEO.NUM_FRAMES", 3,
    ])
    model = build_model(cfg)
    clip = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 3, 64, 64, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), clip)
    out = model.apply(params, clip)
    assert out["boxes"].shape == (1, 5, 12)          # 4·T
    assert out["proposals"].shape == (1, 20, 12)
    assert out["keypoints"].shape == (1, 5, 3, 15, 4)


@pytest.mark.slow
def test_detector_c4_no_fpn():
    """C4 family: RPN + pooling on res4 (stride 16), res5 box head."""
    cfg = load_cfg(opts=TINY_OPTS + [
        "FPN.FPN_ON", False,
        "FAST_RCNN.ROI_BOX_HEAD", "res5_head",
        "FAST_RCNN.ROI_XFORM_RESOLUTION", 14,
        "MODEL.KEYPOINTS_ON", False,
    ])
    model = build_model(cfg)
    clip = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 1, 64, 64, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), clip)
    out = model.apply(params, clip)
    assert out["boxes"].shape == (1, 5, 4)
    assert np.isfinite(np.asarray(out["scores"])).all()


@pytest.mark.slow
def test_detector_center_frame_keypoints():
    """VIDEO.PREDICT_ALL_FRAMES=false: keypoints computed on the center
    frame only, broadcast to the (B, D, T, K, 4) contract."""
    cfg = load_cfg(opts=TINY_OPTS + [
        "VIDEO.VIDEO_ON", True,
        "VIDEO.NUM_FRAMES", 3,
        "VIDEO.PREDICT_ALL_FRAMES", False,
    ])
    model = build_model(cfg)
    clip = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 3, 64, 64, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), clip)
    out = model.apply(params, clip)
    kps = np.asarray(out["keypoints"])
    assert kps.shape == (1, 5, 3, 15, 4)
    # all frames carry the center-frame pose
    np.testing.assert_allclose(kps[:, :, 0], kps[:, :, 1])
    np.testing.assert_allclose(kps[:, :, 2], kps[:, :, 1])


@pytest.mark.slow
def test_detector_soft_nms():
    cfg = load_cfg(opts=TINY_OPTS + [
        "TEST.SOFT_NMS_ENABLED", True,
        "MODEL.KEYPOINTS_ON", False,
    ])
    model = build_model(cfg)
    clip = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 1, 64, 64, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), clip)
    out = model.apply(params, clip)
    assert np.isfinite(np.asarray(out["scores"])).all()


@pytest.mark.slow
def test_detector_keypoint_budget():
    """KRCNN.MAX_ROIS_PER_IM limits the kps head to top-M detections."""
    cfg = load_cfg(opts=TINY_OPTS + ["KRCNN.MAX_ROIS_PER_IM", 2])
    model = build_model(cfg)
    clip = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 1, 64, 64, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), clip)
    out = model.apply(params, clip)
    kps = np.asarray(out["keypoints"])
    assert kps.shape == (1, 5, 1, 15, 4)
    assert np.abs(kps[:, 2:]).sum() == 0       # beyond budget: zero-padded
    assert np.abs(kps[:, :2]).sum() > 0


def test_detector_dilated_c5():
    """RES5_DILATION=2 (C4 family): the res5 box head keeps the pooled
    resolution (stride 1, dilated 3x3s) — lineage dilated-C5 geometry."""
    cfg = load_cfg("configs/video/2d_R50_dilatedC5_kps.yaml", [
        "MODEL.COMPUTE_DTYPE", "float32",
        "RPN.PRE_NMS_TOP_N_TEST", 32,
        "RPN.POST_NMS_TOP_N_TEST", 8,
        "TEST.DETECTIONS_PER_IM", 4,
        "KRCNN.NUM_STACKED_CONVS", 2,
        "KRCNN.CONV_HEAD_DIM", 32,
        "KRCNN.MAX_ROIS_PER_IM", 0,
        "TEST.SHAPE_BUCKETS", "[[64, 64]]",
        "TRAIN.DATASETS", "[]", "TEST.DATASETS", "[]",
    ])
    model = build_model(cfg)
    clip = jnp.zeros((1, 1, 64, 64, 3))
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), clip))
    # stride-1 res5_0: the proj conv maps 1024 -> 2048 without downsampling;
    # presence of dilated kernels is structural, just check the tree exists
    assert "res5_0" in shapes["params"]["box_head"]
    out = jax.eval_shape(
        lambda p: model.apply(p, clip), shapes)
    assert out["boxes"].shape == (1, 4, 4)


@pytest.mark.parametrize("conv1_impl", ["timefold", "inshift", "pallas"])
@pytest.mark.parametrize("s2d_impl", ["fold", "reshape", "slices"])
def test_conv1_space_to_depth_exact(conv1_impl, s2d_impl, monkeypatch):
    """Conv1S2D (2x2 space-to-depth + 4x4/s1 scattered kernel) must equal
    the plain 7x7/s2 conv1 bitwise-close, sharing the SAME param tree —
    for EVERY env-selected decomposition (DAT_CONV1_IMPL × DAT_S2D_IMPL),
    so an on-chip A/B never trades speed for a silent numeric change."""
    from detectandtrack_tpu.models.backbone import Conv1S2D
    monkeypatch.setenv("DAT_CONV1_IMPL", conv1_impl)
    monkeypatch.setenv("DAT_S2D_IMPL", s2d_impl)
    rng = np.random.default_rng(3)
    for t, T in ((1, 1), (3, 4)):
        x = jnp.asarray(rng.normal(size=(2, T, 32, 48, 3)), jnp.float32)
        plain = ConvAffine(64, (t, 7, 7), (1, 2, 2))
        s2d = Conv1S2D(time_kernel=t)
        p = s2d.init(jax.random.PRNGKey(0), x)
        # param tree is interchangeable between the two modules
        rngp = jax.random.normal(jax.random.PRNGKey(1),
                                 p["params"]["conv"]["kernel"].shape)
        p = jax.tree.map(lambda a: a, p)
        p["params"]["conv"]["kernel"] = rngp
        out_plain = plain.apply(p, x)
        out_s2d = s2d.apply(p, x)
        assert out_plain.shape == out_s2d.shape == (2, T, 16, 24, 64)
        np.testing.assert_allclose(np.asarray(out_plain),
                                   np.asarray(out_s2d), atol=1e-4)
    # odd spatial size falls back to the plain path (still correct)
    x = jnp.asarray(rng.normal(size=(1, 1, 31, 33, 3)), jnp.float32)
    s2d = Conv1S2D(time_kernel=1)
    p = s2d.init(jax.random.PRNGKey(0), x)
    assert s2d.apply(p, x).shape == (1, 1, 16, 17, 64)


@pytest.mark.parametrize("tconv_impl", ["auto", "inshift", "outshift",
                                        "timefold", "native5d"])
def test_temporal_conv_shift_decomposition_exact(tconv_impl, monkeypatch):
    """Every t>1 temporal-conv decomposition (DAT_TEMPORAL_CONV) == the
    direct 5-D conv, including temporal dilation (DILATE_TIME), spatial
    stride, and grouped convs (timefold falls back to inshift for
    groups>1 — grouped kernels are block-diagonal over cin)."""
    from detectandtrack_tpu.models.backbone import Conv3d
    monkeypatch.setenv("DAT_TEMPORAL_CONV", tconv_impl)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 5, 12, 16, 6)), jnp.float32)
    for tdil, sstr, grp in ((1, 1, 1), (2, 1, 1), (1, 2, 1), (1, 1, 2),
                            (2, 2, 2)):
        m = Conv3d(8, (3, 3, 3), (1, sstr, sstr),
                   dilation=(tdil, 1, 1), groups=grp)
        p = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(p, x)
        k = p["params"]["kernel"]
        pads = [(((kk - 1) * d) // 2, ((kk - 1) * d + 1) // 2)
                for kk, d in zip((3, 3, 3), (tdil, 1, 1))]
        ref = jax.lax.conv_general_dilated(
            x, k, (1, sstr, sstr), pads, rhs_dilation=(tdil, 1, 1),
            dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
            feature_group_count=grp)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, err_msg=f"tdil={tdil} g={grp}")


@pytest.mark.slow
def test_detect_tta_flip_equivariance():
    """In-graph flip TTA: detect_tta(mirror(clip)) must return the mirrored
    detections of detect_tta(clip). The two runs see the SAME two pyramids
    (original + mirrored) with pass roles swapped, so the union + heatmap
    average is symmetric by construction — a plumbing error (wrong unflip,
    wrong joint permutation, misaligned heatmap mirror) breaks this."""
    from detectandtrack_tpu.engine.augment import (_unflip_boxes,
                                                   _unflip_keypoints)
    from detectandtrack_tpu.models.detector import GeneralizedRCNN
    cfg = load_cfg(opts=TINY_OPTS)
    model = build_model(cfg)
    w_img = 96.0
    clip = jnp.asarray(
        np.random.default_rng(3).normal(size=(1, 1, 64, 96, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), clip)
    out = model.apply(params, clip, method=GeneralizedRCNN.detect_tta)
    out_m = model.apply(params, clip[:, :, :, ::-1],
                        method=GeneralizedRCNN.detect_tta)
    v = np.asarray(out["valid"][0])
    vm = np.asarray(out_m["valid"][0])
    assert v.sum() > 0
    assert (v == vm).all()
    np.testing.assert_allclose(np.asarray(out_m["scores"][0])[v],
                               np.asarray(out["scores"][0])[v], atol=1e-4)
    boxes = np.asarray(out["boxes"][0], np.float64)
    boxes_m = _unflip_boxes(np.asarray(out_m["boxes"][0], np.float64),
                            w_img)
    np.testing.assert_allclose(boxes_m[v], boxes[v], atol=0.05)
    kps = np.asarray(out["keypoints"][0], np.float64)      # (D, T, K, 4)
    kps_m = _unflip_keypoints(
        np.asarray(out_m["keypoints"][0], np.float64), w_img)
    np.testing.assert_allclose(kps_m[v][..., 0], kps[v][..., 0], atol=0.05)
    np.testing.assert_allclose(kps_m[v][..., 1], kps[v][..., 1], atol=0.05)
    np.testing.assert_allclose(kps_m[v][..., 3], kps[v][..., 3], atol=1e-4)


@pytest.mark.slow
def test_detect_tta_single_pass_consistency():
    """TTA outputs stay on the contract shapes and are finite; the TTA
    detection set must score >= the plain pass's top score (the union
    includes every plain-pass candidate)."""
    from detectandtrack_tpu.models.detector import GeneralizedRCNN
    cfg = load_cfg(opts=TINY_OPTS)
    model = build_model(cfg)
    clip = jnp.asarray(
        np.random.default_rng(4).normal(size=(1, 1, 64, 96, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), clip)
    plain = model.apply(params, clip)
    tta = model.apply(params, clip, method=GeneralizedRCNN.detect_tta)
    assert tta["boxes"].shape == plain["boxes"].shape
    assert tta["keypoints"].shape == plain["keypoints"].shape
    assert np.isfinite(np.asarray(tta["scores"])).all()
    assert (np.asarray(tta["scores"]).max()
            >= np.asarray(plain["scores"]).max() - 1e-5)


@pytest.mark.slow
def test_detect_with_proposals_precomputed():
    """Precomputed-proposals inference (lineage proposal-files path): the
    supplied tubes drive the RoI heads — with run_rpn=False the RPN is
    skipped; with run_rpn=True the full graph runs but detections must be
    IDENTICAL (the runtime select always picks the supplied tubes)."""
    cfg = load_cfg(opts=TINY_OPTS + [
        "VIDEO.VIDEO_ON", True,
        "VIDEO.NUM_FRAMES", 2,
    ])
    model = build_model(cfg)
    rng = np.random.default_rng(1)
    clip = jnp.asarray(rng.normal(size=(1, 2, 64, 64, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), clip)

    k = cfg.RPN.POST_NMS_TOP_N_TEST
    base = rng.uniform(4, 28, size=(1, k, 1, 4)).astype(np.float32)
    tubes = np.tile(base, (1, 1, 2, 1)).reshape(1, k, 8)
    tubes[..., 2::4] = tubes[..., 0::4] + rng.uniform(8, 24, size=(1, k, 2))
    tubes[..., 3::4] = tubes[..., 1::4] + rng.uniform(8, 24, size=(1, k, 2))
    tubes = jnp.asarray(tubes)

    out_norpn = model.apply(params, clip, tubes, False,
                            method="detect_with_proposals")
    out_rpn = model.apply(params, clip, tubes, True,
                          method="detect_with_proposals")
    assert out_norpn["boxes"].shape == (1, 5, 8)
    np.testing.assert_allclose(np.asarray(out_norpn["boxes"]),
                               np.asarray(out_rpn["boxes"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_norpn["scores"]),
                               np.asarray(out_rpn["scores"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_norpn["keypoints"]),
                               np.asarray(out_rpn["keypoints"]), atol=1e-4)
    # The supplied proposals are what the graph reports back.
    np.testing.assert_allclose(np.asarray(out_rpn["proposals"]),
                               np.asarray(tubes), atol=1e-5)


def test_conv1x1_dot_path_exact(monkeypatch):
    """DAT_CONV1X1_DOT runs 1x1 convs as dot_general (TPU dots take output
    fusions; convs don't) — must be numerically equivalent to the conv
    path, including strided 1x1 (stride-on-1x1 lineage convention)."""
    from detectandtrack_tpu.models.backbone import Conv3d

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 3, 8, 12, 16)), jnp.float32)
    for strides in [(1, 1, 1), (1, 2, 2)]:
        m = Conv3d(24, (1, 1, 1), strides, dtype=jnp.float32)
        params = m.init(jax.random.PRNGKey(1), x)
        monkeypatch.setenv("DAT_CONV1X1_DOT", "0")
        y_conv = m.apply(params, x)
        monkeypatch.setenv("DAT_CONV1X1_DOT", "1")
        y_dot = m.apply(params, x)
        assert y_dot.shape == y_conv.shape
        np.testing.assert_allclose(np.asarray(y_dot), np.asarray(y_conv),
                                   atol=1e-5, rtol=1e-5)
