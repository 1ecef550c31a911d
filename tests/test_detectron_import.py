"""Detectron .pkl importer: name mapping, layout, inflation, head surgery.

Parity target: `lib/utils/net.initialize_gpu_from_weights_file`
(SURVEY.md §3.4). Since the reference weights are not on this machine, the
importer is validated by (a) a synthetic round-trip through the exporter,
(b) a torch cross-check of the deconv kernel semantics (Caffe2 deconv ==
torch ConvTranspose2d), and (c) surgery unit checks for the COCO-pretrained
→ PoseTrack head conversions.
"""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detectandtrack_tpu.core.config import load_cfg
from detectandtrack_tpu.models.detector import build_model
from detectandtrack_tpu.ops.keypoints import (COCO_KEYPOINTS,
                                              POSETRACK_KEYPOINTS)
from detectandtrack_tpu.utils.detectron_import import (blob_candidates,
                                                       convert_blob,
                                                       flax_params_to_blobs,
                                                       import_detectron_weights,
                                                       load_detectron_pkl,
                                                       save_detectron_pkl)

_TINY = [
    "MODEL.CONV_BODY", "resnet18",
    "MODEL.COMPUTE_DTYPE", "float32",
    "RPN.PRE_NMS_TOP_N_TEST", 64,
    "RPN.POST_NMS_TOP_N_TEST", 16,
    "TEST.DETECTIONS_PER_IM", 4,
    "KRCNN.NUM_STACKED_CONVS", 2,
    "KRCNN.CONV_HEAD_DIM", 32,
    "TEST.SHAPE_BUCKETS", "[[64, 64]]",
]


@pytest.fixture(scope="module")
def m2d():
    cfg = load_cfg(opts=list(_TINY))
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 1, 64, 64, 3)))
    return cfg, params


@pytest.fixture(scope="module")
def m3d():
    cfg = load_cfg(opts=list(_TINY) + [
        "VIDEO.VIDEO_ON", True,
        "VIDEO.NUM_FRAMES", 2,
        "VIDEO.TIME_KERNEL_DIM", "[3, 1, 1, 1, 1]",
    ])
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, 2, 64, 64, 3)))
    return cfg, params


def test_blob_name_derivation():
    assert blob_candidates(
        ("backbone", "res2_0", "a", "conv", "kernel"), "resnet50") == \
        ["res2_0_branch2a_w"]
    assert blob_candidates(
        ("backbone", "res3_1", "proj", "bn", "scale"), "resnet50") == \
        ["res3_1_branch1_bn_s"]
    assert blob_candidates(
        ("backbone", "conv1", "bn", "bias"), "resnet50") == \
        ["res_conv1_bn_b"]
    # FPN names carry the last block index of the stage (depth-dependent).
    assert blob_candidates(("fpn", "lateral_res5", "kernel"),
                           "resnet50") == ["fpn_inner_res5_2_sum_w"]
    assert blob_candidates(("fpn", "lateral_res4", "kernel"),
                           "resnet101") == \
        ["fpn_inner_res4_22_sum_lateral_w"]
    assert blob_candidates(("fpn", "posthoc_p3", "bias"),
                           "resnet50") == ["fpn_res3_3_sum_b"]
    assert "conv_rpn_fpn2_w" in blob_candidates(
        ("rpn_head", "conv", "kernel"), "resnet50")
    assert blob_candidates(("box_head", "fc6", "kernel"),
                           "resnet50") == ["fc6_w"]
    assert blob_candidates(
        ("kps_head", "kps_score_lowres", "kernel"),
        "resnet50")[0] == "kps_score_lowres_w"
    assert "_[mask]_fcn1_w" in blob_candidates(
        ("mask_head", "mask_fcn1", "kernel"), "resnet50")


def test_round_trip_2d(m2d):
    """export → import reproduces every parameter exactly (2D model)."""
    cfg, params = m2d
    blobs = flax_params_to_blobs(params, cfg)
    template = jax.tree.map(np.zeros_like, params)
    imported, report = import_detectron_weights(blobs, template, cfg,
                                                strict=True)
    assert not report["missing"]
    for (pa, a), (pb, b) in zip(jax.tree.flatten_with_path(params)[0],
                                jax.tree.flatten_with_path(imported)[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=jax.tree_util.keystr(pa))


def test_pkl_file_round_trip(m2d, tmp_path):
    cfg, params = m2d
    path = os.path.join(tmp_path, "w.pkl")
    save_detectron_pkl(path, params, cfg)
    blobs = load_detectron_pkl(path)
    assert "conv1_w" in blobs
    assert blobs["conv1_w"].shape == (64, 3, 7, 7)   # Caffe2 OIHW
    template = jax.tree.map(np.zeros_like, params)
    imported, report = import_detectron_weights(path, template, cfg,
                                                strict=True)
    assert not report["missing"]


def test_import_2d_blobs_into_3d_model(m2d, m3d):
    """2D .pkl → 3D model: mean inflation + per-frame regressor surgery."""
    cfg2, params2 = m2d
    cfg3, params3 = m3d
    blobs = flax_params_to_blobs(params2, cfg2)
    template = params3
    imported, report = import_detectron_weights(blobs, template, cfg3)
    assert not report["missing"], report["missing"]

    p2 = params2["params"]
    p3 = imported["params"]
    # conv1: (1,7,7,3,64) → (3,7,7,3,64), repeat / 3 (mean init).
    k2 = np.asarray(p2["backbone"]["conv1"]["conv"]["kernel"])
    k3 = np.asarray(p3["backbone"]["conv1"]["conv"]["kernel"])
    assert k3.shape[0] == 3
    np.testing.assert_allclose(k3, np.repeat(k2, 3, axis=0) / 3.0,
                               atol=1e-6)
    # t=1 stages copy through unchanged.
    np.testing.assert_allclose(
        np.asarray(p3["backbone"]["res2_0"]["a"]["conv"]["kernel"]),
        np.asarray(p2["backbone"]["res2_0"]["a"]["conv"]["kernel"]),
        atol=1e-6)
    # fc6: input grows P·P·C → T·P·P·C, tiled / T.
    f2 = np.asarray(p2["box_head"]["fc6"]["kernel"])
    f3 = np.asarray(p3["box_head"]["fc6"]["kernel"])
    t = 2
    assert f3.shape[0] == t * f2.shape[0]
    np.testing.assert_allclose(
        f3.reshape(t, -1, f2.shape[1]),
        np.stack([f2 / t] * t), atol=1e-6)
    # Surgery happened for the per-frame regressors.
    assert any("rpn_head/deltas" in s for s in report["surgery"])
    assert any("bbox_pred" in s for s in report["surgery"])
    # RPN deltas: frame replication of the 2D regressor.
    d2 = np.asarray(p2["rpn_head"]["deltas"]["kernel"])   # (1,1,1,C,A*4)
    d3 = np.asarray(p3["rpn_head"]["deltas"]["kernel"])   # (1,1,1,C,A*4T)
    a = d2.shape[-1] // 4
    np.testing.assert_allclose(
        d3.reshape(d3.shape[:-1] + (a, t, 4)),
        np.repeat(d2.reshape(d2.shape[:-1] + (a, 1, 4)), t, axis=-2),
        atol=1e-6)


def test_coco_head_surgery(m2d):
    """COCO-17 keypoints + 81 classes → PoseTrack-15 + 2 classes."""
    cfg, params = m2d
    blobs = flax_params_to_blobs(params, cfg)
    rng = np.random.default_rng(0)
    # Lineage USE_DECONV_OUTPUT blob: IOHW deconv (ci, K, 4, 4).
    ci = blobs["kps_score_lowres_w"].shape[0]
    blobs["kps_score_lowres_w"] = rng.normal(
        size=(ci, 17, 4, 4)).astype(np.float32)
    blobs["kps_score_lowres_b"] = rng.normal(size=(17,)).astype(np.float32)
    hid = blobs["cls_score_w"].shape[1]
    blobs["cls_score_w"] = rng.normal(size=(81, hid)).astype(np.float32)
    blobs["cls_score_b"] = rng.normal(size=(81,)).astype(np.float32)
    blobs["bbox_pred_w"] = rng.normal(size=(324, hid)).astype(np.float32)
    blobs["bbox_pred_b"] = rng.normal(size=(324,)).astype(np.float32)

    template = jax.tree.map(np.zeros_like, params)
    imported, report = import_detectron_weights(blobs, template, cfg)
    assert len(report["surgery"]) >= 4
    p = imported["params"]

    # Deconv conversion: IOHW → HWIO with spatial flip, then the joint
    # map applies on the output-channel (last) axis.
    ks = np.asarray(
        p["kps_head"]["kps_score_lowres"]["kernel"])        # (4,4,ci,15)
    src = blobs["kps_score_lowres_w"].transpose(2, 3, 0, 1)[::-1, ::-1]
    mapped = 0
    for pi, name in enumerate(POSETRACK_KEYPOINTS):
        if name in COCO_KEYPOINTS:
            ci_idx = COCO_KEYPOINTS.index(name)
            np.testing.assert_allclose(ks[..., pi], src[..., ci_idx],
                                       atol=1e-6)
            mapped += 1
        else:
            # head_bottom / head_top keep the template init (zeros here).
            np.testing.assert_array_equal(ks[..., pi], 0.0)
    assert mapped == 13

    cs = np.asarray(p["box_head"]["cls_score"]["kernel"])   # (hid, 2)
    np.testing.assert_allclose(cs[:, 0], blobs["cls_score_w"][0], atol=1e-6)
    np.testing.assert_allclose(cs[:, 1], blobs["cls_score_w"][1], atol=1e-6)

    bp = np.asarray(p["box_head"]["bbox_pred"]["kernel"])   # (hid, 8)
    src_bp = blobs["bbox_pred_w"].T.reshape(hid, 81, 4)
    np.testing.assert_allclose(bp.reshape(hid, 2, 1, 4)[:, 0, 0],
                               src_bp[:, 0], atol=1e-6)
    np.testing.assert_allclose(bp.reshape(hid, 2, 1, 4)[:, 1, 0],
                               src_bp[:, 1], atol=1e-6)


def test_deconv_semantics_vs_torch():
    """Caffe2/torch deconv(stride 2, pad 1) == flax ConvTranspose with
    padding (2,2) and the importer's flipped-transposed kernel."""
    torch = pytest.importorskip("torch")
    from flax import linen as nn

    ci, co = 3, 5
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 6, 6, ci)).astype(np.float32)
    w = rng.normal(size=(ci, co, 4, 4)).astype(np.float32)  # Caffe2 IOHW

    ref = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w),
        stride=2, padding=1).numpy().transpose(0, 2, 3, 1)

    k = convert_blob(w, ("kps_head", "kps_score_lowres", "kernel"),
                     (4, 4, ci, co))
    mod = nn.ConvTranspose(co, (4, 4), strides=(2, 2),
                           padding=((2, 2), (2, 2)), use_bias=False)
    y = mod.apply({"params": {"kernel": jnp.asarray(k)}}, jnp.asarray(x))
    assert y.shape == ref.shape
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4)


def test_round_trip_resnext():
    """Grouped (ResNeXt) conv kernels survive the export → import cycle:
    the Caffe2 layout for grouped convs is (co, ci/groups, kh, kw) and the
    transposes are shape-generic, so the round-trip must be exact."""
    cfg = load_cfg(opts=[
        "MODEL.CONV_BODY", "resnet50",
        "MODEL.COMPUTE_DTYPE", "float32",
        "RESNETS.NUM_GROUPS", 2, "RESNETS.WIDTH_PER_GROUP", 4,
        "RPN.PRE_NMS_TOP_N_TEST", 64,
        "RPN.POST_NMS_TOP_N_TEST", 16,
        "TEST.DETECTIONS_PER_IM", 4,
        "KRCNN.NUM_STACKED_CONVS", 2,
        "KRCNN.CONV_HEAD_DIM", 32,
        "TEST.SHAPE_BUCKETS", "[[64, 64]]",
    ])
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(2),
                        jnp.zeros((1, 1, 64, 64, 3)))
    # grouped kernel really has the reduced in-channel axis
    k = params["params"]["backbone"]["res2_0"]["b"]["conv"]["kernel"]
    assert k.shape[-2] == 4  # inner 8 / groups 2
    blobs = flax_params_to_blobs(params, cfg)
    template = jax.tree.map(np.zeros_like, params)
    imported, report = import_detectron_weights(blobs, template, cfg,
                                                strict=True)
    assert not report["missing"]
    for (pa, a), (_, b) in zip(jax.tree.flatten_with_path(params)[0],
                               jax.tree.flatten_with_path(imported)[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=jax.tree_util.keystr(pa))


def test_c4_video_fc_inflation():
    """Review r3: importing a 2D checkpoint into a C4 (Res5BoxHead) VIDEO
    model must inflate the cls/bbox FC input rows (T·2048 vs 2048) by
    mean-tiling instead of crashing on a broadcast mismatch."""
    cfg = load_cfg(opts=[
        "MODEL.CONV_BODY", "resnet50",
        "MODEL.COMPUTE_DTYPE", "float32",
        "MODEL.KEYPOINTS_ON", False,
        "FPN.FPN_ON", False,
        "FAST_RCNN.ROI_BOX_HEAD", "res5_head",
        "VIDEO.VIDEO_ON", True, "VIDEO.NUM_FRAMES", 3,
        "VIDEO.TIME_KERNEL_DIM", "[1, 1, 1, 1, 1]",
        "RPN.SIZES", "[32, 64, 128, 256, 512]",
        "RPN.PRE_NMS_TOP_N_TEST", 64,
        "RPN.POST_NMS_TOP_N_TEST", 16,
        "TEST.DETECTIONS_PER_IM", 4,
        "TEST.SHAPE_BUCKETS", "[[64, 64]]",
    ])
    model = build_model(cfg)
    clips = jnp.zeros((1, 3, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), clips)

    # A 2D COCO-style source: 81 classes, single-frame FC heads.
    rng = np.random.default_rng(0)
    blobs = {
        "cls_score_w": rng.normal(size=(81, 2048)).astype(np.float32),
        "cls_score_b": rng.normal(size=(81,)).astype(np.float32),
        "bbox_pred_w": rng.normal(size=(324, 2048)).astype(np.float32),
        "bbox_pred_b": rng.normal(size=(324,)).astype(np.float32),
    }
    imported, report = import_detectron_weights(blobs, params, cfg)
    assert any("FC input rows inflated" in s for s in report["surgery"])
    cs = np.asarray(imported["params"]["box_head"]["cls_score"]["kernel"])
    assert cs.shape[0] == 3 * 2048
    # Mean-tiling: identical frame features reproduce the 2D person logit.
    x2d = rng.normal(size=(2048,)).astype(np.float32)
    x3d = np.tile(x2d, 3)
    got = x3d @ cs[:, 1]
    want = x2d @ blobs["cls_score_w"][_person_row()].astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def _person_row():
    from detectandtrack_tpu.utils.detectron_import import _COCO_PERSON
    return _COCO_PERSON
