import dataclasses

import pytest

from detectandtrack_tpu.core.config import (
    Config,
    assert_and_infer_cfg,
    cfg_to_dict,
    load_cfg,
    merge_cfg_from_file,
    merge_cfg_from_list,
)


def test_defaults_validate():
    cfg = assert_and_infer_cfg(Config())
    assert cfg.MODEL.CONV_BODY == "resnet50"
    assert cfg.KRCNN.NUM_KEYPOINTS == 15


def test_frozen_and_hashable():
    cfg = Config()
    with pytest.raises(dataclasses.FrozenInstanceError):
        cfg.MODEL.NUM_CLASSES = 3  # type: ignore[misc]
    assert hash(cfg) == hash(Config())
    assert cfg == Config()


def test_merge_from_list():
    cfg = merge_cfg_from_list(
        Config(),
        ["MODEL.CONV_BODY", "resnet18",
         "VIDEO.VIDEO_ON", "true",
         "VIDEO.NUM_FRAMES", "3",
         "SOLVER.BASE_LR", "0.01",
         "RPN.SIZES", "[16, 32, 64, 128, 256]"],
    )
    assert cfg.MODEL.CONV_BODY == "resnet18"
    assert cfg.VIDEO.VIDEO_ON is True
    assert cfg.VIDEO.NUM_FRAMES == 3
    assert cfg.SOLVER.BASE_LR == 0.01
    assert cfg.RPN.SIZES == (16, 32, 64, 128, 256)


def test_merge_from_yaml(tmp_path):
    p = tmp_path / "exp.yaml"
    p.write_text(
        """
MODEL:
  CONV_BODY: resnet101
  KEYPOINTS_ON: true
VIDEO:
  VIDEO_ON: true
  NUM_FRAMES: 8
  TIME_KERNEL_DIM: [3, 3, 3, 3, 1]
TEST:
  SHAPE_BUCKETS: [[256, 320], [800, 1344]]
"""
    )
    cfg = merge_cfg_from_file(Config(), str(p))
    cfg = assert_and_infer_cfg(cfg)
    assert cfg.MODEL.CONV_BODY == "resnet101"
    assert cfg.VIDEO.NUM_FRAMES == 8
    assert cfg.VIDEO.TIME_KERNEL_DIM == (3, 3, 3, 3, 1)
    assert cfg.TEST.SHAPE_BUCKETS == ((256, 320), (800, 1344))


def test_unknown_key_raises():
    with pytest.raises(KeyError):
        merge_cfg_from_list(Config(), ["MODEL.NO_SUCH", 1])


def test_bad_values_raise():
    with pytest.raises(ValueError):
        load_cfg(opts=["MODEL.CONV_BODY", "vgg16"])
    with pytest.raises(ValueError):
        load_cfg(opts=["VIDEO.NUM_FRAMES", 8])  # without VIDEO_ON
    with pytest.raises(ValueError):
        load_cfg(opts=["TEST.SHAPE_BUCKETS", "[[100, 100]]"])  # not /32


def test_cfg_to_dict_roundtrip():
    d = cfg_to_dict(Config())
    assert d["MODEL"]["CONV_BODY"] == "resnet50"
    assert d["RPN"]["SIZES"] == [32, 64, 128, 256, 512]


def test_lineage_alias_snapshot_iters():
    from detectandtrack_tpu.core.config import load_cfg
    cfg = load_cfg(opts=["TRAIN.SNAPSHOT_ITERS", 777])
    assert cfg.TRAIN.CHECKPOINT_PERIOD == 777


def test_lineage_alias_test_rpn_topn():
    from detectandtrack_tpu.core.config import load_cfg
    cfg = load_cfg(opts=["TEST.RPN_PRE_NMS_TOP_N", 123,
                         "TEST.RPN_POST_NMS_TOP_N", 45])
    assert cfg.RPN.PRE_NMS_TOP_N_TEST == 123
    assert cfg.RPN.POST_NMS_TOP_N_TEST == 45


def test_alias_conflict_raises():
    import pytest
    from detectandtrack_tpu.core.config import load_cfg
    with pytest.raises(ValueError):
        load_cfg(opts=["TRAIN.SNAPSHOT_ITERS", 777,
                       "TRAIN.CHECKPOINT_PERIOD", 888])


def test_unsupported_combos_fail_loudly():
    import pytest
    from detectandtrack_tpu.core.config import load_cfg
    for opts in (
        ["MODEL.FREEZE_BN", False],
        ["SOLVER.SCALE_MOMENTUM", False],
        ["SOLVER.TYPE", "adam"],
        ["VIDEO.VIDEO_ON", True, "VIDEO.NUM_FRAMES", 2,
         "VIDEO.TIME_STRIDE_ON", True],
        ["KRCNN.USE_DECONV_OUTPUT", False],
        ["KRCNN.HEATMAP_SIZE", 48],
        ["FAST_RCNN.ROI_XFORM_METHOD", "RoIPool"],
        ["RESNETS.RES5_DILATION", 2],     # with FPN on
        ["TRAIN.RPN_ON", False],          # no precomputed-proposal path
    ):
        with pytest.raises(ValueError):
            load_cfg(opts=opts)


def test_trans_func_derived_from_depth():
    from detectandtrack_tpu.core.config import load_cfg
    assert load_cfg(opts=["MODEL.CONV_BODY", "resnet18"]
                    ).RESNETS.TRANS_FUNC == "basic"
    assert load_cfg().RESNETS.TRANS_FUNC == "bottleneck"


def test_all_shipped_configs_load_and_validate():
    """Every YAML under configs/video must pass assert_and_infer_cfg —
    a shipped experiment definition with a typo'd key or an inconsistent
    option must fail CI, not the user (reference discipline: configs are
    the experiment fixtures, SURVEY.md §4)."""
    import glob
    import os
    from detectandtrack_tpu.core.config import load_cfg
    root = os.path.join(os.path.dirname(__file__), "..", "configs", "video")
    paths = sorted(glob.glob(os.path.join(root, "*.yaml")))
    assert len(paths) >= 15
    for p in paths:
        cfg = load_cfg(p)
        assert cfg.MODEL.CONV_BODY in ("resnet18", "resnet50", "resnet101")


def test_rpn_only_rejects_tta():
    """In-graph TTA runs the RoI heads, which MODEL.RPN_ONLY never builds —
    the combination must fail loudly at config time, not as a flax missing-
    param error mid-inference."""
    with pytest.raises(ValueError, match="RPN_ONLY"):
        load_cfg(opts=["MODEL.RPN_ONLY", True,
                       "TEST.BBOX_AUG_ENABLED", True])
    with pytest.raises(ValueError, match="RPN_ONLY"):
        load_cfg(opts=["MODEL.RPN_ONLY", True,
                       "TEST.KPS_AUG_ENABLED", True])
