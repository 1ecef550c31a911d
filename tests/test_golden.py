"""Golden numeric fixture: pins the detector's numerics across rounds.

VERDICT r1 missing #7: shape-only tests can't catch silent numeric drift
(a changed decode, an altered conv geometry). This test runs a fixed tiny
model (deterministic init) on a fixed clip and compares boxes / scores /
keypoints against a committed fixture.

Regenerate DELIBERATELY after an intended numeric change:
    GOLDEN_REGEN=1 python -m pytest tests/test_golden.py -q
and say why in the commit message.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detectandtrack_tpu.core.config import load_cfg
from detectandtrack_tpu.models.detector import build_model

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "golden_detect.npz")

_OPTS = [
    "MODEL.CONV_BODY", "resnet18",
    "MODEL.COMPUTE_DTYPE", "float32",
    "VIDEO.VIDEO_ON", True,
    "VIDEO.NUM_FRAMES", 2,
    "VIDEO.TIME_KERNEL_DIM", "[3, 1, 1, 1, 1]",
    "RPN.PRE_NMS_TOP_N_TEST", 64,
    "RPN.POST_NMS_TOP_N_TEST", 16,
    "TEST.DETECTIONS_PER_IM", 4,
    "TEST.SCORE_THRESH", -1.0,
    "TEST.SHAPE_BUCKETS", "[[64, 96]]",
    "KRCNN.NUM_STACKED_CONVS", 2,
    "KRCNN.CONV_HEAD_DIM", 32,
]


def _compute():
    cfg = load_cfg(opts=list(_OPTS))
    model = build_model(cfg)
    rng = np.random.default_rng(42)
    clip = jnp.asarray(rng.normal(size=(1, 2, 64, 96, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), clip)
    out = model.apply(params, clip)
    return {
        "boxes": np.asarray(out["boxes"], np.float32),
        "scores": np.asarray(out["scores"], np.float32),
        "valid": np.asarray(out["valid"]),
        "keypoints": np.asarray(out["keypoints"], np.float32),
    }


def test_golden_numeric_regression():
    got = _compute()
    if os.environ.get("GOLDEN_REGEN") or not os.path.exists(FIXTURE):
        if not os.environ.get("GOLDEN_REGEN"):
            pytest.fail(f"golden fixture missing: {FIXTURE} "
                        "(run with GOLDEN_REGEN=1 to create)")
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        np.savez(FIXTURE, **got)
        pytest.skip("golden fixture regenerated")
    exp = np.load(FIXTURE)
    np.testing.assert_array_equal(got["valid"], exp["valid"])
    np.testing.assert_allclose(got["scores"], exp["scores"],
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(got["boxes"], exp["boxes"],
                               atol=1e-2, rtol=1e-4)
    np.testing.assert_allclose(got["keypoints"], exp["keypoints"],
                               atol=1e-2, rtol=1e-4)
