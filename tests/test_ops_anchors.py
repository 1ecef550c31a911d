import numpy as np

from detectandtrack_tpu.ops.anchors import (
    fpn_anchor_fields,
    generate_anchors,
    shifted_anchor_field,
    tube_anchors,
)

# The canonical py-faster-rcnn/Detectron (Python, 0-indexed) anchor table for
# stride 16, sizes (128, 256, 512), ratios (0.5, 1, 2) — a hard parity
# fixture for the lineage enumeration (base anchor [0, 0, 15, 15]).
EXPECTED_STRIDE16 = np.array(
    [[-84., -40., 99., 55.],
     [-176., -88., 191., 103.],
     [-360., -184., 375., 199.],
     [-56., -56., 71., 71.],
     [-120., -120., 135., 135.],
     [-248., -248., 263., 263.],
     [-36., -80., 51., 95.],
     [-80., -168., 95., 183.],
     [-168., -344., 183., 359.]])


def test_classic_anchor_table():
    a = generate_anchors(16, [128, 256, 512], [0.5, 1.0, 2.0])
    np.testing.assert_allclose(a, EXPECTED_STRIDE16)


def test_shifted_field_layout():
    cell = generate_anchors(16, [128], [1.0])        # A=1
    field = shifted_anchor_field(cell, 16, 2, 3)     # H=2, W=3
    assert field.shape == (6, 4)
    # row-major y, x: second anchor shifted +16 in x
    np.testing.assert_allclose(field[1] - field[0], [16, 0, 16, 0])
    # fourth anchor starts second row: +16 in y
    np.testing.assert_allclose(field[3] - field[0], [0, 16, 0, 16])


def test_fpn_fields_counts():
    fields, strides = fpn_anchor_fields(
        (32, 64, 128, 256, 512), (0.5, 1.0, 2.0), 2, 6, (64, 96))
    assert strides == (4, 8, 16, 32, 64)
    assert fields[0].shape == (16 * 24 * 3, 4)
    assert fields[-1].shape == (1 * 2 * 3, 4)


def test_tube_anchors_replicate():
    cell = generate_anchors(16, [128], [1.0])
    tube = tube_anchors(cell, 3)
    assert tube.shape == (1, 12)
    np.testing.assert_allclose(tube[0, :4], tube[0, 4:8])
    np.testing.assert_allclose(tube[0, :4], tube[0, 8:12])
