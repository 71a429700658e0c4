import jax.numpy as jnp
import numpy as np
import pytest

from yolov7_d2_tpu.ops.iou import (
    elementwise_box_iou,
    iou_loss,
    pairwise_box_iou,
    pairwise_generalized_box_iou,
)
from yolov7_d2_tpu.structures.boxes import (
    BoxMode,
    box_area,
    clip_boxes,
    convert_box_mode,
    cxcywh_to_xyxy,
    xyxy_to_cxcywh,
)


def test_cxcywh_roundtrip():
    boxes = jnp.array([[10.0, 20.0, 4.0, 6.0], [0.0, 0.0, 2.0, 2.0]])
    xyxy = cxcywh_to_xyxy(boxes)
    np.testing.assert_allclose(
        np.asarray(xyxy), [[8, 17, 12, 23], [-1, -1, 1, 1]]
    )
    np.testing.assert_allclose(np.asarray(xyxy_to_cxcywh(xyxy)), np.asarray(boxes))


def test_center_xywh_quirk_mode():
    # reference BoxModeMy.XYWH_ABS is CENTER xywh (boxes.py:452-455)
    b = jnp.array([[5.0, 5.0, 10.0, 10.0]])
    out = convert_box_mode(b, BoxMode.XYWH_ABS, BoxMode.XYXY_ABS)
    np.testing.assert_allclose(np.asarray(out), [[0, 0, 10, 10]])
    # COCO corner convention is a separate mode
    out2 = convert_box_mode(b, BoxMode.XYWH_CORNER_ABS, BoxMode.XYXY_ABS)
    np.testing.assert_allclose(np.asarray(out2), [[5, 5, 15, 15]])


def test_iou_golden():
    a = jnp.array([0.0, 0.0, 10.0, 10.0])
    b = jnp.array([5.0, 5.0, 15.0, 15.0])
    # inter = 25, union = 175
    np.testing.assert_allclose(
        float(elementwise_box_iou(a, b)), 25.0 / 175.0, rtol=1e-6
    )
    # identical
    np.testing.assert_allclose(float(elementwise_box_iou(a, a)), 1.0, rtol=1e-6)
    # disjoint
    c = jnp.array([20.0, 20.0, 30.0, 30.0])
    assert float(elementwise_box_iou(a, c)) == 0.0


def test_pairwise_shapes_and_values():
    a = jnp.array([[0.0, 0.0, 2.0, 2.0], [0.0, 0.0, 1.0, 1.0]])
    b = jnp.array([[0.0, 0.0, 2.0, 2.0]])
    iou = pairwise_box_iou(a, b)
    assert iou.shape == (2, 1)
    np.testing.assert_allclose(np.asarray(iou)[:, 0], [1.0, 0.25], rtol=1e-6)


def test_giou_disjoint_negative():
    a = jnp.array([[0.0, 0.0, 1.0, 1.0]])
    b = jnp.array([[2.0, 2.0, 3.0, 3.0]])
    giou = pairwise_generalized_box_iou(a, b)
    # iou=0, enclose=9, union=2 -> giou = -(9-2)/9
    np.testing.assert_allclose(float(giou[0, 0]), -7.0 / 9.0, rtol=1e-5)


@pytest.mark.parametrize("lt", ["iou", "linear_iou", "giou", "diou", "ciou", "siou"])
def test_iou_loss_perfect_match_near_zero(lt):
    b = jnp.array([[3.0, 4.0, 10.0, 12.0]])
    loss = iou_loss(b, b, loss_type=lt)
    assert float(loss[0]) < 1e-4


@pytest.mark.parametrize("lt", ["iou", "giou", "diou", "ciou", "siou"])
def test_iou_loss_orders_by_overlap(lt):
    target = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    near = jnp.array([[1.0, 1.0, 11.0, 11.0]])
    far = jnp.array([[8.0, 8.0, 18.0, 18.0]])
    assert float(iou_loss(near, target, loss_type=lt)[0]) < float(
        iou_loss(far, target, loss_type=lt)[0]
    )


def test_area_and_clip():
    b = jnp.array([[-5.0, -5.0, 5.0, 15.0]])
    np.testing.assert_allclose(float(box_area(b)[0]), 200.0)
    clipped = clip_boxes(b, 10.0, 10.0)
    np.testing.assert_allclose(np.asarray(clipped), [[0, 0, 5, 10]])
    # degenerate box area clamps to 0
    d = jnp.array([[5.0, 5.0, 1.0, 1.0]])
    assert float(box_area(d)[0]) == 0.0


def test_siou_finite_at_extreme_scales_and_alignments():
    """arcsin-domain robustness: axis-aligned centers at large coordinate
    magnitudes (where sqrt rounding can push |ch|/sigma past 1) and huge
    exp-decoded early-training boxes must give finite loss AND gradients."""
    import jax
    from yolov7_d2_tpu.ops.iou import iou_loss

    pred = jnp.asarray([
        [0.0, 0.0, 1e4, 1e4],            # huge early-training box
        [5000.0, 5000.0, 5008.0, 5008.0],  # large-magnitude coords
        [100.0, 100.0, 140.0, 140.0],
        [0.0, 0.0, 8.0, 8.0],
    ])
    tgt = jnp.asarray([
        [10.0, 10.0, 50.0, 50.0],
        [5000.0, 4000.0, 5008.0, 4008.0],  # purely vertical offset
        [100.0, 900.0, 140.0, 940.0],      # s_cw ~ 0, s_ch large
        [0.0, 0.0, 8.0, 8.0],              # identical boxes
    ])

    def total(p):
        return jnp.sum(iou_loss(p, tgt, loss_type="siou"))

    val, grad = jax.value_and_grad(total)(pred)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(grad)))
