"""Differential parity of the op library against the reference's own torch
functions (utils/boxes.py) — no weight porting involved, direct math."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from _torchref import ref_module  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from yolov7_d2_tpu.ops.iou import iou_loss, pairwise_box_iou  # noqa: E402


@pytest.fixture(scope="module")
def ref_boxes():
    return ref_module("yolov7.utils.boxes")


def _rand_xyxy(n, seed):
    rng = np.random.default_rng(seed)
    x0 = rng.uniform(0, 50, (n, 1))
    y0 = rng.uniform(0, 50, (n, 1))
    w = rng.uniform(5, 60, (n, 1))
    h = rng.uniform(5, 60, (n, 1))
    return np.concatenate([x0, y0, x0 + w, y0 + h], 1).astype(np.float32)


def _xyxy_to_cxcywh(b):
    return np.concatenate(
        [(b[:, :2] + b[:, 2:]) / 2, b[:, 2:] - b[:, :2]], 1
    )


def test_bboxes_iou_parity(ref_boxes):
    a = _rand_xyxy(13, 0)
    b = _rand_xyxy(7, 1)
    ref = ref_boxes.bboxes_iou(
        torch.from_numpy(a), torch.from_numpy(b), xyxy=True
    ).numpy()
    ours = np.asarray(pairwise_box_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("loss_type", ["iou"])
def test_yolox_iouloss_parity(ref_boxes, loss_type):
    """IOUloss (reference boxes.py:125): cxcywh inputs, 1-iou^2 — the loss
    YOLOX training actually uses. (The reference's 'giou' branch carries a
    quirk — :159 subtracts (area_c - area_INTERSECTION)/area_c instead of
    union — which we deliberately do not reproduce; our standard GIoU is
    parity-tested against IOUlossV6['giou'] below.)"""
    p = _xyxy_to_cxcywh(_rand_xyxy(32, 2))
    t = _xyxy_to_cxcywh(_rand_xyxy(32, 3))
    ref = ref_boxes.IOUloss(loss_type=loss_type)(
        torch.from_numpy(p), torch.from_numpy(t)
    ).numpy()
    # ours takes xyxy
    def to_xyxy(b):
        return np.concatenate(
            [b[:, :2] - b[:, 2:] / 2, b[:, :2] + b[:, 2:] / 2], 1
        )

    ours = np.asarray(
        iou_loss(jnp.asarray(to_xyxy(p)), jnp.asarray(to_xyxy(t)), loss_type)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("iou_type", ["giou", "diou", "ciou", "siou"])
def test_iouloss_v6_parity(ref_boxes, iou_type):
    """IOUlossV6 (reference boxes.py:666) returns the LOSS (1 - extended
    IoU, :746). Implementation quirk: ``box1`` must arrive TRANSPOSED
    [4, M] (the code indexes box1[0] as the x column while transposing only
    box2 — :684-689); YOLOv6's ComputeLoss calls it that way."""
    p = _rand_xyxy(64, 4)
    t = _rand_xyxy(64, 5)
    ref_loss = ref_boxes.IOUlossV6(box_format="xyxy", iou_type=iou_type)(
        torch.from_numpy(p.T), torch.from_numpy(t)
    ).numpy()
    ours = np.asarray(iou_loss(jnp.asarray(p), jnp.asarray(t), iou_type))
    np.testing.assert_allclose(ours, ref_loss, rtol=1e-3, atol=3e-4)


def test_generalized_box_iou_parity(ref_boxes):
    """generalized_box_iou (boxes.py:101) — the DETR matcher cost term."""
    from yolov7_d2_tpu.ops.iou import pairwise_generalized_box_iou

    a = _rand_xyxy(9, 6)
    b = _rand_xyxy(11, 7)
    ref = ref_boxes.generalized_box_iou(
        torch.from_numpy(a), torch.from_numpy(b)
    ).numpy()
    ours = np.asarray(
        pairwise_generalized_box_iou(jnp.asarray(a), jnp.asarray(b))
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)
