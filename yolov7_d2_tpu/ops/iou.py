"""IoU family: pairwise IoUs and IoU-based regression losses.

Capability parity with the reference's box-IoU surface:
  * ``bboxes_iou`` / ``pairwise_bbox_iou`` / ``generalized_box_iou``
    (/root/reference/yolov7/utils/boxes.py:57-122,755-779)
  * ``IOUloss`` (iou/giou, yolox) at boxes.py:125-168
  * ``IOUlossV6`` (ciou/diou/giou/siou, yolov6) at boxes.py:666-752

All pure jnp, broadcasting over leading dims, jit/vmap-safe. Boxes are xyxy
unless a ``fmt`` argument says otherwise.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

EPS = 1e-9


def _split(boxes):
    return boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]


def elementwise_box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU of aligned boxes ``a[..., 4]`` vs ``b[..., 4]`` (xyxy)."""
    ax0, ay0, ax1, ay1 = _split(a)
    bx0, by0, bx1, by1 = _split(b)
    iw = jnp.clip(jnp.minimum(ax1, bx1) - jnp.maximum(ax0, bx0), min=0.0)
    ih = jnp.clip(jnp.minimum(ay1, by1) - jnp.maximum(ay0, by0), min=0.0)
    inter = iw * ih
    area_a = jnp.clip(ax1 - ax0, min=0.0) * jnp.clip(ay1 - ay0, min=0.0)
    area_b = jnp.clip(bx1 - bx0, min=0.0) * jnp.clip(by1 - by0, min=0.0)
    return inter / (area_a + area_b - inter + EPS)


def pairwise_box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU: a [..., N, 4] x b [..., M, 4] -> [..., N, M] (xyxy)."""
    return elementwise_box_iou(a[..., :, None, :], b[..., None, :, :])


def pairwise_generalized_box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise GIoU (DETR matching cost), [..., N, M]."""
    a_ = a[..., :, None, :]
    b_ = b[..., None, :, :]
    iou = elementwise_box_iou(a_, b_)
    # smallest enclosing box
    ex0 = jnp.minimum(a_[..., 0], b_[..., 0])
    ey0 = jnp.minimum(a_[..., 1], b_[..., 1])
    ex1 = jnp.maximum(a_[..., 2], b_[..., 2])
    ey1 = jnp.maximum(a_[..., 3], b_[..., 3])
    enclose = jnp.clip(ex1 - ex0, min=0.0) * jnp.clip(ey1 - ey0, min=0.0)
    iw = jnp.clip(
        jnp.minimum(a_[..., 2], b_[..., 2]) - jnp.maximum(a_[..., 0], b_[..., 0]),
        min=0.0,
    )
    ih = jnp.clip(
        jnp.minimum(a_[..., 3], b_[..., 3]) - jnp.maximum(a_[..., 1], b_[..., 1]),
        min=0.0,
    )
    inter = iw * ih
    area_a = (a_[..., 2] - a_[..., 0]) * (a_[..., 3] - a_[..., 1])
    area_b = (b_[..., 2] - b_[..., 0]) * (b_[..., 3] - b_[..., 1])
    union = area_a + area_b - inter
    return iou - (enclose - union) / (enclose + EPS)


def bbox_overlaps_cxcywh(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU for center-format boxes (reference bboxes_iou xyxy=False)."""
    from yolov7_d2_tpu.structures.boxes import cxcywh_to_xyxy

    return pairwise_box_iou(cxcywh_to_xyxy(a), cxcywh_to_xyxy(b))


def _iou_terms(pred: jnp.ndarray, target: jnp.ndarray):
    """Shared terms for the extended IoU losses. Boxes are xyxy, aligned."""
    px0, py0, px1, py1 = _split(pred)
    tx0, ty0, tx1, ty1 = _split(target)
    iw = jnp.clip(jnp.minimum(px1, tx1) - jnp.maximum(px0, tx0), min=0.0)
    ih = jnp.clip(jnp.minimum(py1, ty1) - jnp.maximum(py0, ty0), min=0.0)
    inter = iw * ih
    pw, ph = px1 - px0, py1 - py0
    tw, th = tx1 - tx0, ty1 - ty0
    union = pw * ph + tw * th - inter + EPS
    iou = inter / union
    # enclosing box
    cw = jnp.maximum(px1, tx1) - jnp.minimum(px0, tx0)
    ch = jnp.maximum(py1, ty1) - jnp.minimum(py0, ty0)
    return iou, (pw, ph, tw, th), (cw, ch), (px0, py0, px1, py1, tx0, ty0, tx1, ty1)


def iou_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    loss_type: str = "iou",
) -> jnp.ndarray:
    """Aligned-box IoU loss family; xyxy inputs, returns per-box loss.

    ``iou``: 1 - iou^2 (the reference YOLOX IOUloss squares the IoU)
    ``giou``/``diou``/``ciou``/``siou``: 1 - {g,d,c,s}iou.
    """
    iou, (pw, ph, tw, th), (cw, ch), coords = _iou_terms(pred, target)
    px0, py0, px1, py1, tx0, ty0, tx1, ty1 = coords

    if loss_type == "iou":
        return 1.0 - iou * iou
    if loss_type == "linear_iou":
        return 1.0 - iou
    if loss_type == "giou":
        inter = iou * (pw * ph + tw * th) / (1.0 + iou)  # recover union*iou
        union = pw * ph + tw * th - inter + EPS
        enclose = cw * ch + EPS
        giou = iou - (enclose - union) / enclose
        return 1.0 - jnp.clip(giou, -1.0, 1.0)

    # center distances for diou/ciou
    pcx, pcy = (px0 + px1) * 0.5, (py0 + py1) * 0.5
    tcx, tcy = (tx0 + tx1) * 0.5, (ty0 + ty1) * 0.5
    rho2 = (pcx - tcx) ** 2 + (pcy - tcy) ** 2
    c2 = cw**2 + ch**2 + EPS

    if loss_type == "diou":
        return 1.0 - (iou - rho2 / c2)
    if loss_type == "ciou":
        v = (4.0 / math.pi**2) * (
            jnp.arctan(tw / (th + EPS)) - jnp.arctan(pw / (ph + EPS))
        ) ** 2
        alpha = v / (1.0 - iou + v + EPS)
        # alpha is a gradient-free weighting in the standard CIoU formulation
        import jax

        alpha = jax.lax.stop_gradient(alpha)
        return 1.0 - (iou - rho2 / c2 - alpha * v)
    if loss_type == "siou":
        # SCYLLA-IoU (YOLOv6 reference IOUlossV6 'siou', boxes.py:722-746)
        s_cw = (tcx - pcx) + EPS
        s_ch = (tcy - pcy) + EPS
        sigma = jnp.sqrt(s_cw**2 + s_ch**2) + EPS
        # f32 rounding can give sqrt(cw^2+ch^2) < |ch| by ~1 ulp at large
        # coordinate magnitudes (ulp(1e3) ~ 6e-5 dwarfs the 1e-9 eps), so
        # the ratio can land just past 1 and arcsin returns NaN — clip to
        # the closed interval (observed as train-loss NaN on the chip with
        # YOLOv6's exp-decoded early-training boxes).
        sin_alpha = jnp.clip(jnp.abs(s_ch) / sigma, 0.0, 1.0)
        sin_beta = jnp.clip(jnp.abs(s_cw) / sigma, 0.0, 1.0)
        sin_alpha = jnp.where(sin_alpha > math.sqrt(0.5), sin_beta, sin_alpha)
        angle_cost = jnp.cos(2.0 * (jnp.arcsin(sin_alpha) - math.pi / 4.0))
        rho_x = (s_cw / (cw + EPS)) ** 2
        rho_y = (s_ch / (ch + EPS)) ** 2
        gamma = 2.0 - angle_cost
        dist_cost = (1.0 - jnp.exp(-gamma * rho_x)) + (1.0 - jnp.exp(-gamma * rho_y))
        omega_w = jnp.abs(pw - tw) / (jnp.maximum(pw, tw) + EPS)
        omega_h = jnp.abs(ph - th) / (jnp.maximum(ph, th) + EPS)
        shape_cost = (1.0 - jnp.exp(-omega_w)) ** 4 + (1.0 - jnp.exp(-omega_h)) ** 4
        return 1.0 - iou + 0.5 * (dist_cost + shape_cost)
    raise ValueError(f"Unknown iou loss type: {loss_type}")
