"""Anchor-based YOLO head (YOLOv3 / YOLOv5 / YOLOv7 variants).

Parity with the reference's anchor heads embedded in the meta-arch files:
  * ``YOLOHead`` + ``get_target`` (max-IoU anchor match, ignore-threshold
    objectness mask) — /root/reference/yolov7/modeling/meta_arch/yolo.py:285,403
  * YOLOv7 CIoU branch + ``get_target_yolov5`` (wh-ratio matching with
    3-neighbor-cell positives) — meta_arch/yolov7.py:390,646,753,883
  * YOLOv5 build-targets — meta_arch/yolov5.py:296.

TPU redesign: the reference builds targets with per-image python loops over
GT boxes. Here target construction is a fixed-shape scatter: every (gt,
anchor-candidate) pair gets a flat anchor index (or an overflow slot), and
``.at[idx].set`` builds the dense target maps — no dynamic shapes, vmapped
over the batch, jit/grad-safe.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from yolov7_d2_tpu.models.layers.blocks import BaseConv
from yolov7_d2_tpu.ops.iou import iou_loss, pairwise_box_iou
from yolov7_d2_tpu.ops.losses import sigmoid_binary_cross_entropy
from yolov7_d2_tpu.structures.boxes import cxcywh_to_xyxy


class AnchorYOLOHead(nn.Module):
    """Per-level: 3x3 conv tower -> 1x1 predict (3 anchors x (5 + C)).

    ``direct_pred=True`` is the YOLOV7P flavour (reference
    yolov7p.py:106-113): the per-level prediction is a single 1x1 conv
    straight off the neck output, no tower."""

    num_classes: int = 80
    num_anchors_per_level: int = 3
    act: str = "lrelu"
    direct_pred: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, feats: Sequence[jnp.ndarray], train: bool = False
    ) -> List[jnp.ndarray]:
        outs = []
        for lvl, x in enumerate(feats):
            if not self.direct_pred:
                c = x.shape[-1]
                x = BaseConv(c * 2, 3, 1, act=self.act, dtype=self.dtype,
                             name=f"tower_{lvl}")(x, train)
            x = nn.Conv(
                self.num_anchors_per_level * (5 + self.num_classes), (1, 1),
                dtype=self.dtype, param_dtype=jnp.float32,
                name=f"pred_{lvl}",
            )(x)
            outs.append(x.astype(jnp.float32))
        return outs


def flatten_anchor_outputs(
    level_outputs: Sequence[jnp.ndarray],
    anchors: Sequence[Sequence[Sequence[float]]],
    strides: Sequence[int],
) -> Dict[str, jnp.ndarray]:
    """Flatten per-level maps [B,H,W,3*(5+C)] to [B, A, 5+C] plus per-anchor
    grids/strides/anchor-wh vectors. ``anchors`` is the reference layout:
    per level, 3 (w, h) pairs in input pixels (MODEL.YOLO.ANCHORS order is
    deep-to-shallow; pass it already matched to the level order of outputs).
    """
    outs, grids, stride_v, anch_v = [], [], [], []
    na = len(anchors[0])
    for out, lvl_anchors, stride in zip(level_outputs, anchors, strides):
        b, h, w, _ = out.shape
        outs.append(out.reshape(b, h * w * na, -1))
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        g = np.stack([xs, ys], -1).reshape(h * w, 1, 2)
        g = np.broadcast_to(g, (h * w, na, 2)).reshape(-1, 2)
        grids.append(jnp.asarray(g, jnp.float32))
        stride_v.append(jnp.full((h * w * na,), stride, jnp.float32))
        a = np.asarray(lvl_anchors, np.float32).reshape(1, na, 2)
        a = np.broadcast_to(a, (h * w, na, 2)).reshape(-1, 2)
        anch_v.append(jnp.asarray(a))
    return {
        "outputs": jnp.concatenate(outs, axis=1),
        "grids": jnp.concatenate(grids, axis=0),
        "strides": jnp.concatenate(stride_v, axis=0),
        "anchors": jnp.concatenate(anch_v, axis=0),
    }


def decode_anchor_outputs(
    flat: Dict[str, jnp.ndarray], variant: str = "yolov7"
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decode raw outputs -> (boxes cxcywh [B,A,4], obj [B,A], cls [B,A,C]).

    v3/v4: xy = (sigmoid(t) + grid)*stride, wh = exp(t)*anchor
    v5/v7: xy = (2*sigmoid(t) - 0.5 + grid)*stride, wh = (2*sigmoid(t))²*anchor
    """
    out = flat["outputs"]
    grids, strides, anchors = flat["grids"], flat["strides"], flat["anchors"]
    if variant in ("yolov5", "yolov7"):
        xy = (2.0 * jax.nn.sigmoid(out[..., 0:2]) - 0.5 + grids) * strides[:, None]
        wh = (2.0 * jax.nn.sigmoid(out[..., 2:4])) ** 2 * anchors
    else:
        xy = (jax.nn.sigmoid(out[..., 0:2]) + grids) * strides[:, None]
        wh = jnp.exp(jnp.clip(out[..., 2:4], max=8.0)) * anchors
    boxes = jnp.concatenate([xy, wh], axis=-1)
    return boxes, out[..., 4], out[..., 5:]


def _level_layout(level_hw: Sequence[Tuple[int, int]], na: int):
    """Static flat-index layout: per level (offset, H, W)."""
    offsets = []
    off = 0
    for h, w in level_hw:
        offsets.append(off)
        off += h * w * na
    return offsets, off


def build_targets_max_iou(
    gt_boxes_xyxy: jnp.ndarray,     # [G, 4]
    gt_classes: jnp.ndarray,        # [G]
    gt_valid: jnp.ndarray,          # [G]
    anchors: np.ndarray,            # [L, na, 2] pixel anchor shapes
    level_hw: Sequence[Tuple[int, int]],
    level_strides: Sequence[int],
) -> Dict[str, jnp.ndarray]:
    """v3/v4 assignment (reference yolo.py get_target:403): each gt claims
    exactly the anchor shape with max wh-IoU, at its center cell.

    Returns flat [A] maps: obj_target, matched_gt (index), fg_mask.
    """
    L, na, _ = anchors.shape
    offsets, A = _level_layout(level_hw, na)
    g_cx = (gt_boxes_xyxy[:, 0] + gt_boxes_xyxy[:, 2]) * 0.5
    g_cy = (gt_boxes_xyxy[:, 1] + gt_boxes_xyxy[:, 3]) * 0.5
    g_w = gt_boxes_xyxy[:, 2] - gt_boxes_xyxy[:, 0]
    g_h = gt_boxes_xyxy[:, 3] - gt_boxes_xyxy[:, 1]

    # wh-IoU between each gt and all L*na anchor shapes
    aw = jnp.asarray(anchors.reshape(-1, 2))  # [L*na, 2]
    inter = jnp.minimum(g_w[:, None], aw[None, :, 0]) * jnp.minimum(
        g_h[:, None], aw[None, :, 1]
    )
    union = g_w[:, None] * g_h[:, None] + aw[None, :, 0] * aw[None, :, 1] - inter
    shape_iou = inter / (union + 1e-9)          # [G, L*na]
    best = jnp.argmax(shape_iou, axis=1)        # [G]
    lvl = best // na
    k = best % na

    strides_arr = jnp.asarray(level_strides, jnp.float32)[lvl]  # [G]
    ws = jnp.asarray([w for (_, w) in level_hw], jnp.int32)[lvl]
    hs = jnp.asarray([h for (h, _) in level_hw], jnp.int32)[lvl]
    cx = jnp.clip((g_cx / strides_arr).astype(jnp.int32), 0, ws - 1)
    cy = jnp.clip((g_cy / strides_arr).astype(jnp.int32), 0, hs - 1)
    off = jnp.asarray(offsets, jnp.int32)[lvl]
    idx = off + (cy * ws + cx) * na + k          # [G] flat anchor index
    idx = jnp.where(gt_valid, idx, A)            # invalid -> overflow slot

    obj_t = jnp.zeros((A + 1,), jnp.float32).at[idx].set(1.0)[:A]
    matched = jnp.zeros((A + 1,), jnp.int32).at[idx].set(
        jnp.arange(gt_boxes_xyxy.shape[0], dtype=jnp.int32)
    )[:A]
    return {
        "fg_mask": obj_t > 0,
        "matched_gt": matched,
    }


def build_targets_ratio(
    gt_boxes_xyxy: jnp.ndarray,
    gt_classes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    anchors: np.ndarray,
    level_hw: Sequence[Tuple[int, int]],
    level_strides: Sequence[int],
    ratio_thresh: float = 4.0,
) -> Dict[str, jnp.ndarray]:
    """v5/v7 assignment (reference get_target_yolov5:753 /
    get_matching_anchors:883): a gt matches every anchor whose wh ratio is
    within ``ratio_thresh``, in its center cell AND the two nearest neighbor
    cells — up to G * L * na * 3 candidate positives, scatter-resolved.
    """
    G = gt_boxes_xyxy.shape[0]
    L, na, _ = anchors.shape
    offsets, A = _level_layout(level_hw, na)

    g_cx = (gt_boxes_xyxy[:, 0] + gt_boxes_xyxy[:, 2]) * 0.5
    g_cy = (gt_boxes_xyxy[:, 1] + gt_boxes_xyxy[:, 3]) * 0.5
    g_w = gt_boxes_xyxy[:, 2] - gt_boxes_xyxy[:, 0]
    g_h = gt_boxes_xyxy[:, 3] - gt_boxes_xyxy[:, 1]

    aw = jnp.asarray(anchors.reshape(-1, 2))            # [L*na, 2]
    rw = g_w[:, None] / (aw[None, :, 0] + 1e-9)
    rh = g_h[:, None] / (aw[None, :, 1] + 1e-9)
    ratio = jnp.maximum(
        jnp.maximum(rw, 1.0 / (rw + 1e-9)), jnp.maximum(rh, 1.0 / (rh + 1e-9))
    )                                                   # [G, L*na]
    anchor_ok = (ratio < ratio_thresh) & gt_valid[:, None]

    lvl_of = jnp.repeat(jnp.arange(L), na)              # [L*na]
    strides_arr = jnp.asarray(level_strides, jnp.float32)[lvl_of]  # [L*na]
    ws = jnp.asarray([w for (_, w) in level_hw], jnp.int32)[lvl_of]
    hs = jnp.asarray([h for (h, _) in level_hw], jnp.int32)[lvl_of]
    off = jnp.asarray(offsets, jnp.int32)[lvl_of]
    k_of = jnp.tile(jnp.arange(na), L)

    fx = g_cx[:, None] / strides_arr[None, :]           # [G, L*na]
    fy = g_cy[:, None] / strides_arr[None, :]
    cx0 = jnp.floor(fx).astype(jnp.int32)
    cy0 = jnp.floor(fy).astype(jnp.int32)
    # neighbor offsets: left/right by x-fraction, up/down by y-fraction
    dx = jnp.where(fx - cx0 < 0.5, -1, 1)
    dy = jnp.where(fy - cy0 < 0.5, -1, 1)
    cand_cells = [
        (cx0, cy0, jnp.ones_like(anchor_ok)),
        (cx0 + dx, cy0, jnp.ones_like(anchor_ok)),
        (cx0, cy0 + dy, jnp.ones_like(anchor_ok)),
    ]

    all_idx, all_gt = [], []
    for ccx, ccy, cell_ok in cand_cells:
        inside = (
            (ccx >= 0) & (ccx < ws[None, :]) & (ccy >= 0) & (ccy < hs[None, :])
        )
        ok = anchor_ok & inside & cell_ok
        flat = off[None, :] + (ccy * ws[None, :] + ccx) * na + k_of[None, :]
        flat = jnp.where(ok, flat, A)
        all_idx.append(flat.reshape(-1))
        all_gt.append(
            jnp.broadcast_to(
                jnp.arange(G, dtype=jnp.int32)[:, None], ok.shape
            ).reshape(-1)
        )
    idx = jnp.concatenate(all_idx)
    gt_ids = jnp.concatenate(all_gt)
    obj_t = jnp.zeros((A + 1,), jnp.float32).at[idx].set(1.0)[:A]
    matched = jnp.zeros((A + 1,), jnp.int32).at[idx].set(gt_ids)[:A]
    return {"fg_mask": obj_t > 0, "matched_gt": matched}


def anchor_yolo_losses(
    flat: Dict[str, jnp.ndarray],
    gt_boxes_xyxy: jnp.ndarray,   # [B, G, 4]
    gt_classes: jnp.ndarray,      # [B, G]
    gt_valid: jnp.ndarray,        # [B, G]
    anchors: np.ndarray,          # [L, na, 2]
    level_hw: Sequence[Tuple[int, int]],
    level_strides: Sequence[int],
    num_classes: int,
    variant: str = "yolov7",
    build_target_type: str = "default",
    iou_type: str = "ciou",
    loss_type: str = "v7",
    ignore_threshold: float = 0.7,
    lambda_iou: float = 1.1,
    lambda_conf: float = 1.0,
    lambda_cls: float = 1.0,
    lambda_xy: float = 1.0,
    lambda_wh: float = 1.0,
) -> Dict[str, jnp.ndarray]:
    """Batch loss for anchor heads.

    ``loss_type='v7'``: CIoU-family box regression (reference
    yolov7.py:546-604). ``loss_type='v4'``: the classic v3/v4 decomposed
    box loss — BCE on the xy cell offsets + MSE on the log-wh residuals
    with LAMBDA_XY/LAMBDA_WH weights (reference yolo.py get_target:403 +
    MODEL.YOLO.LOSS keys).
    """
    boxes_cxcywh, obj_logits, cls_logits = decode_anchor_outputs(flat, variant)
    pred_xyxy = cxcywh_to_xyxy(boxes_cxcywh)  # [B, A, 4]

    build = (
        build_targets_ratio if build_target_type == "yolov5"
        else build_targets_max_iou
    )
    targets = jax.vmap(
        lambda gb, gc, gv: build(
            gb, gc, gv, anchors, level_hw, level_strides
        )
    )(gt_boxes_xyxy, gt_classes, gt_valid)
    fg = targets["fg_mask"]                  # [B, A]
    matched = targets["matched_gt"]          # [B, A]
    fg_f = fg.astype(jnp.float32)
    num_fg = jnp.maximum(jnp.sum(fg_f), 1.0)

    tgt_boxes = jnp.take_along_axis(gt_boxes_xyxy, matched[..., None], axis=1)
    tgt_classes = jnp.take_along_axis(gt_classes, matched, axis=1)

    # ignore mask: predictions overlapping ANY gt above the threshold are
    # excluded from the no-object loss (reference IGNORE_THRESHOLD semantics)
    pair = jax.vmap(pairwise_box_iou)(
        jax.lax.stop_gradient(pred_xyxy), gt_boxes_xyxy
    )  # [B, A, G]
    pair = jnp.where(gt_valid[:, None, :], pair, 0.0)
    best_iou = jnp.max(pair, axis=-1)
    ignore = (best_iou > ignore_threshold) & ~fg

    if loss_type == "v4":
        # decomposed box loss on the RAW head outputs
        raw = flat["outputs"][..., 0:4]                      # [B, A, 4]
        grids = flat["grids"]
        strides = flat["strides"]
        anchors_v = flat["anchors"]
        tcx = (tgt_boxes[..., 0] + tgt_boxes[..., 2]) * 0.5
        tcy = (tgt_boxes[..., 1] + tgt_boxes[..., 3]) * 0.5
        tw = jnp.clip(tgt_boxes[..., 2] - tgt_boxes[..., 0], min=1e-3)
        th = jnp.clip(tgt_boxes[..., 3] - tgt_boxes[..., 1], min=1e-3)
        # xy target: fractional offset inside the assigned cell, in (0, 1)
        tx = jnp.clip(tcx / strides - grids[:, 0], 0.0, 1.0)
        ty = jnp.clip(tcy / strides - grids[:, 1], 0.0, 1.0)
        loss_xy = jnp.sum(
            (
                sigmoid_binary_cross_entropy(raw[..., 0], tx)
                + sigmoid_binary_cross_entropy(raw[..., 1], ty)
            ) * fg_f
        ) / num_fg
        tw_t = jnp.log(tw / (anchors_v[:, 0] + 1e-9))
        th_t = jnp.log(th / (anchors_v[:, 1] + 1e-9))
        loss_wh = jnp.sum(
            0.5 * ((raw[..., 2] - tw_t) ** 2 + (raw[..., 3] - th_t) ** 2)
            * fg_f
        ) / num_fg
        loss_box = lambda_xy * loss_xy + lambda_wh * loss_wh
    else:
        loss_box = lambda_iou * jnp.sum(
            iou_loss(pred_xyxy, tgt_boxes, loss_type=iou_type) * fg_f
        ) / num_fg

    obj_bce = sigmoid_binary_cross_entropy(obj_logits, fg_f)
    obj_w = jnp.where(ignore, 0.0, 1.0)
    loss_obj = jnp.sum(obj_bce * obj_w) / num_fg

    cls_t = jax.nn.one_hot(tgt_classes, num_classes)
    loss_cls = jnp.sum(
        sigmoid_binary_cross_entropy(cls_logits, cls_t) * fg_f[..., None]
    ) / num_fg

    losses = {
        "loss_box": loss_box,
        "loss_obj": lambda_conf * loss_obj,
        "loss_cls": lambda_cls * loss_cls,
        "num_fg": num_fg,
    }
    losses["total_loss"] = (
        losses["loss_box"] + losses["loss_obj"] + losses["loss_cls"]
    )
    return losses
