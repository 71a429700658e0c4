"""YOLOF — single-level detection with dilated encoder + uniform matching.

Parity with /root/reference/yolov7/modeling/meta_arch/yolof.py:45,
head/encoder.py (``DilatedEncoder:12``), head/decoder.py (``Decoder:10``),
head/uniform_matcher.py (``UniformMatcher:13``) and
head/box_regression.py (``YOLOFBox2BoxTransform:10``).

TPU redesign: uniform matching (top-k by L1 distance over pred AND anchor
boxes) is two batched top-k calls over static [G, A] matrices — the
reference's per-image loop disappears.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from yolov7_d2_tpu.core.registry import META_ARCH_REGISTRY
from yolov7_d2_tpu.models.backbones.resnet import ResNet
from yolov7_d2_tpu.ops.iou import iou_loss, pairwise_box_iou
from yolov7_d2_tpu.ops.losses import sigmoid_focal_loss
from yolov7_d2_tpu.structures.boxes import cxcywh_to_xyxy, xyxy_to_cxcywh
from ..layers.norm import BatchNorm


class DilatedEncoder(nn.Module):
    """C5 -> 512 channels through 4 dilated residual bottlenecks."""

    channels: int = 512
    block_dilations: Sequence[int] = (2, 4, 6, 8)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def conv_bn(y, f, k, d, name):
            # reference encoder convs keep their (BN-redundant) biases
            # (encoder.py nn.Conv2d defaults) — ported checkpoints carry them
            p = d * (k - 1) // 2
            y = nn.Conv(f, (k, k), padding=[(p, p), (p, p)],
                        kernel_dilation=(d, d), use_bias=True,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"{name}_conv")(y)
            y = BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             name=f"{name}_bn")(y)
            return y.astype(self.dtype)

        x = conv_bn(x, self.channels, 1, 1, "lateral")
        x = conv_bn(x, self.channels, 3, 1, "fpn")
        for i, d in enumerate(self.block_dilations):
            y = nn.relu(conv_bn(x, self.channels // 4, 1, 1, f"b{i}_reduce"))
            y = nn.relu(conv_bn(y, self.channels // 4, 3, d, f"b{i}_dilated"))
            y = nn.relu(conv_bn(y, self.channels, 1, 1, f"b{i}_project"))
            x = x + y
        return x


class YOLOFDecoder(nn.Module):
    """cls tower (2 convs) + reg tower (4 convs) + objectness-scaled scores."""

    num_classes: int = 80
    num_anchors: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        def conv_bn_relu(y, f, name):
            y = nn.Conv(f, (3, 3), padding=[(1, 1), (1, 1)], use_bias=True,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"{name}_conv")(y)
            y = BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             name=f"{name}_bn")(y)
            return nn.relu(y).astype(self.dtype)

        c = x.shape[-1]
        cls = x
        for i in range(2):
            cls = conv_bn_relu(cls, c, f"cls_{i}")
        cls_out = nn.Conv(self.num_anchors * self.num_classes, (3, 3),
                          padding=[(1, 1), (1, 1)], dtype=self.dtype,
                          param_dtype=jnp.float32, name="cls_score")(cls)
        reg = x
        for i in range(4):
            reg = conv_bn_relu(reg, c, f"reg_{i}")
        reg_out = nn.Conv(self.num_anchors * 4, (3, 3),
                          padding=[(1, 1), (1, 1)], dtype=self.dtype,
                          param_dtype=jnp.float32, name="bbox_pred")(reg)
        obj_out = nn.Conv(self.num_anchors, (3, 3), padding=[(1, 1), (1, 1)],
                          dtype=self.dtype, param_dtype=jnp.float32,
                          name="object_pred")(reg)

        b, h, w, _ = cls_out.shape
        cls_out = cls_out.reshape(
            b, h * w * self.num_anchors, self.num_classes
        ).astype(jnp.float32)
        obj_out = obj_out.reshape(
            b, h * w * self.num_anchors, 1
        ).astype(jnp.float32)
        # implicit objectness fold (reference decoder.py:104-108):
        # cls + obj - log(1 + e^cls + e^obj), computed via a stable
        # logsumexp over {0, cls, obj} (identical values, no exp overflow)
        stacked = jnp.stack(
            [jnp.zeros_like(cls_out), cls_out,
             jnp.broadcast_to(obj_out, cls_out.shape)], axis=0
        )
        logits = cls_out + obj_out - jax.nn.logsumexp(stacked, axis=0)
        reg_out = reg_out.reshape(b, h * w * self.num_anchors, 4)
        return logits, reg_out.astype(jnp.float32)


def yolof_anchors(h: int, w: int, stride: int = 32,
                  sizes=(32, 64, 128, 256, 512)) -> np.ndarray:
    """Anchor boxes xyxy [h*w*A, 4] centered on stride-32 cells."""
    out = []
    for y in range(h):
        for x in range(w):
            cx, cy = (x + 0.5) * stride, (y + 0.5) * stride
            for s in sizes:
                out.append([cx - s / 2, cy - s / 2, cx + s / 2, cy + s / 2])
    return np.asarray(out, np.float32)


_SCALE_CLAMP = float(np.log(1000.0 / 16))   # box_regression.py:6


def decode_deltas(
    anchors: jnp.ndarray,
    deltas: jnp.ndarray,
    add_ctr_clamp: bool = False,
    ctr_clamp: float = 32.0,
) -> jnp.ndarray:
    """YOLOFBox2BoxTransform.apply_deltas (box_regression.py:88-130):
    (dx,dy,dw,dh) on cxcywh anchors, dw/dh clamped at log(1000/16), with
    the optional YOLOF center clamp (max pixel shift ``ctr_clamp``;
    the torch class defaults to add_ctr_clamp=False — the reference's
    MODEL.YOLOF.BOX_TRANSFORM cfg keys are never defined anywhere in its
    config surface, so the class defaults are the only executable
    contract)."""
    a = xyxy_to_cxcywh(anchors)
    dxw = deltas[..., 0] * a[..., 2]
    dyh = deltas[..., 1] * a[..., 3]
    if add_ctr_clamp:
        dxw = jnp.clip(dxw, -ctr_clamp, ctr_clamp)
        dyh = jnp.clip(dyh, -ctr_clamp, ctr_clamp)
    cx = a[..., 0] + dxw
    cy = a[..., 1] + dyh
    w = a[..., 2] * jnp.exp(jnp.clip(deltas[..., 2], max=_SCALE_CLAMP))
    h = a[..., 3] * jnp.exp(jnp.clip(deltas[..., 3], max=_SCALE_CLAMP))
    return cxcywh_to_xyxy(jnp.stack([cx, cy, w, h], axis=-1))


class YOLOF(nn.Module):
    num_classes: int = 80
    resnet_depth: int = 50
    encoder_channels: int = 512
    num_anchors: int = 5
    # d2 build_resnet_backbone defaults (Base-YOLOF.yaml never overrides
    # MODEL.RESNETS.NORM / STRIDE_IN_1X1, so the reference trains with
    # FrozenBN + caffe-style stride on the 1x1)
    frozen_bn: bool = True
    stride_in_1x1: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False) -> Dict[str, jnp.ndarray]:
        mean = jnp.asarray([103.53, 116.28, 123.675])
        std = jnp.asarray([57.375, 57.12, 58.395])
        x = ((images - mean) / std).astype(self.dtype)
        feats = ResNet(depth=self.resnet_depth, out_features=("res5",),
                       frozen_bn=self.frozen_bn,
                       stride_in_1x1=self.stride_in_1x1,
                       dtype=self.dtype, name="backbone")(x, train)
        enc = DilatedEncoder(self.encoder_channels, dtype=self.dtype,
                             name="encoder")(feats["res5"], train)
        logits, deltas = YOLOFDecoder(
            self.num_classes, self.num_anchors, dtype=self.dtype,
            name="decoder",
        )(enc, train)
        h, w = enc.shape[1], enc.shape[2]
        anchors = jnp.asarray(yolof_anchors(h, w))
        return {"logits": logits, "deltas": deltas, "anchors": anchors}


def uniform_match(
    pred_boxes: jnp.ndarray,   # [A, 4] xyxy decoded
    anchors: jnp.ndarray,      # [A, 4]
    gt_boxes: jnp.ndarray,     # [G, 4]
    gt_valid: jnp.ndarray,     # [G]
    match_topk: int = 4,
    num_classes: int = 80,
    neg_ignore_thresh: float = 0.7,
    pos_ignore_thresh: float = 0.15,
) -> Dict[str, jnp.ndarray]:
    """UniformMatcher + the criterion's index bookkeeping, per image.

    Reference semantics (head/uniform_matcher.py:13 + meta_arch/
    yolof.py:326-431), restated occurrence-wise for static shapes:

    * each gt claims its top-k anchors by L1 distance in cxcywh (all 4
      coords) of BOTH predicted boxes and anchor boxes -> 2k occurrences
      per gt, ordered rank-major then (pred block | anchor block) then gt
      (the reference's hstack order, uniform_matcher.py:96-112);
    * an occurrence is pos-ignored when the ANCHOR-gt IoU < 0.15
      (yolof.py:369 ``a_iou[src_idx, tgt_idx]``);
    * the per-anchor class map starts at background, anchors whose
      PREDICTED box overlaps any gt > 0.7 become ignore (-1), then
      occurrence writes land in order (later occurrence wins), writing
      -1 for pos-ignored occurrences and the gt class otherwise;
    * box regression is per-OCCURRENCE (duplicates contribute twice),
      on non-pos-ignored occurrences.
    """
    A = anchors.shape[0]
    G = gt_boxes.shape[0]
    k = match_topk
    g_c = xyxy_to_cxcywh(gt_boxes)
    p_c = xyxy_to_cxcywh(pred_boxes)
    a_c = xyxy_to_cxcywh(anchors)
    cost_p = jnp.sum(jnp.abs(g_c[:, None] - p_c[None]), -1)        # [G, A]
    cost_a = jnp.sum(jnp.abs(g_c[:, None] - a_c[None]), -1)

    _, idx_p = jax.lax.top_k(-cost_p, k)                            # [G, k]
    _, idx_a = jax.lax.top_k(-cost_a, k)
    # occurrence layout [k, 2, G] -> flat [2kG] in the reference's order
    occ_anchor = jnp.stack(
        [idx_p.T, idx_a.T], axis=1
    ).reshape(-1)                                                   # [2kG]
    occ_gt = jnp.broadcast_to(
        jnp.arange(G, dtype=jnp.int32)[None, None, :], (k, 2, G)
    ).reshape(-1)
    occ_valid = gt_valid[occ_gt]

    iou_p = pairwise_box_iou(gt_boxes, pred_boxes)                  # [G, A]
    iou_p = jnp.where(gt_valid[:, None], iou_p, 0.0)
    iou_a = pairwise_box_iou(gt_boxes, anchors)                     # [G, A]
    occ_pos_ignore = iou_a[occ_gt, occ_anchor] < pos_ignore_thresh

    # per-anchor class map with last-write-wins occurrence scatter
    base = jnp.full((A,), num_classes, jnp.int32)
    base = jnp.where(jnp.max(iou_p, axis=0) > neg_ignore_thresh, -1, base)
    occ_rank = jnp.arange(occ_anchor.shape[0], dtype=jnp.int32)
    slot = jnp.where(occ_valid, occ_anchor, A)
    last_rank = jnp.full((A + 1,), -1, jnp.int32).at[slot].max(occ_rank)
    winner = occ_valid & (occ_rank == last_rank[jnp.clip(slot, 0, A)])
    return {
        "occ_anchor": occ_anchor,
        "occ_gt": occ_gt,
        "occ_valid": occ_valid,
        "occ_pos_ignore": occ_pos_ignore,
        "winner": winner,
        "base_cls": base,
    }


def yolof_losses(
    out: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    num_classes: int,
) -> Dict[str, jnp.ndarray]:
    """YOLOF criterion (meta_arch/yolof.py:326-431) on static shapes."""
    logits, deltas, anchors = out["logits"], out["deltas"], out["anchors"]
    pred_boxes = decode_deltas(anchors[None], deltas)               # [B, A, 4]
    A = anchors.shape[0]
    m = jax.vmap(
        lambda pb, gb, gv: uniform_match(
            pb, anchors, gb, gv, num_classes=num_classes)
    )(jax.lax.stop_gradient(pred_boxes), batch["gt_boxes"], batch["gt_valid"])

    gt_classes = batch["gt_classes"].astype(jnp.int32)
    occ_cls = jnp.where(
        m["occ_pos_ignore"], -1,
        jnp.take_along_axis(gt_classes, m["occ_gt"], axis=1),
    )                                                               # [B, 2kG]
    slot = jnp.where(m["winner"], m["occ_anchor"], A)
    cls_map = jax.vmap(
        lambda base, s, c: base.at[s].set(c, mode="drop")
    )(m["base_cls"], slot, occ_cls)                                 # [B, A]

    fg = (cls_map >= 0) & (cls_map != num_classes)
    valid = cls_map >= 0
    num_fg = jnp.maximum(jnp.sum(fg.astype(jnp.float32)), 1.0)

    cls_t = jax.nn.one_hot(
        jnp.where(fg, cls_map, num_classes), num_classes
    ) * fg[..., None]
    loss_cls = jnp.sum(
        sigmoid_focal_loss(logits, cls_t) * valid[..., None]
    ) / num_fg

    # per-occurrence giou on non-pos-ignored occurrences (duplicates kept,
    # reference yolof.py:415-421)
    occ_pred = jnp.take_along_axis(
        pred_boxes, m["occ_anchor"][..., None], axis=1
    )                                                               # [B,2kG,4]
    occ_tgt = jnp.take_along_axis(
        batch["gt_boxes"], m["occ_gt"][..., None], axis=1
    )
    occ_ok = (m["occ_valid"] & ~m["occ_pos_ignore"]).astype(jnp.float32)
    loss_box = jnp.sum(
        iou_loss(occ_pred, occ_tgt, loss_type="giou") * occ_ok
    ) / num_fg

    losses = {
        "loss_cls": loss_cls,
        "loss_box": loss_box,
        "num_fg": num_fg,
    }
    losses["total_loss"] = loss_cls + loss_box
    return losses


@META_ARCH_REGISTRY.register(name="YOLOF")
def build_yolof(cfg, dtype: Optional[Any] = None):
    dtype = dtype or (jnp.bfloat16 if cfg.SOLVER.AMP.ENABLED else jnp.float32)
    return YOLOF(
        num_classes=cfg.MODEL.YOLO.CLASSES,
        resnet_depth=cfg.MODEL.RESNETS.DEPTH,
        frozen_bn=(cfg.MODEL.RESNETS.NORM == "FrozenBN"),
        stride_in_1x1=cfg.MODEL.RESNETS.STRIDE_IN_1X1,
        dtype=dtype,
    )


def yolof_postprocess(
    out: Dict[str, jnp.ndarray],
    score_thresh: float = 0.05,
    nms_thresh: float = 0.6,
    topk_candidates: int = 1000,
    max_detections: int = 100,
):
    """YOLOF inference (reference meta_arch/yolof.py:436-540,
    inference_single_image): every (anchor, class) pair is a candidate —
    flattened sigmoid scores thresholded at ``score_thresh``, top
    ``topk_candidates`` kept, deltas decoded for those anchors, then
    detectron2 ``batched_nms`` (class-aware greedy) and the final
    ``max_detections`` cut. Single level (YOLOF's whole point), so no
    per-level loop. Static shapes throughout."""
    from yolov7_d2_tpu.ops.nms import batched_nms_batched
    from yolov7_d2_tpu.structures.instances import Detections

    logits, deltas, anchors = out["logits"], out["deltas"], out["anchors"]
    b, a, c = logits.shape
    probs = jax.nn.sigmoid(logits.astype(jnp.float32)).reshape(b, a * c)
    probs = jnp.where(probs > score_thresh, probs, 0.0)
    k = min(topk_candidates, a * c)
    top_p, top_i = jax.lax.top_k(probs, k)              # [B, K]
    anchor_i = top_i // c
    class_i = (top_i % c).astype(jnp.int32)
    cand_deltas = jnp.take_along_axis(deltas, anchor_i[..., None], axis=1)
    cand_anchors = anchors[anchor_i]                    # [B, K, 4]
    boxes = decode_deltas(cand_anchors, cand_deltas)    # broadcasts [B,K,4]
    keep_idx, keep_valid = batched_nms_batched(
        boxes, top_p, class_i, iou_threshold=nms_thresh,
        max_outputs=max_detections)
    gi = jnp.clip(keep_idx, 0, k - 1)
    return Detections(
        boxes=jnp.take_along_axis(boxes, gi[..., None], axis=1),
        scores=jnp.where(
            keep_valid, jnp.take_along_axis(top_p, gi, axis=1), 0.0),
        classes=jnp.take_along_axis(class_i, gi, axis=1),
        valid=keep_valid,
    )
