"""YOLOX + keypoints — end-to-end pose estimation.

Parity with /root/reference/yolov7/modeling/meta_arch/yolox_kpts.py:37 and
head/yolox_kpts_head.py:25 (decoupled head + 17x3 keypoint branch, kpt grid
decode :282,305, OKS-style keypoint loss inside get_losses :328-474).

Fixes the reference's wiring bugs deliberately (SURVEY.md known-quirks):
``MODEL.YOLO.KEYPOINTS_NUM`` is defined in our config defaults and this arch
is registered (the reference leaves it out of ``meta_arch/__init__.py``).
Backbone swap (Swin/PVTv2 — BASELINE config #5) goes through
``backbone_type``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from yolov7_d2_tpu.core.registry import META_ARCH_REGISTRY
from yolov7_d2_tpu.models.backbones.darknetx import CSPDarknetX
from yolov7_d2_tpu.models.backbones.pvt_v2 import PVTv2
from yolov7_d2_tpu.models.backbones.swin import SwinTransformer
from yolov7_d2_tpu.models.heads.yolox_head import simota_assign
from yolov7_d2_tpu.models.layers.blocks import BaseConv
from yolov7_d2_tpu.models.necks.yolo_pafpn import YOLOPAFPN
from yolov7_d2_tpu.ops.iou import iou_loss
from yolov7_d2_tpu.ops.losses import sigmoid_binary_cross_entropy
from yolov7_d2_tpu.structures.boxes import cxcywh_to_xyxy

# COCO keypoint sigmas (OKS constants)
COCO_KPT_SIGMAS = np.array(
    [
        0.026, 0.025, 0.025, 0.035, 0.035, 0.079, 0.079, 0.072, 0.072,
        0.062, 0.062, 0.107, 0.107, 0.087, 0.087, 0.089, 0.089,
    ],
    np.float32,
)


class YOLOXKptsHead(nn.Module):
    """YOLOX decoupled head + keypoint tower (P*(2+1) channels/level)."""

    num_classes: int = 1
    num_keypoints: int = 17
    width: float = 1.0
    strides: Sequence[int] = (8, 16, 32)
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False) -> Dict[str, jnp.ndarray]:
        hidden = int(256 * self.width)
        outs, kpts, grids, stride_vec = [], [], [], []
        for lvl, (x, stride) in enumerate(zip(feats, self.strides)):
            x = BaseConv(hidden, 1, 1, act=self.act, dtype=self.dtype,
                         name=f"stem_{lvl}")(x, train)
            c = x
            for i in range(2):
                c = BaseConv(hidden, 3, 1, act=self.act, dtype=self.dtype,
                             name=f"cls_conv_{lvl}_{i}")(c, train)
            cls_out = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                              param_dtype=jnp.float32,
                              name=f"cls_pred_{lvl}")(c)
            r = x
            for i in range(2):
                r = BaseConv(hidden, 3, 1, act=self.act, dtype=self.dtype,
                             name=f"reg_conv_{lvl}_{i}")(r, train)
            reg_out = nn.Conv(4, (1, 1), dtype=self.dtype,
                              param_dtype=jnp.float32,
                              name=f"reg_pred_{lvl}")(r)
            obj_out = nn.Conv(1, (1, 1), dtype=self.dtype,
                              param_dtype=jnp.float32,
                              name=f"obj_pred_{lvl}")(r)
            k = x
            for i in range(2):
                k = BaseConv(hidden, 3, 1, act=self.act, dtype=self.dtype,
                             name=f"kpt_conv_{lvl}_{i}")(k, train)
            kpt_out = nn.Conv(self.num_keypoints * 3, (1, 1),
                              dtype=self.dtype, param_dtype=jnp.float32,
                              name=f"kpt_pred_{lvl}")(k)

            out = jnp.concatenate([reg_out, obj_out, cls_out], axis=-1)
            b, h, w, ch = out.shape
            outs.append(out.reshape(b, h * w, ch).astype(jnp.float32))
            kpts.append(
                kpt_out.reshape(b, h * w, self.num_keypoints, 3).astype(
                    jnp.float32
                )
            )
            ys, xs = jnp.meshgrid(
                jnp.arange(h, dtype=jnp.float32),
                jnp.arange(w, dtype=jnp.float32), indexing="ij",
            )
            grids.append(jnp.stack([xs, ys], -1).reshape(h * w, 2))
            stride_vec.append(jnp.full((h * w,), stride, jnp.float32))
        return {
            "outputs": jnp.concatenate(outs, axis=1),
            "kpts": jnp.concatenate(kpts, axis=1),     # [B, A, P, 3]
            "grids": jnp.concatenate(grids, axis=0),
            "strides": jnp.concatenate(stride_vec, axis=0),
        }


def decode_kpts(
    kpts_raw: jnp.ndarray, grids: jnp.ndarray, strides: jnp.ndarray
) -> jnp.ndarray:
    """Keypoints decode (reference yolox_kpts_head.py:282):
    xy = (raw + grid) * stride. The reference multiplies the WHOLE kpt
    slice by stride, so the per-kpt confidence logit is scaled by stride
    too (``output[..., 6:] = (output[..., 6:] + kpt_grids) * stride``) —
    replicated here because the training loss consumes the scaled logit
    (kpts_loss:727-741 reads the decoded tensor)."""
    xy = (kpts_raw[..., 0:2] + grids[:, None, :]) * strides[:, None, None]
    conf = kpts_raw[..., 2:3] * strides[:, None, None]
    return jnp.concatenate([xy, conf], axis=-1)


class YOLOXKPTS(nn.Module):
    num_keypoints: int = 17
    num_classes: int = 1     # person (reference forces 2-1 semantics, :61)
    depth_mul: float = 0.33
    width_mul: float = 0.50
    backbone_type: str = "cspdarknetx"   # cspdarknetx | swin | pvt_v2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False) -> Dict[str, jnp.ndarray]:
        x = images.astype(self.dtype)
        if self.backbone_type == "swin":
            feats = SwinTransformer(size="tiny", dtype=self.dtype,
                                    name="backbone")(x, train)
            feat_list = [feats["stage1"], feats["stage2"], feats["stage3"]]
        elif self.backbone_type == "pvt_v2":
            feats = PVTv2(variant="b1", dtype=self.dtype, name="backbone")(
                x, train
            )
            feat_list = [feats["stage1"], feats["stage2"], feats["stage3"]]
        else:
            feats = CSPDarknetX(
                dep_mul=self.depth_mul, wid_mul=self.width_mul,
                dtype=self.dtype, name="backbone",
            )(x, train)
            feat_list = [feats["dark3"], feats["dark4"], feats["dark5"]]
        neck_out = YOLOPAFPN(
            depth=self.depth_mul,
            width=self.width_mul,
            in_channels=tuple(
                int(f.shape[-1] / self.width_mul) for f in feat_list
            ),
            dtype=self.dtype, name="neck",
        )(feat_list, train)
        return YOLOXKptsHead(
            num_classes=self.num_classes,
            num_keypoints=self.num_keypoints,
            width=self.width_mul, dtype=self.dtype, name="head",
        )(neck_out, train)


def yolox_kpts_losses(
    head_out: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    num_classes: int = 1,
    num_keypoints: int = 17,
) -> Dict[str, jnp.ndarray]:
    """Box losses as YOLOX + OKS keypoint loss + visibility BCE on fg
    anchors (reference get_losses :328-474)."""
    from yolov7_d2_tpu.models.heads.yolox_head import decode_outputs

    outputs = head_out["outputs"]
    grids, strides = head_out["grids"], head_out["strides"]
    boxes_cxcywh, obj_logits, cls_logits = decode_outputs(outputs, grids, strides)
    kpts = decode_kpts(head_out["kpts"], grids, strides)   # [B, A, P, 3]

    assign = jax.vmap(
        lambda b, o, c, gb, gc, gv: simota_assign(
            jax.lax.stop_gradient(b), jax.lax.stop_gradient(o),
            jax.lax.stop_gradient(c), grids, strides, gb, gc, gv,
        )
    )(boxes_cxcywh, obj_logits, cls_logits,
      batch["gt_boxes"], batch["gt_classes"], batch["gt_valid"])
    fg = assign["fg_mask"]
    fg_f = fg.astype(jnp.float32)
    num_fg = jnp.maximum(jnp.sum(assign["num_fg"]), 1.0)
    matched = assign["matched_gt"]

    tgt_boxes = jnp.take_along_axis(batch["gt_boxes"], matched[..., None], 1)
    pred_xyxy = cxcywh_to_xyxy(boxes_cxcywh)
    loss_iou = jnp.sum(
        iou_loss(pred_xyxy, tgt_boxes, loss_type="iou") * fg_f
    ) / num_fg
    loss_obj = jnp.sum(sigmoid_binary_cross_entropy(obj_logits, fg_f)) / num_fg
    tgt_classes = jnp.take_along_axis(batch["gt_classes"], matched, 1)
    cls_t = (
        jax.nn.one_hot(tgt_classes, num_classes)
        * jax.lax.stop_gradient(assign["matched_iou"])[..., None]
    )
    loss_cls = jnp.sum(
        sigmoid_binary_cross_entropy(cls_logits, cls_t) * fg_f[..., None]
    ) / num_fg

    # keypoints (reference kpts_loss, yolox_kpts_head.py:725-741):
    # gt [B, G, P, 3] -> matched per anchor [B, A, P, 3]
    gt_kpts = batch["gt_keypoints"]
    tgt_kpts = jnp.take_along_axis(
        gt_kpts, matched[..., None, None], axis=1
    )
    # the reference's visibility proxy is target-x != 0 (labels carry only
    # x, y per kpt; :731 ``kpt_mask = (kpts_targets[:, 0::2] != 0)``)
    kpt_mask = (tgt_kpts[..., 0] != 0).astype(jnp.float32)  # [B, A, P]
    # bbox_scale = w*h of the matched gt (:735 prod of the last two coords
    # of the (cx, cy, w, h) reg target)
    bbox_scale = jax.lax.stop_gradient(
        (tgt_boxes[..., 2] - tgt_boxes[..., 0])
        * (tgt_boxes[..., 3] - tgt_boxes[..., 1])
    )[..., None]
    sigmas = jnp.asarray(COCO_KPT_SIGMAS[:num_keypoints])
    d2 = jnp.sum((kpts[..., 0:2] - tgt_kpts[..., 0:2]) ** 2, axis=-1)
    # OKS denominator is bbox_scale * (4 * sigma), sigma NOT squared (:737)
    oks = jnp.exp(-d2 / (bbox_scale * (4.0 * sigmas[None, None, :]) + 1e-9))
    # kpt_loss_factor: total mask entries over visible entries, computed on
    # the fg-gathered batch (:736)
    n_entries = jnp.sum(fg_f) * num_keypoints
    n_vis = jnp.maximum(jnp.sum(kpt_mask * fg_f[..., None]), 1.0)
    kpt_loss_factor = n_entries / n_vis
    lkpt = kpt_loss_factor * jnp.mean(
        (1.0 - oks ** 2) * kpt_mask, axis=-1
    )                                                       # [B, A]
    loss_kpt = jnp.sum(lkpt * fg_f) / num_fg
    # visibility BCE against the x!=0 mask, per-anchor MEAN over P (:732)
    loss_kpt_vis = jnp.sum(
        jnp.mean(sigmoid_binary_cross_entropy(kpts[..., 2], kpt_mask), -1)
        * fg_f
    ) / num_fg

    losses = {
        "loss_iou": 5.0 * loss_iou,
        "loss_obj": loss_obj,
        "loss_cls": loss_cls,
        # reg_weight (5.0) also scales the kpt OKS term (:486)
        "loss_kpt": 5.0 * loss_kpt,
        "loss_kpt_vis": loss_kpt_vis,
        "num_fg": num_fg,
    }
    losses["total_loss"] = (
        losses["loss_iou"] + losses["loss_obj"] + losses["loss_cls"]
        + losses["loss_kpt"] + losses["loss_kpt_vis"]
    )
    return losses


def yolox_kpts_postprocess(
    head_out: Dict[str, jnp.ndarray],
    conf_threshold: float = 0.01,
    nms_threshold: float = 0.65,
    max_detections: int = 100,
    pre_nms_topk: int = 1024,
):
    """Decode boxes + keypoints, NMS, return Detections with keypoints
    (the counterpart of postprocess_yolox_kpts, utils/boxes.py:240-306)."""
    from yolov7_d2_tpu.ops.nms import batched_nms_batched

    outputs = head_out["outputs"]
    grids, strides = head_out["grids"], head_out["strides"]
    from yolov7_d2_tpu.models.heads.yolox_head import decode_outputs

    boxes_cxcywh, obj_logits, cls_logits = decode_outputs(outputs, grids, strides)
    kpts = decode_kpts(head_out["kpts"], grids, strides)   # [B, A, P, 3]
    boxes = cxcywh_to_xyxy(boxes_cxcywh)
    obj = jax.nn.sigmoid(obj_logits)
    cls_prob = jax.nn.sigmoid(cls_logits)
    scores = obj * jnp.max(cls_prob, axis=-1)
    scores = jnp.where(scores >= conf_threshold, scores, 0.0)
    best_cls = jnp.argmax(cls_prob, axis=-1)

    pre_nms_topk = min(pre_nms_topk, scores.shape[-1])
    top_scores, top_idx = jax.lax.top_k(scores, pre_nms_topk)
    top_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
    top_cls = jnp.take_along_axis(best_cls, top_idx, axis=1)
    top_kpts = jnp.take_along_axis(kpts, top_idx[..., None, None], axis=1)

    from yolov7_d2_tpu.structures.instances import Detections

    keep_idx, keep_valid = batched_nms_batched(
        top_boxes, top_scores, top_cls, nms_threshold, max_detections
    )
    sel = jnp.clip(keep_idx, 0)  # [B, M]
    kk = jnp.take_along_axis(top_kpts, sel[..., None, None], axis=1)
    kk = kk.at[..., 2].set(jax.nn.sigmoid(kk[..., 2]))  # vis -> score
    return Detections(
        boxes=jnp.take_along_axis(top_boxes, sel[..., None], axis=1),
        scores=jnp.where(
            keep_valid, jnp.take_along_axis(top_scores, sel, axis=1), 0.0
        ),
        classes=jnp.take_along_axis(top_cls, sel, axis=1).astype(jnp.int32),
        valid=keep_valid,
        keypoints=kk,
    )


@META_ARCH_REGISTRY.register(name="YOLOX_KPTS")
def build_yolox_kpts(cfg, dtype: Optional[Any] = None):
    dtype = dtype or (jnp.bfloat16 if cfg.SOLVER.AMP.ENABLED else jnp.float32)
    bb_map = {
        "build_swin_transformer_backbone": "swin",
        "build_pvt_v2_backbone": "pvt_v2",
    }
    return YOLOXKPTS(
        num_keypoints=cfg.MODEL.YOLO.KEYPOINTS_NUM,
        num_classes=1,
        depth_mul=cfg.MODEL.YOLO.DEPTH_MUL,
        width_mul=cfg.MODEL.YOLO.WIDTH_MUL,
        backbone_type=bb_map.get(cfg.MODEL.BACKBONE.NAME, "cspdarknetx"),
        dtype=dtype,
    )
