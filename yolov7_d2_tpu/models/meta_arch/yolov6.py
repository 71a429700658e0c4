"""YOLOv6 meta-architecture: EfficientRep + RepPAN + EffiDeHead.

Parity with /root/reference/yolov7/modeling/meta_arch/yolov6.py:33 and
head/yolov6_head.py (``build_effidehead_layer:25``, anchor-free
``Detect:148``, ``ComputeLoss:315`` = SimOTA + SIoU). The anchor-free decode
and SimOTA machinery are shared with our YOLOX head — the reference's
ComputeLoss is the same algorithm with the SIoU regression loss, so the loss
path reuses ``yolox_losses`` with ``iou_type='siou'`` semantics below.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolov7_d2_tpu.core.registry import META_ARCH_REGISTRY
from yolov7_d2_tpu.models.backbones.efficientrep import EfficientRep
from yolov7_d2_tpu.models.heads.yolox_head import decode_outputs, simota_assign
from yolov7_d2_tpu.models.layers.blocks import BaseConv
from yolov7_d2_tpu.models.necks.reppan import RepPANNeck
from yolov7_d2_tpu.ops.iou import iou_loss
from yolov7_d2_tpu.ops.losses import sigmoid_binary_cross_entropy
from yolov7_d2_tpu.structures.boxes import cxcywh_to_xyxy


class EffiDeHead(nn.Module):
    """Efficient decoupled head (reference head/effidehead.py:7): per level
    1x1 stem + single cls conv + single reg conv, anchor-free outputs."""

    num_classes: int = 80
    strides: Sequence[int] = (8, 16, 32)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, feats: Sequence[jnp.ndarray], train: bool = False
    ) -> Dict[str, jnp.ndarray]:
        level_outputs, grids, stride_vec = [], [], []
        for lvl, (x, stride) in enumerate(zip(feats, self.strides)):
            c = x.shape[-1]
            x = BaseConv(c, 1, 1, act="silu", dtype=self.dtype,
                         name=f"stem_{lvl}")(x, train)
            cls = BaseConv(c, 3, 1, act="silu", dtype=self.dtype,
                           name=f"cls_conv_{lvl}")(x, train)
            cls_out = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                              param_dtype=jnp.float32,
                              name=f"cls_pred_{lvl}")(cls)
            reg = BaseConv(c, 3, 1, act="silu", dtype=self.dtype,
                           name=f"reg_conv_{lvl}")(x, train)
            reg_out = nn.Conv(4, (1, 1), dtype=self.dtype,
                              param_dtype=jnp.float32,
                              name=f"reg_pred_{lvl}")(reg)
            obj_out = nn.Conv(1, (1, 1), dtype=self.dtype,
                              param_dtype=jnp.float32,
                              name=f"obj_pred_{lvl}")(reg)
            out = jnp.concatenate([reg_out, obj_out, cls_out], axis=-1)
            b, h, w, ch = out.shape
            level_outputs.append(out.reshape(b, h * w, ch).astype(jnp.float32))
            ys, xs = jnp.meshgrid(
                jnp.arange(h, dtype=jnp.float32),
                jnp.arange(w, dtype=jnp.float32), indexing="ij",
            )
            grids.append(jnp.stack([xs, ys], -1).reshape(h * w, 2))
            stride_vec.append(jnp.full((h * w,), stride, jnp.float32))
        return {
            "outputs": jnp.concatenate(level_outputs, axis=1),
            "grids": jnp.concatenate(grids, axis=0),
            "strides": jnp.concatenate(stride_vec, axis=0),
        }


class YOLOV6(nn.Module):
    num_classes: int = 80
    width_mul: float = 0.5
    depth_mul: float = 0.33
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False) -> Dict[str, jnp.ndarray]:
        x = images.astype(self.dtype)
        feats = EfficientRep(
            width_mul=self.width_mul, depth_mul=self.depth_mul,
            dtype=self.dtype, name="backbone",
        )(x, train)
        neck_out = RepPANNeck(
            width_mul=self.width_mul, depth_mul=self.depth_mul,
            dtype=self.dtype, name="neck",
        )([feats["erep3"], feats["erep4"], feats["erep5"]], train)
        return EffiDeHead(
            num_classes=self.num_classes, dtype=self.dtype, name="head"
        )(neck_out, train)


def yolov6_losses(
    head_out: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    num_classes: int,
    iou_type: str = "ciou",
    reg_weight: float = 5.0,
) -> Dict[str, jnp.ndarray]:
    """v6 ComputeLoss (yolov6_head.py:315-531): SimOTA assignment (same
    dynamic-k machinery as YOLOX — cls_weight 1, iou_weight 3, the same
    geometric prior) + IOUlossV6 regression with the head's ``ciou``
    default (``YOLOv6Head.__init__`` passes iou_type='ciou',
    yolov6_head.py:301), ``reg_weight`` 5.0, and an ALWAYS-ON l1 term on
    the raw (undecoded) reg outputs (:513-516 — unlike YOLOX this is not
    gated behind use_l1). total = 5*iou + l1 + obj + cls, each summed and
    divided by the batch foreground count (:509-526).

    Differential: tests/test_torch_parity_losses.py drives the
    reference's own ComputeLoss on the same scenes.
    """
    outputs = head_out["outputs"]
    grids, strides = head_out["grids"], head_out["strides"]
    boxes_cxcywh, obj_logits, cls_logits = decode_outputs(outputs, grids, strides)
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
    tgt_boxes = jnp.take_along_axis(
        batch["gt_boxes"], assign["matched_gt"][..., None], axis=1
    )
    tgt_classes = jnp.take_along_axis(
        batch["gt_classes"], assign["matched_gt"], axis=1
    )
    pred_xyxy = cxcywh_to_xyxy(boxes_cxcywh)
    loss_iou = jnp.sum(
        iou_loss(pred_xyxy, tgt_boxes, loss_type=iou_type) * fg_f
    ) / num_fg
    # l1 on the raw head outputs vs get_l1_target (:594-598): cxcy/stride
    # - grid, log(wh/stride + 1e-8) — always on in v6's ComputeLoss
    tgt_cxcywh = jnp.concatenate(
        [(tgt_boxes[..., 0:2] + tgt_boxes[..., 2:4]) / 2,
         tgt_boxes[..., 2:4] - tgt_boxes[..., 0:2]], axis=-1)
    s = strides[None, :, None]
    l1_t = jnp.concatenate(
        [tgt_cxcywh[..., 0:2] / s - grids[None],
         jnp.log(tgt_cxcywh[..., 2:4] / s + 1e-8)], axis=-1)
    loss_l1 = jnp.sum(
        jnp.abs(outputs[..., 0:4] - l1_t) * fg_f[..., None]
    ) / num_fg
    loss_obj = jnp.sum(sigmoid_binary_cross_entropy(obj_logits, fg_f)) / num_fg
    cls_t = (
        jax.nn.one_hot(tgt_classes, num_classes)
        * jax.lax.stop_gradient(assign["matched_iou"])[..., None]
    )
    loss_cls = jnp.sum(
        sigmoid_binary_cross_entropy(cls_logits, cls_t) * fg_f[..., None]
    ) / num_fg
    losses = {
        "loss_iou": reg_weight * loss_iou,
        "loss_l1": loss_l1,
        "loss_obj": loss_obj,
        "loss_cls": loss_cls,
        "num_fg": num_fg,
    }
    losses["total_loss"] = (
        losses["loss_iou"] + losses["loss_l1"] + losses["loss_obj"]
        + losses["loss_cls"]
    )
    return losses


@META_ARCH_REGISTRY.register(name="YOLOV6")
def build_yolov6(cfg, dtype: Optional[Any] = None):
    dtype = dtype or (jnp.bfloat16 if cfg.SOLVER.AMP.ENABLED else jnp.float32)
    return YOLOV6(
        num_classes=cfg.MODEL.YOLO.CLASSES,
        width_mul=cfg.MODEL.YOLO.WIDTH_MUL,
        depth_mul=cfg.MODEL.YOLO.DEPTH_MUL,
        dtype=dtype,
    )
