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
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
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
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
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


def decode_deltas(anchors: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """YOLOFBox2BoxTransform.apply_deltas: (dx,dy,dw,dh) on cxcywh anchors."""
    a = xyxy_to_cxcywh(anchors)
    cx = a[..., 0] + deltas[..., 0] * a[..., 2]
    cy = a[..., 1] + deltas[..., 1] * a[..., 3]
    w = a[..., 2] * jnp.exp(jnp.clip(deltas[..., 2], max=8.0))
    h = a[..., 3] * jnp.exp(jnp.clip(deltas[..., 3], max=8.0))
    return cxcywh_to_xyxy(jnp.stack([cx, cy, w, h], axis=-1))


class YOLOF(nn.Module):
    num_classes: int = 80
    resnet_depth: int = 50
    encoder_channels: int = 512
    num_anchors: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False) -> Dict[str, jnp.ndarray]:
        mean = jnp.asarray([103.53, 116.28, 123.675])
        std = jnp.asarray([57.375, 57.12, 58.395])
        x = ((images - mean) / std).astype(self.dtype)
        feats = ResNet(depth=self.resnet_depth, out_features=("res5",),
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
) -> Dict[str, jnp.ndarray]:
    """UniformMatcher: each gt takes its top-k anchors by L1 distance of both
    predicted boxes and anchor boxes (k each), filtered by IoU quality."""
    g_cxcy = xyxy_to_cxcywh(gt_boxes)[:, :2]
    p_cxcy = xyxy_to_cxcywh(pred_boxes)[:, :2]
    a_cxcy = xyxy_to_cxcywh(anchors)[:, :2]
    cost_p = jnp.sum(jnp.abs(g_cxcy[:, None] - p_cxcy[None]), -1)   # [G, A]
    cost_a = jnp.sum(jnp.abs(g_cxcy[:, None] - a_cxcy[None]), -1)
    A = anchors.shape[0]
    G = gt_boxes.shape[0]

    fg = jnp.zeros((A,), bool)
    matched = jnp.zeros((A,), jnp.int32)
    for cost in (cost_p, cost_a):
        _, idx = jax.lax.top_k(-cost, match_topk)                   # [G, k]
        flat = jnp.where(gt_valid[:, None], idx, A).reshape(-1)
        gt_ids = jnp.broadcast_to(
            jnp.arange(G, dtype=jnp.int32)[:, None], (G, match_topk)
        ).reshape(-1)
        fg = fg.at[flat].set(True, mode="drop")
        matched = matched.at[flat].set(gt_ids, mode="drop")

    # quality filters (reference): pred-gt IoU < 0.15 for matched -> drop;
    # anchors with IoU > 0.7 to any gt are ignored in cls loss if negative
    iou_p = pairwise_box_iou(gt_boxes, pred_boxes)                  # [G, A]
    iou_p = jnp.where(gt_valid[:, None], iou_p, 0.0)
    matched_iou = jnp.take_along_axis(iou_p, matched[None], axis=0)[0]
    fg = fg & (matched_iou >= 0.15)
    iou_a = pairwise_box_iou(gt_boxes, anchors)
    iou_a = jnp.where(gt_valid[:, None], iou_a, 0.0)
    ignore = (jnp.max(iou_p, axis=0) > 0.7) & ~fg
    return {"fg_mask": fg, "matched_gt": matched, "ignore": ignore}


def yolof_losses(
    out: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    num_classes: int,
) -> Dict[str, jnp.ndarray]:
    logits, deltas, anchors = out["logits"], out["deltas"], out["anchors"]
    pred_boxes = decode_deltas(anchors[None], deltas)               # [B, A, 4]
    m = jax.vmap(
        lambda pb, gb, gv: uniform_match(pb, anchors, gb, gv)
    )(jax.lax.stop_gradient(pred_boxes), batch["gt_boxes"], batch["gt_valid"])
    fg, matched, ignore = m["fg_mask"], m["matched_gt"], m["ignore"]
    fg_f = fg.astype(jnp.float32)
    num_fg = jnp.maximum(jnp.sum(fg_f), 1.0)
    tgt_boxes = jnp.take_along_axis(batch["gt_boxes"], matched[..., None], 1)
    tgt_classes = jnp.take_along_axis(batch["gt_classes"], matched, 1)
    cls_t = jax.nn.one_hot(tgt_classes, num_classes) * fg_f[..., None]
    weight = jnp.where(ignore, 0.0, 1.0)[..., None]
    loss_cls = jnp.sum(
        sigmoid_focal_loss(logits, cls_t) * weight
    ) / num_fg
    loss_box = jnp.sum(
        iou_loss(pred_boxes, tgt_boxes, loss_type="giou") * fg_f
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
        dtype=dtype,
    )
