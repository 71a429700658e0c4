"""Anchor-based YOLO meta-architectures: YOLO (v3) and YOLOV7 (flagship).

Parity with:
  * ``YOLO`` — /root/reference/yolov7/modeling/meta_arch/yolo.py:31
    (darknet + YOLOFPN + anchor head, v3 decode)
  * ``YOLOV7`` — meta_arch/yolov7.py:56 (any registered backbone, FPN/PAFPN
    neck select :125-164, anchor head with the v4/v7 CIoU loss branch
    :546-604, v5-style ratio targets optional via
    MODEL.YOLO.LOSS.BUILD_TARGET_TYPE).

The reference's multi-size-training ``dist.broadcast`` (yolo.py:131-146) is
unnecessary here: input sizes are static per compile, multi-scale training
means cycling through a small set of pre-compiled shapes from the host.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from yolov7_d2_tpu.core.registry import BACKBONE_REGISTRY, META_ARCH_REGISTRY
from yolov7_d2_tpu.models.backbones.darknet import Darknet53
from yolov7_d2_tpu.models.backbones.darknetx import CSPDarknetX
from yolov7_d2_tpu.models.heads.anchor_yolo_head import (
    AnchorYOLOHead,
    anchor_yolo_losses,
    decode_anchor_outputs,
    flatten_anchor_outputs,
)
from yolov7_d2_tpu.models.necks.yolo_fpn import YOLOFPN
from yolov7_d2_tpu.models.necks.yolo_pafpn import YOLOPAFPN
from yolov7_d2_tpu.ops.nms import batched_nms_batched
from yolov7_d2_tpu.structures.boxes import cxcywh_to_xyxy
from yolov7_d2_tpu.structures.instances import Detections

LEVEL_STRIDES = (8, 16, 32)


class AnchorYOLO(nn.Module):
    """backbone -> neck -> anchor head; returns flattened outputs + metadata."""

    num_classes: int = 80
    anchors: Tuple = (
        ((10, 13), (16, 30), (33, 23)),      # stride 8 (shallow)
        ((30, 61), (62, 45), (42, 119)),     # stride 16
        ((116, 90), (156, 198), (373, 326)),  # stride 32
    )
    backbone_type: str = "darknet53"   # darknet53 | cspdarknet53 | cspdarknetx
    neck_type: str = "yolov3"          # yolov3(fpn) | pafpn
    in_features: Sequence[str] = ("dark3", "dark4", "dark5")
    with_spp: bool = False
    width_mul: float = 1.0
    depth_mul: float = 1.0
    act: str = "lrelu"
    # generic path: a pre-built backbone module from BACKBONE_REGISTRY
    # (the reference YOLOV7 arch accepts any registered backbone,
    # meta_arch/yolov7.py:45-53); overrides backbone_type when set
    backbone: Optional[nn.Module] = None
    # YOLOV7P style (reference yolov7p.py:106-113): per-level 1x1 preds
    # straight off the neck instead of a 3x3 tower, and pixel mean/std
    # input normalization (yolov7p.py:119-124)
    head_style: str = "tower"  # tower | direct
    pixel_mean: Optional[Tuple[float, float, float]] = None
    pixel_std: Optional[Tuple[float, float, float]] = None
    # expose the neck pyramid in the output dict (key "pyramid") so mask
    # heads can tap the detector FPN (reference yolomask.py OrienHead
    # consumes the detector's own neck levels)
    return_pyramid: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, images: jnp.ndarray, train: bool = False
    ) -> Dict[str, jnp.ndarray]:
        x = images.astype(self.dtype)
        if self.pixel_mean is not None:
            mean = jnp.asarray(self.pixel_mean, self.dtype)
            std = jnp.asarray(self.pixel_std, self.dtype)
            x = (x / 255.0 - mean) / std
        if self.backbone is not None:
            feats = self.backbone(x, train)
        elif self.backbone_type == "cspdarknetx":
            feats = CSPDarknetX(
                dep_mul=self.depth_mul, wid_mul=self.width_mul,
                out_features=self.in_features, act="silu",
                dtype=self.dtype, name="backbone",
            )(x, train)
        else:
            feats = Darknet53(
                out_features=self.in_features,
                with_csp=(self.backbone_type == "cspdarknet53"),
                act=self.act, dtype=self.dtype, name="backbone",
            )(x, train)
        feat_list = [feats[f] for f in self.in_features]
        if self.neck_type == "pafpn":
            neck_out = YOLOPAFPN(
                depth=self.depth_mul, width=self.width_mul,
                act="silu", dtype=self.dtype, name="neck",
            )(feat_list, train)
        elif self.neck_type == "bifpn":
            # reference registers BiFPN combos as backbones
            # (neck/bifpn.py:434-482); here it is a neck choice — the head
            # consumes the stride-8/16/32 levels of the 5-level pyramid
            from yolov7_d2_tpu.models.necks.bifpn import BiFPN

            neck_out = BiFPN(dtype=self.dtype, name="neck")(
                feat_list, train
            )[:3]
        elif self.neck_type in ("pan", "ppyolo_pan"):
            from yolov7_d2_tpu.models.necks.reppan import PPYOLOPAN

            neck_out = PPYOLOPAN(
                with_spp=self.with_spp, dtype=self.dtype, name="neck",
            )(feat_list, train)
        else:
            neck_out = YOLOFPN(
                with_spp=self.with_spp, act=self.act, dtype=self.dtype,
                name="neck",
            )(feat_list, train)
        level_outputs = AnchorYOLOHead(
            num_classes=self.num_classes, act=self.act, dtype=self.dtype,
            direct_pred=(self.head_style == "direct"),
            name="head",
        )(neck_out, train)
        flat = flatten_anchor_outputs(level_outputs, self.anchors, LEVEL_STRIDES)
        flat["level_hw"] = tuple(
            (o.shape[1], o.shape[2]) for o in level_outputs
        )
        if self.return_pyramid:
            flat["pyramid"] = tuple(neck_out)
        return flat


def anchor_yolo_loss_fn(
    flat: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    anchors: np.ndarray,
    num_classes: int,
    variant: str = "yolov7",
    build_target_type: str = "default",
    iou_type: str = "ciou",
    loss_type: str = "v7",
    ignore_threshold: float = 0.7,
    lambdas: dict | None = None,
) -> Dict[str, jnp.ndarray]:
    return anchor_yolo_losses(
        flat,
        batch["gt_boxes"], batch["gt_classes"], batch["gt_valid"],
        anchors=anchors,
        level_hw=flat["level_hw"],
        level_strides=LEVEL_STRIDES,
        num_classes=num_classes,
        variant=variant,
        build_target_type=build_target_type,
        iou_type=iou_type,
        loss_type=loss_type,
        ignore_threshold=ignore_threshold,
        **(lambdas or {}),
    )


def yolo_nms_postprocess(
    boxes: jnp.ndarray,        # [B, A, 4] xyxy
    obj: jnp.ndarray,          # [B, A] probabilities
    cls_prob: jnp.ndarray,     # [B, A, C] probabilities
    conf_threshold: float = 0.01,
    nms_threshold: float = 0.5,
    max_detections: int = 100,
    pre_nms_topk: int = 1024,
    v5_gate: bool = False,
) -> Detections:
    """The reference ``postprocess`` / ``postprocessv5`` NMS chains
    (utils/boxes.py:171-306) on already-decoded predictions: best class
    per anchor, confidence gate, class-aware greedy NMS ranked by
    obj * class_conf. The two variants differ ONLY in the gate —
    ``postprocess`` keeps candidates with obj * class_conf >= conf
    (:191), ``postprocessv5`` with obj >= conf alone (:287) — the NMS
    score is obj * class_conf in both. Differential:
    tests/test_eval_e2e_parity.py::test_yolo_postprocess_v5_v7_parity."""
    best_cls = jnp.argmax(cls_prob, axis=-1)
    combined = obj * jnp.max(cls_prob, axis=-1)
    gate = (obj >= conf_threshold) if v5_gate else (
        combined >= conf_threshold)
    scores = jnp.where(gate, combined, 0.0)

    pre_nms_topk = min(pre_nms_topk, scores.shape[-1])
    top_scores, top_idx = jax.lax.top_k(scores, pre_nms_topk)
    top_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
    top_cls = jnp.take_along_axis(best_cls, top_idx, axis=1)

    keep_idx, keep_valid = batched_nms_batched(
        top_boxes, top_scores, top_cls, nms_threshold, max_detections
    )
    sel = jnp.clip(keep_idx, 0)
    return Detections(
        boxes=jnp.take_along_axis(top_boxes, sel[..., None], axis=1),
        scores=jnp.where(
            keep_valid, jnp.take_along_axis(top_scores, sel, axis=1), 0.0
        ),
        classes=jnp.take_along_axis(top_cls, sel, axis=1).astype(jnp.int32),
        valid=keep_valid,
    )


def anchor_yolo_postprocess(
    flat: Dict[str, jnp.ndarray],
    variant: str = "yolov7",
    conf_threshold: float = 0.01,
    nms_threshold: float = 0.5,
    max_detections: int = 100,
    pre_nms_topk: int = 1024,
) -> Detections:
    """Decode + the reference postprocess chain. The v5 meta-arch uses
    postprocessv5's obj-only gate (yolov5.py eval path)."""
    boxes_cxcywh, obj_logits, cls_logits = decode_anchor_outputs(flat, variant)
    return yolo_nms_postprocess(
        cxcywh_to_xyxy(boxes_cxcywh),
        jax.nn.sigmoid(obj_logits),
        jax.nn.sigmoid(cls_logits),
        conf_threshold=conf_threshold,
        nms_threshold=nms_threshold,
        max_detections=max_detections,
        pre_nms_topk=pre_nms_topk,
        v5_gate=(variant == "yolov5"),
    )


def _anchors_from_cfg(cfg) -> Tuple:
    """MODEL.YOLO.ANCHORS is deep-to-shallow in the reference; our level
    order is shallow-to-deep (stride 8, 16, 32)."""
    return tuple(
        tuple(tuple(a) for a in lvl) for lvl in reversed(cfg.MODEL.YOLO.ANCHORS)
    )


_BACKBONE_NAME_MAP = {
    "build_darknet_backbone": "darknet53",
    "build_cspdarknet_backbone": "cspdarknet53",
    "build_cspdarknetx_backbone": "cspdarknetx",
}


@META_ARCH_REGISTRY.register(name="YOLO")
def build_yolo(cfg, dtype: Optional[Any] = None):
    dtype = dtype or (jnp.bfloat16 if cfg.SOLVER.AMP.ENABLED else jnp.float32)
    return AnchorYOLO(
        num_classes=cfg.MODEL.YOLO.CLASSES,
        anchors=_anchors_from_cfg(cfg),
        backbone_type="cspdarknet53" if cfg.MODEL.DARKNET.WITH_CSP else "darknet53",
        neck_type="yolov3",
        in_features=tuple(cfg.MODEL.YOLO.IN_FEATURES),
        with_spp=cfg.MODEL.YOLO.NECK.WITH_SPP,
        dtype=dtype,
    )


@META_ARCH_REGISTRY.register(name="YOLOV5")
def build_yolov5(cfg, dtype: Optional[Any] = None):
    """YOLOV5 (reference meta_arch/yolov5.py:48): the DEDICATED v5 CSP
    backbone (yolov5_backbone.py:14 — Focus stem, v5 depth plan, SPP-last,
    narrowed C5) + PAFPN + anchor head with the v5 ratio-based target
    builder and CIoU loss (BUILD_TARGET_TYPE='yolov5' at the engine level)."""
    from yolov7_d2_tpu.models.backbones.yolov5 import build_yolov5_backbone

    dtype = dtype or (jnp.bfloat16 if cfg.SOLVER.AMP.ENABLED else jnp.float32)
    return AnchorYOLO(
        num_classes=cfg.MODEL.YOLO.CLASSES,
        anchors=_anchors_from_cfg(cfg),
        backbone=build_yolov5_backbone(cfg, dtype=dtype),
        neck_type="pafpn",
        in_features=("c3", "c4", "c5"),
        width_mul=cfg.MODEL.YOLO.WIDTH_MUL,
        depth_mul=cfg.MODEL.YOLO.DEPTH_MUL,
        act="silu",
        dtype=dtype,
    )


@META_ARCH_REGISTRY.register(name="YOLOV7P")
def build_yolov7p(cfg, dtype: Optional[Any] = None):
    """YOLOV7P (reference meta_arch/yolov7p.py:42) — yolov7 fused with the
    decoupled-head flavour; accepts any registered backbone like YOLOV7
    (the reference r50.yaml pairs it with a ResNet)."""
    dtype = dtype or (jnp.bfloat16 if cfg.SOLVER.AMP.ENABLED else jnp.float32)
    name = cfg.MODEL.BACKBONE.NAME
    common = dict(
        num_classes=cfg.MODEL.YOLO.CLASSES,
        anchors=_anchors_from_cfg(cfg),
        neck_type="pafpn",
        in_features=tuple(cfg.MODEL.YOLO.IN_FEATURES),
        act="silu",
        head_style="direct",
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
        dtype=dtype,
    )
    if name in _BACKBONE_NAME_MAP:
        return AnchorYOLO(backbone_type=_BACKBONE_NAME_MAP[name], **common)
    backbone = BACKBONE_REGISTRY.get(name)(cfg, dtype=dtype)
    return AnchorYOLO(backbone=backbone, **common)


@META_ARCH_REGISTRY.register(name="YOLOV7")
def build_yolov7(cfg, dtype: Optional[Any] = None):
    """The reference YOLOV7 arch accepts any registered backbone
    (meta_arch/yolov7.py:45-53 asserts against a support list); darknet
    variants take the tuned builtin path, everything else resolves through
    BACKBONE_REGISTRY (resnet/res2net/swin/pvt/regnet/convnext/...)."""
    dtype = dtype or (jnp.bfloat16 if cfg.SOLVER.AMP.ENABLED else jnp.float32)
    name = cfg.MODEL.BACKBONE.NAME
    neck_t = cfg.MODEL.YOLO.NECK.TYPE
    neck = neck_t if neck_t in ("pafpn", "bifpn", "pan", "ppyolo_pan") else "yolov3"
    common = dict(
        num_classes=cfg.MODEL.YOLO.CLASSES,
        anchors=_anchors_from_cfg(cfg),
        neck_type=neck,
        in_features=tuple(cfg.MODEL.YOLO.IN_FEATURES),
        with_spp=cfg.MODEL.YOLO.NECK.WITH_SPP,
        width_mul=cfg.MODEL.YOLO.WIDTH_MUL,
        depth_mul=cfg.MODEL.YOLO.DEPTH_MUL,
        act="silu",
        dtype=dtype,
    )
    if name in _BACKBONE_NAME_MAP:
        return AnchorYOLO(backbone_type=_BACKBONE_NAME_MAP[name], **common)
    backbone = BACKBONE_REGISTRY.get(name)(cfg, dtype=dtype)
    return AnchorYOLO(backbone=backbone, **common)
