"""YOLOX meta-architecture.

Parity with /root/reference/yolov7/modeling/meta_arch/yolox.py:36 —
CSPDarknet-X + YOLOPAFPN + YOLOXHead hardwired (:68-70), train returns a loss
dict, eval decodes + class-aware NMS and returns fixed-shape Detections
(the reference's ``[{"instances": Instances}]`` contract with Instances
replaced by masked pytrees).

TPU redesign notes:
  * ``preprocess_image`` (device move + ImageList padding, reference :95-157)
    happens in the host data pipeline: batches arrive as dense NHWC arrays
    letterboxed to the static INPUT.INPUT_SIZE with pad value 114, plus dense
    ``[B, G]`` masked labels — so the whole model is one jitted function.
  * The L1-loss enable broadcast (reference :105-121, a ``dist.broadcast``)
    is a deterministic function of the step counter passed in by the trainer;
    no collective needed.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolov7_d2_tpu.core.registry import META_ARCH_REGISTRY
from yolov7_d2_tpu.models.backbones.darknetx import CSPDarknetX
from yolov7_d2_tpu.models.heads.yolox_head import YOLOXHead, yolox_losses
from yolov7_d2_tpu.models.necks.yolo_pafpn import YOLOPAFPN
from yolov7_d2_tpu.ops.nms import batched_nms_batched
from yolov7_d2_tpu.structures.boxes import cxcywh_to_xyxy
from yolov7_d2_tpu.structures.instances import Detections


class YOLOX(nn.Module):
    """backbone -> neck -> head; returns raw head outputs (+grids/strides).

    ``backbone=None`` uses the builtin CSPDarknet-X; the reference YOLOX
    resolves any registered backbone via ``build_backbone(cfg)``
    (yolox.py:60) — pass a pre-built module for regnet/convnext/... configs."""

    num_classes: int = 80
    depth_mul: float = 0.33
    width_mul: float = 0.50
    in_features: Sequence[str] = ("dark3", "dark4", "dark5")
    depthwise: bool = False
    act: str = "silu"
    normalize_input: bool = False  # MODEL.YOLO.NORMALIZE_INPUT
    backbone: Optional[nn.Module] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, images: jnp.ndarray, train: bool = False
    ) -> Dict[str, jnp.ndarray]:
        x = images.astype(self.dtype)
        if self.normalize_input:
            x = x / 255.0
        if self.backbone is not None:
            feats = self.backbone(x, train)
        else:
            feats = CSPDarknetX(
                dep_mul=self.depth_mul,
                wid_mul=self.width_mul,
                out_features=self.in_features,
                depthwise=self.depthwise,
                act=self.act,
                dtype=self.dtype,
                name="backbone",
            )(x, train)
        fpn_outs = YOLOPAFPN(
            depth=self.depth_mul,
            width=self.width_mul,
            depthwise=self.depthwise,
            act=self.act,
            dtype=self.dtype,
            name="neck",
        )([feats[f] for f in self.in_features], train)
        return YOLOXHead(
            num_classes=self.num_classes,
            width=self.width_mul,
            depthwise=self.depthwise,
            act=self.act,
            dtype=self.dtype,
            name="head",
        )(fpn_outs, train)


def yolox_loss_fn(
    head_out: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    num_classes: int,
    use_l1: bool = False,
    prefilter_topk: "int | None" = 2048,
) -> Dict[str, jnp.ndarray]:
    return yolox_losses(
        head_out,
        batch["gt_boxes"],
        batch["gt_classes"],
        batch["gt_valid"],
        num_classes,
        use_l1=use_l1,
        prefilter_topk=prefilter_topk,
    )


def yolox_postprocess(
    head_out: Dict[str, jnp.ndarray],
    conf_threshold: float = 0.01,
    nms_threshold: float = 0.65,
    max_detections: int = 100,
    pre_nms_topk: int = 1024,
) -> Detections:
    """Decode + confidence filter + class-aware NMS, batched, static shapes.

    Mirrors ``postprocess`` (reference utils/boxes.py:171-210): score =
    obj * best-class prob, candidates below ``conf_threshold`` are masked,
    NMS runs class-aware on the top ``pre_nms_topk`` candidates.
    """
    # TPU restructuring (exact math, trace-driven — docs/PERF.md round 4):
    #  * best-class via max/argmax on the RAW logits in the compute dtype;
    #    sigmoid is strictly monotone so sigmoid(max(l)) == max(sigmoid(l))
    #    and the argmax winner is identical — this removes the f32 sigmoid
    #    over the full [B, A, C] tensor (~1.7 ms @bs128).
    #  * decode AFTER the top-k gather: only the K kept rows pay the f32
    #    cast / grid-shift / exp instead of all A anchors.
    #  * the K gather indices are re-sorted by anchor index: greedy NMS is
    #    argmax-based so score order is irrelevant, and sorted+unique
    #    indices let the row gathers take XLA's fast lowering (the
    #    score-ordered take_along_axis gathers ran at 2-6 GB/s in the
    #    round-4 trace).
    out = head_out["outputs"]                         # [B, A, 5+C]
    grids = head_out["grids"]                         # [A, 2]
    strides = head_out["strides"]                     # [A]
    cls_logits = out[..., 5:]
    best_cls = jnp.argmax(cls_logits, axis=-1)        # [B, A]
    best_logit = jnp.max(cls_logits, axis=-1)         # [B, A] compute dtype
    obj = jax.nn.sigmoid(out[..., 4].astype(jnp.float32))
    scores = obj * jax.nn.sigmoid(best_logit.astype(jnp.float32))
    scores = jnp.where(scores >= conf_threshold, scores, 0.0)

    # pre-NMS top-k keeps the NMS candidate set small and static
    pre_nms_topk = min(pre_nms_topk, scores.shape[-1])
    _, top_idx = jax.lax.top_k(scores, pre_nms_topk)  # [B, K]
    top_idx = jnp.sort(top_idx, axis=-1)              # sorted + unique

    gather = lambda a, i: a.at[i].get(
        indices_are_sorted=True, unique_indices=True
    )
    top_scores = jax.vmap(gather)(scores, top_idx)            # [B, K]
    top_cls = jax.vmap(gather)(best_cls, top_idx)             # [B, K]
    top_raw = jax.vmap(gather)(out[..., :4], top_idx)         # [B, K, 4]
    top_grids = jax.vmap(lambda i: gather(grids, i))(top_idx)     # [B, K, 2]
    top_strides = jax.vmap(lambda i: gather(strides, i))(top_idx)  # [B, K]

    raw = top_raw.astype(jnp.float32)
    xy = (raw[..., 0:2] + top_grids) * top_strides[..., None]
    # same exp clamp as decode_outputs (yolox_head.py:119)
    wh = jnp.exp(jnp.clip(raw[..., 2:4], max=11.09)) * top_strides[..., None]
    top_boxes = cxcywh_to_xyxy(jnp.concatenate([xy, wh], axis=-1))

    keep_idx, keep_valid = batched_nms_batched(
        top_boxes, top_scores, top_cls, nms_threshold, max_detections
    )
    sel = jnp.clip(keep_idx, 0)  # [B, M]
    return Detections(
        boxes=jnp.take_along_axis(top_boxes, sel[..., None], axis=1),
        scores=jnp.where(
            keep_valid, jnp.take_along_axis(top_scores, sel, axis=1), 0.0
        ),
        classes=jnp.take_along_axis(top_cls, sel, axis=1).astype(jnp.int32),
        valid=keep_valid,
    )


@META_ARCH_REGISTRY.register(name="YOLOX")
def build_yolox(cfg, dtype: Optional[Any] = None):
    from yolov7_d2_tpu.core.registry import BACKBONE_REGISTRY

    dtype = dtype or (
        jnp.bfloat16 if cfg.SOLVER.AMP.ENABLED else jnp.float32
    )
    # non-darknet backbones resolve through the registry (reference
    # yolox.py:60 build_backbone(cfg) — e.g. yolox_convnext / regnetx_s)
    name = cfg.MODEL.BACKBONE.NAME
    backbone = None
    if name and name != "build_cspdarknetx_backbone":
        backbone = BACKBONE_REGISTRY.get(name)(cfg, dtype=dtype)
    return YOLOX(
        num_classes=cfg.MODEL.YOLO.CLASSES,
        depth_mul=cfg.MODEL.YOLO.DEPTH_MUL,
        width_mul=cfg.MODEL.YOLO.WIDTH_MUL,
        in_features=tuple(cfg.MODEL.YOLO.IN_FEATURES),
        depthwise=cfg.MODEL.DARKNET.DEPTH_WISE,
        normalize_input=cfg.MODEL.YOLO.NORMALIZE_INPUT,
        backbone=backbone,
        dtype=dtype,
    )
