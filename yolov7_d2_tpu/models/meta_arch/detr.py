"""DETR meta-architecture + unified SetCriterion.

Parity with /root/reference/yolov7/modeling/meta_arch/detr.py:34 (ResNet
masked backbone + sine PE + 6/6 transformer + class/box heads) and the
``SetCriterion`` (detr.py:475 and its per-arch duplicates, unified here per
SURVEY.md §known-quirks: CE + L1 + gIoU + cardinality, deep supervision,
focal-loss variant for AnchorDETR/D2go).

TPU redesign: Hungarian matching runs on device (auction, ops/matchers.py)
instead of scipy-on-CPU (utils/detr_utils.py:12); all losses are masked
fixed-shape reductions; boxes are normalized cxcywh as in the reference.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolov7_d2_tpu.core.registry import META_ARCH_REGISTRY
from yolov7_d2_tpu.models.backbones.resnet import ResNet
from yolov7_d2_tpu.models.layers.transformer import (
    MLP,
    Transformer,
    sine_position_embedding,
)
from yolov7_d2_tpu.ops.iou import pairwise_generalized_box_iou
from yolov7_d2_tpu.ops.losses import (
    sigmoid_focal_loss,
    weighted_softmax_cross_entropy,
)
from yolov7_d2_tpu.ops.matchers import hungarian_match
from yolov7_d2_tpu.structures.boxes import cxcywh_to_xyxy
from yolov7_d2_tpu.structures.instances import Detections


class DETR(nn.Module):
    num_classes: int = 80
    hidden_dim: int = 256
    num_queries: int = 100
    nheads: int = 8
    enc_layers: int = 6
    dec_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    pre_norm: bool = False
    resnet_depth: int = 50
    backbone_feature: str = "res5"
    remat: bool = False      # MODEL.DETR.REMAT: remat transformer layers
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, images: jnp.ndarray, train: bool = False
    ) -> Dict[str, jnp.ndarray]:
        mean = jnp.asarray([103.53, 116.28, 123.675])
        std = jnp.asarray([57.375, 57.12, 58.395])
        x = ((images - mean) / std).astype(self.dtype)
        feats = ResNet(
            depth=self.resnet_depth,
            out_features=(self.backbone_feature,),
            # every reference DETR config sets STRIDE_IN_1X1 False
            # (torchvision R50: stride on the 3x3)
            stride_in_1x1=False,
            dtype=self.dtype, name="backbone",
        )(x, train)
        f = feats[self.backbone_feature]
        b, h, w, _ = f.shape
        src = nn.Conv(self.hidden_dim, (1, 1), dtype=self.dtype,
                      param_dtype=jnp.float32, name="input_proj")(f)
        pos = sine_position_embedding(h, w, self.hidden_dim // 2)
        pos = jnp.broadcast_to(
            pos[None], (b, h, w, self.hidden_dim)
        ).astype(self.dtype)

        query_embed = self.param(
            "query_embed",
            nn.initializers.normal(1.0),
            (self.num_queries, self.hidden_dim),
        )
        hs, _ = Transformer(
            d_model=self.hidden_dim, nhead=self.nheads,
            num_encoder_layers=self.enc_layers,
            num_decoder_layers=self.dec_layers,
            dim_feedforward=self.dim_feedforward,
            dropout=self.dropout, pre_norm=self.pre_norm,
            remat=self.remat, dtype=self.dtype, name="transformer",
        )(
            src.reshape(b, h * w, self.hidden_dim),
            pos.reshape(b, h * w, self.hidden_dim),
            query_embed,
            train,
        )  # [L, B, Q, C]

        # class head: C + 1 ("no object" last); box head: normalized cxcywh
        cls_logits = nn.Dense(
            self.num_classes + 1, param_dtype=jnp.float32, name="class_embed"
        )(hs.astype(jnp.float32))
        boxes = jax.nn.sigmoid(
            MLP(self.hidden_dim, 4, 3, name="bbox_embed")(
                hs.astype(jnp.float32)
            )
        )
        return {
            "pred_logits": cls_logits[-1],   # [B, Q, C+1]
            "pred_boxes": boxes[-1],         # [B, Q, 4] normalized cxcywh
            "aux_logits": cls_logits[:-1],   # [L-1, B, Q, C+1]
            "aux_boxes": boxes[:-1],
        }


# ---------------------------------------------------------------------------
# matching + criterion
# ---------------------------------------------------------------------------

def detr_match(
    pred_logits: jnp.ndarray,     # [B, Q, C+1]
    pred_boxes: jnp.ndarray,      # [B, Q, 4] normalized cxcywh
    gt_boxes_norm: jnp.ndarray,   # [B, G, 4] normalized cxcywh
    gt_classes: jnp.ndarray,      # [B, G]
    gt_valid: jnp.ndarray,        # [B, G]
    cost_class: float = 1.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 2.0,
    use_focal: bool = False,
):
    """HungarianMatcher (utils/detr_utils.py:12): cost = cls + L1 + gIoU.

    ``use_focal`` selects HungarianMatcherAnchorDETR's focal-style class
    cost (utils/detr_utils.py:151-159: ``pos_cost - neg_cost`` at the target
    class, alpha=0.25 gamma=2), NOT plain ``-sigmoid(p)`` — found by the
    differential loss-parity test.
    """
    if use_focal:
        prob = jax.nn.sigmoid(pred_logits)
        p = jnp.take_along_axis(
            jnp.swapaxes(prob, 1, 2),              # [B, C+1, Q]
            jnp.clip(gt_classes, 0)[..., None], axis=1
        )                                           # [B, G, Q]
        alpha, gamma = 0.25, 2.0
        pos = alpha * (1.0 - p) ** gamma * (-jnp.log(p + 1e-8))
        neg = (1.0 - alpha) * p ** gamma * (-jnp.log(1.0 - p + 1e-8))
        cls_cost = pos - neg
    else:
        prob = jax.nn.softmax(pred_logits, axis=-1)
        cls_cost = -jnp.take_along_axis(
            jnp.swapaxes(prob, 1, 2),              # [B, C+1, Q]
            jnp.clip(gt_classes, 0)[..., None], axis=1
        )                                           # [B, G, Q]
    l1 = jnp.sum(
        jnp.abs(gt_boxes_norm[:, :, None, :] - pred_boxes[:, None, :, :]),
        axis=-1,
    )                                               # [B, G, Q]
    giou = jax.vmap(pairwise_generalized_box_iou)(
        cxcywh_to_xyxy(gt_boxes_norm), cxcywh_to_xyxy(pred_boxes)
    )                                               # [B, G, Q]
    cost = cost_class * cls_cost + cost_bbox * l1 - cost_giou * giou
    q = pred_boxes.shape[1]
    raw, _ = jax.vmap(
        lambda c, rv: hungarian_match(c, rv, jnp.ones((q,), bool))
    )(cost, gt_valid)
    ok = (raw >= 0) & gt_valid
    return jnp.clip(raw, 0), ok


def detr_set_criterion(
    pred_logits: jnp.ndarray,
    pred_boxes: jnp.ndarray,
    gt_boxes_norm: jnp.ndarray,
    gt_classes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    num_classes: int,
    eos_coef: float = 0.1,
    use_focal: bool = False,
    prefix: str = "",
) -> Dict[str, jnp.ndarray]:
    """One decoder level's losses (SetCriterion, detr.py:475)."""
    b, q, _ = pred_logits.shape
    pred_of_gt, ok = detr_match(
        jax.lax.stop_gradient(pred_logits),
        jax.lax.stop_gradient(pred_boxes),
        gt_boxes_norm, gt_classes, gt_valid,
        use_focal=use_focal,
    )
    num_boxes = jnp.maximum(jnp.sum(ok.astype(jnp.float32)), 1.0)

    # per-query class target: "no object" unless matched. Unmatched gts
    # scatter to the out-of-range slot q (dropped) so they can't clobber
    # query 0 via the clipped index.
    tgt = jnp.full((b, q), num_classes, jnp.int32)
    tgt = tgt.at[
        jnp.arange(b)[:, None], jnp.where(ok, pred_of_gt, q)
    ].set(gt_classes.astype(jnp.int32), mode="drop")
    if use_focal:
        onehot = jax.nn.one_hot(tgt, num_classes + 1)[..., :num_classes]
        loss_ce = jnp.sum(
            sigmoid_focal_loss(pred_logits[..., :num_classes], onehot)
        ) / num_boxes
    else:
        weights = jnp.concatenate(
            [jnp.ones((num_classes,)), jnp.asarray([eos_coef])]
        )
        ce = weighted_softmax_cross_entropy(pred_logits, tgt, weights)
        loss_ce = jnp.sum(ce) / jnp.sum(weights[tgt])

    matched_boxes = jnp.take_along_axis(
        pred_boxes, pred_of_gt[..., None], axis=1
    )                                               # [B, G, 4]
    okf = ok.astype(jnp.float32)
    loss_bbox = jnp.sum(
        jnp.abs(matched_boxes - gt_boxes_norm).sum(-1) * okf
    ) / num_boxes
    giou_mat = jax.vmap(pairwise_generalized_box_iou)(
        cxcywh_to_xyxy(matched_boxes), cxcywh_to_xyxy(gt_boxes_norm)
    )
    giou_diag = jnp.diagonal(giou_mat, axis1=1, axis2=2)
    loss_giou = jnp.sum((1.0 - giou_diag) * okf) / num_boxes

    # cardinality (logging only in the reference — no grad)
    pred_count = jnp.sum(
        jnp.argmax(pred_logits, axis=-1) != num_classes, axis=-1
    ).astype(jnp.float32)
    card_err = jnp.mean(
        jnp.abs(pred_count - jnp.sum(gt_valid, axis=-1).astype(jnp.float32))
    )

    return {
        f"{prefix}loss_ce": loss_ce,
        f"{prefix}loss_bbox": 5.0 * loss_bbox,
        f"{prefix}loss_giou": 2.0 * loss_giou,
        f"{prefix}cardinality_error": jax.lax.stop_gradient(card_err),
    }


def detr_losses(
    out: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    num_classes: int,
    input_hw,
    deep_supervision: bool = True,
    eos_coef: float = 0.1,
    use_focal: bool = False,
) -> Dict[str, jnp.ndarray]:
    h, w = input_hw
    scale = jnp.asarray([w, h, w, h], jnp.float32)
    gt_xyxy = batch["gt_boxes"] / scale
    gt_norm = jnp.concatenate(
        [
            (gt_xyxy[..., 0:2] + gt_xyxy[..., 2:4]) * 0.5,
            gt_xyxy[..., 2:4] - gt_xyxy[..., 0:2],
        ],
        axis=-1,
    )
    losses = detr_set_criterion(
        out["pred_logits"], out["pred_boxes"],
        gt_norm, batch["gt_classes"], batch["gt_valid"],
        num_classes, eos_coef, use_focal,
    )
    # segmentation term (DETRsegm: dice + focal on matched query masks,
    # reference SetCriterion loss_masks)
    if "pred_masks" in out and "gt_masks" in batch:
        from yolov7_d2_tpu.ops.losses import dice_loss, sigmoid_focal_loss

        pred_of_gt, ok = detr_match(
            jax.lax.stop_gradient(out["pred_logits"]),
            jax.lax.stop_gradient(out["pred_boxes"]),
            gt_norm, batch["gt_classes"], batch["gt_valid"],
            use_focal=use_focal,
        )
        masks = out["pred_masks"]                       # [B, Q, Hm, Wm]
        b_, _, hm, wm = masks.shape
        g_ = batch["gt_masks"].shape[1]
        gt_small = (
            jax.image.resize(
                batch["gt_masks"].astype(jnp.float32), (b_, g_, hm, wm),
                "bilinear",
            ) > 0.5
        ).astype(jnp.float32)
        matched = jnp.take_along_axis(
            masks, pred_of_gt[..., None, None], axis=1
        )
        okf = ok.astype(jnp.float32)
        num_m = jnp.maximum(jnp.sum(okf), 1.0)
        mp = jax.nn.sigmoid(matched).reshape(b_, g_, -1)
        mt = gt_small.reshape(b_, g_, -1)
        losses["loss_mask_dice"] = jnp.sum(
            dice_loss(mp, mt, smooth=1.0) * okf
        ) / num_m
        losses["loss_mask_focal"] = jnp.sum(
            sigmoid_focal_loss(
                matched.reshape(b_, g_, -1), mt
            ).mean(-1) * okf
        ) / num_m
    if deep_supervision:
        L = out["aux_logits"].shape[0]
        for i in range(L):
            aux = detr_set_criterion(
                out["aux_logits"][i], out["aux_boxes"][i],
                gt_norm, batch["gt_classes"], batch["gt_valid"],
                num_classes, eos_coef, use_focal, prefix=f"aux{i}_",
            )
            losses.update(aux)
    total = sum(
        v for k, v in losses.items() if "cardinality" not in k
    )
    losses["total_loss"] = total
    return losses


def detr_postprocess(
    out: Dict[str, jnp.ndarray],
    input_hw,
    max_detections: int = 100,
) -> Detections:
    """Softmax scores (no-object dropped), boxes scaled to input pixels."""
    h, w = input_hw
    prob = jax.nn.softmax(out["pred_logits"], axis=-1)[..., :-1]
    scores = jnp.max(prob, axis=-1)
    classes = jnp.argmax(prob, axis=-1)
    boxes = cxcywh_to_xyxy(out["pred_boxes"]) * jnp.asarray(
        [w, h, w, h], jnp.float32
    )
    top_scores, top_idx = jax.lax.top_k(scores, max_detections)
    return Detections(
        boxes=jnp.take_along_axis(boxes, top_idx[..., None], axis=1),
        scores=top_scores,
        classes=jnp.take_along_axis(classes, top_idx, axis=1).astype(jnp.int32),
        valid=top_scores > 0.0,
    )


@META_ARCH_REGISTRY.register(name="Detr")
def build_detr(cfg, dtype: Optional[Any] = None):
    dtype = dtype or (jnp.bfloat16 if cfg.SOLVER.AMP.ENABLED else jnp.float32)
    d = cfg.MODEL.DETR
    return DETR(
        num_classes=d.NUM_CLASSES,
        hidden_dim=d.HIDDEN_DIM,
        num_queries=d.NUM_OBJECT_QUERIES,
        nheads=d.NHEADS,
        enc_layers=d.ENC_LAYERS,
        dec_layers=d.DEC_LAYERS,
        dim_feedforward=d.DIM_FEEDFORWARD,
        dropout=d.DROPOUT,
        pre_norm=d.PRE_NORM,
        resnet_depth=cfg.MODEL.RESNETS.DEPTH,
        remat=d.REMAT,
        dtype=dtype,
    )
