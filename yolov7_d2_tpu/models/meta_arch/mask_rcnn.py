"""Mask R-CNN (GeneralizedRCNN) — TPU-native.

The reference ships this family through detectron2's LazyConfig model zoo
(/root/reference/configs/common/models/mask_rcnn_fpn.py,
configs/new_baselines/*.py — SURVEY.md L0: the d2 substrate is part of the
capability surface; the reference's own meta_arch/maskrcnn_seg.py is an
empty placeholder). Rebuilt here TPU-first:

  * static shapes end-to-end: fixed per-level pre-NMS top-k, a fixed
    proposal count P after NMS (padded with validity masking), fixed ROI
    sampling — no dynamic shapes under jit;
  * ROIAlignV2 as a gather/bilinear XLA kernel (ops/roi_align.py) instead
    of the CUDA op;
  * matching/sampling as masked dense ops (no per-image python loops);
  * proposals are stop-gradiented (standard two-stage training).

Structure parity with mask_rcnn_fpn.py: ResNet+FPN (p2..p6), RPN with
3 aspect anchors per level, box head (2 FC, class-agnostic box deltas),
mask head (4 convs + deconv, per-class 28x28 logits).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from yolov7_d2_tpu.core.registry import META_ARCH_REGISTRY
from yolov7_d2_tpu.models.necks.fpn import ResNetFPN
from yolov7_d2_tpu.ops.iou import pairwise_box_iou
from yolov7_d2_tpu.ops.losses import sigmoid_binary_cross_entropy
from yolov7_d2_tpu.ops.nms import batched_nms_batched, nms_batched
from yolov7_d2_tpu.ops.roi_align import multilevel_roi_align, roi_align
from yolov7_d2_tpu.structures.instances import Detections

RPN_LEVELS = ("p2", "p3", "p4", "p5", "p6")
RPN_STRIDES = (4, 8, 16, 32, 64)
ANCHOR_SIZES = (32, 64, 128, 256, 512)
ASPECTS = (0.5, 1.0, 2.0)
ROI_LEVELS = ("p2", "p3", "p4", "p5")
ROI_STRIDES = (4, 8, 16, 32)


def _level_anchors(h: int, w: int, stride: int, size: int) -> np.ndarray:
    """[h*w*3, 4] xyxy anchors for one level (static, numpy at trace)."""
    ys = (np.arange(h) + 0.5) * stride
    xs = (np.arange(w) + 0.5) * stride
    cy, cx = np.meshgrid(ys, xs, indexing="ij")
    centers = np.stack([cx, cy], -1).reshape(-1, 1, 2)
    whs = np.array(
        [
            [size * np.sqrt(a), size / np.sqrt(a)]
            for a in ASPECTS
        ],
        np.float32,
    ).reshape(1, -1, 2)
    x0y0 = centers - whs / 2
    x1y1 = centers + whs / 2
    return np.concatenate([x0y0, x1y1], -1).reshape(-1, 4).astype(np.float32)


def decode_deltas(anchors, deltas, weights=(1.0, 1.0, 1.0, 1.0)):
    """Standard box-delta decode (d2 Box2BoxTransform)."""
    wx, wy, ww, wh = weights
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = (anchors[..., 0] + anchors[..., 2]) * 0.5
    ay = (anchors[..., 1] + anchors[..., 3]) * 0.5
    dx, dy, dw, dh = (
        deltas[..., 0] / wx, deltas[..., 1] / wy,
        deltas[..., 2] / ww, deltas[..., 3] / wh,
    )
    dw = jnp.clip(dw, -4.0, 4.0)
    dh = jnp.clip(dh, -4.0, 4.0)
    cx = ax + dx * aw
    cy = ay + dy * ah
    bw = aw * jnp.exp(dw)
    bh = ah * jnp.exp(dh)
    return jnp.stack(
        [cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], axis=-1
    )


def encode_deltas(anchors, boxes, weights=(1.0, 1.0, 1.0, 1.0)):
    wx, wy, ww, wh = weights
    aw = jnp.maximum(anchors[..., 2] - anchors[..., 0], 1e-4)
    ah = jnp.maximum(anchors[..., 3] - anchors[..., 1], 1e-4)
    ax = (anchors[..., 0] + anchors[..., 2]) * 0.5
    ay = (anchors[..., 1] + anchors[..., 3]) * 0.5
    bw = jnp.maximum(boxes[..., 2] - boxes[..., 0], 1e-4)
    bh = jnp.maximum(boxes[..., 3] - boxes[..., 1], 1e-4)
    bx = (boxes[..., 0] + boxes[..., 2]) * 0.5
    by = (boxes[..., 1] + boxes[..., 3]) * 0.5
    return jnp.stack(
        [
            wx * (bx - ax) / aw,
            wy * (by - ay) / ah,
            ww * jnp.log(bw / aw),
            wh * jnp.log(bh / ah),
        ],
        axis=-1,
    )


class MaskRCNN(nn.Module):
    num_classes: int = 80
    resnet_depth: int = 50
    fpn_channels: int = 256
    mask_on: bool = True
    num_proposals: int = 128       # static post-NMS proposal count
    pre_nms_topk: int = 256        # per level
    roi_size: int = 7
    mask_pool_size: int = 14
    fc_dim: int = 1024
    # d2 default: per-class box regression (one delta row per fg class,
    # d2 FastRCNNOutputLayers); True restores the class-agnostic single row
    cls_agnostic_bbox_reg: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, images: jnp.ndarray, train: bool = False, feats=None
    ) -> Dict[str, Any]:
        """``feats``: optional precomputed FPN dict (p2..p6) — PanopticFPN
        shares one FPN between the RCNN heads and the semantic head."""
        b = images.shape[0]
        if feats is None:
            mean = jnp.asarray([103.53, 116.28, 123.675])
            std = jnp.asarray([57.375, 57.12, 58.395])
            x = ((images - mean) / std).astype(self.dtype)
            feats = ResNetFPN(
                depth=self.resnet_depth, out_channels=self.fpn_channels,
                dtype=self.dtype, name="backbone",
            )(x, train)

        # ---- RPN head (shared across levels)
        rpn_conv = nn.Conv(self.fpn_channels, (3, 3),
                           padding=[(1, 1), (1, 1)], dtype=self.dtype,
                           param_dtype=jnp.float32, name="rpn_conv")
        rpn_obj = nn.Conv(len(ASPECTS), (1, 1), dtype=self.dtype,
                          param_dtype=jnp.float32, name="rpn_obj")
        rpn_delta = nn.Conv(len(ASPECTS) * 4, (1, 1), dtype=self.dtype,
                            param_dtype=jnp.float32, name="rpn_delta")

        obj_all, delta_all, anchor_all = [], [], []
        for name, stride, size in zip(RPN_LEVELS, RPN_STRIDES, ANCHOR_SIZES):
            f = nn.relu(rpn_conv(feats[name]))
            _, fh, fw, _ = f.shape
            obj = rpn_obj(f).reshape(b, fh * fw * len(ASPECTS))
            dl = rpn_delta(f).reshape(b, fh * fw * len(ASPECTS), 4)
            obj_all.append(obj.astype(jnp.float32))
            delta_all.append(dl.astype(jnp.float32))
            anchor_all.append(
                jnp.asarray(_level_anchors(fh, fw, stride, size))
            )

        # ---- proposals: per-level top-k -> decode -> NMS -> fixed P
        img_h, img_w = images.shape[1], images.shape[2]
        top_boxes, top_scores = [], []
        for obj, dl, anc in zip(obj_all, delta_all, anchor_all):
            k = min(self.pre_nms_topk, obj.shape[1])
            sc, idx = jax.lax.top_k(obj, k)
            sel_anc = anc[idx]                       # [B, k, 4]
            sel_dl = jnp.take_along_axis(dl, idx[..., None], axis=1)
            boxes = decode_deltas(sel_anc, sel_dl)
            boxes = jnp.stack(
                [
                    boxes[..., 0].clip(0, img_w),
                    boxes[..., 1].clip(0, img_h),
                    boxes[..., 2].clip(0, img_w),
                    boxes[..., 3].clip(0, img_h),
                ],
                axis=-1,
            )
            top_boxes.append(boxes)
            top_scores.append(sc)
        cand_boxes = jnp.concatenate(top_boxes, axis=1)
        cand_scores = jax.nn.sigmoid(jnp.concatenate(top_scores, axis=1))
        # degenerate candidates get zero score
        wh_ok = (
            (cand_boxes[..., 2] - cand_boxes[..., 0] > 1e-2)
            & (cand_boxes[..., 3] - cand_boxes[..., 1] > 1e-2)
        )
        cand_scores = jnp.where(wh_ok, cand_scores, 0.0)

        keep_idx, keep_valid = nms_batched(
            cand_boxes, cand_scores, 0.7, self.num_proposals
        )
        sel = jnp.clip(keep_idx, 0)
        prop_boxes = jnp.take_along_axis(cand_boxes, sel[..., None], axis=1)
        prop_scores = jnp.where(
            keep_valid, jnp.take_along_axis(cand_scores, sel, axis=1), 0.0
        )
        prop_valid = keep_valid
        prop_boxes = jax.lax.stop_gradient(prop_boxes)

        # ---- ROI box head
        def pool_one(per_img_feats, boxes, size):
            return multilevel_roi_align(
                per_img_feats, boxes, size,
                strides=ROI_STRIDES, level_names=ROI_LEVELS,
            )

        roi_feats = {k: feats[k].astype(jnp.float32) for k in ROI_LEVELS}
        pooled = jax.vmap(
            lambda fs, bx: pool_one(fs, bx, self.roi_size)
        )({k: roi_feats[k] for k in ROI_LEVELS}, prop_boxes)
        # [B, P, S, S, C] -> flatten
        flat = pooled.reshape(b, self.num_proposals, -1)
        h1 = nn.relu(nn.Dense(self.fc_dim, param_dtype=jnp.float32,
                              name="box_fc1")(flat))
        h2 = nn.relu(nn.Dense(self.fc_dim, param_dtype=jnp.float32,
                              name="box_fc2")(h1))
        cls_logits = nn.Dense(self.num_classes + 1, param_dtype=jnp.float32,
                              name="cls_score")(h2)
        if self.cls_agnostic_bbox_reg:
            box_deltas = nn.Dense(4, param_dtype=jnp.float32,
                                  name="bbox_pred")(h2)        # [B, P, 4]
        else:
            # d2 FastRCNNOutputLayers: one delta row per foreground class
            box_deltas = nn.Dense(
                self.num_classes * 4, param_dtype=jnp.float32,
                name="bbox_pred",
            )(h2).reshape(b, self.num_proposals, self.num_classes, 4)

        out = {
            "rpn_obj": jnp.concatenate(obj_all, axis=1),
            "rpn_deltas": jnp.concatenate(delta_all, axis=1),
            "anchors": jnp.concatenate(anchor_all, axis=0),
            "proposals": prop_boxes,
            "proposal_scores": prop_scores,
            "proposal_valid": prop_valid,
            "cls_logits": cls_logits,
            "box_deltas": box_deltas,
            "image_hw": (img_h, img_w),
        }

        if self.mask_on:
            mpooled = jax.vmap(
                lambda fs, bx: pool_one(fs, bx, self.mask_pool_size)
            )({k: roi_feats[k] for k in ROI_LEVELS}, prop_boxes)
            m = mpooled.reshape(
                b * self.num_proposals, self.mask_pool_size,
                self.mask_pool_size, -1,
            ).astype(self.dtype)
            for i in range(4):
                m = nn.relu(
                    nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)],
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"mask_conv_{i}")(m)
                )
            m = nn.relu(
                nn.ConvTranspose(256, (2, 2), strides=(2, 2),
                                 dtype=self.dtype, param_dtype=jnp.float32,
                                 name="mask_deconv")(m)
            )
            mlogits = nn.Conv(self.num_classes, (1, 1),
                              param_dtype=jnp.float32, dtype=jnp.float32,
                              name="mask_pred")(m)
            out["mask_logits"] = mlogits.reshape(
                b, self.num_proposals, self.mask_pool_size * 2,
                self.mask_pool_size * 2, self.num_classes,
            )
        return out


ROI_DELTA_WEIGHTS = (10.0, 10.0, 5.0, 5.0)


def _random_subset_mask(eligible, n_take, rng):
    """Static-shape analogue of d2's ``subsample_labels`` draw: a boolean
    mask selecting ``min(n_take, eligible.sum())`` uniformly-random True
    positions of ``eligible``. Implemented by ranking a lexicographic
    (eligible, uniform) key — all eligible elements sort first in random
    order — and thresholding the rank."""
    n = eligible.shape[0]
    u = jax.random.uniform(rng, (n,))
    order = jnp.argsort(-(eligible.astype(jnp.float32) * 2.0 + u))
    rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    n_take = jnp.minimum(n_take, eligible.sum())
    return eligible & (rank < n_take)


def mask_rcnn_losses(
    out: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    num_classes: int,
    rpn_pos_iou: float = 0.7,
    rpn_neg_iou: float = 0.3,
    roi_pos_iou: float = 0.5,
    sample_mode: str = "expectation",
    rpn_batch: int = 256,
    rpn_pos_frac: float = 0.5,
    roi_batch: int = 512,
    roi_pos_frac: float = 0.25,
    rng: Optional[jax.Array] = None,
) -> Dict[str, jnp.ndarray]:
    """Two training-semantics modes behind ``sample_mode``:

    * ``"expectation"``: masked dense matching — every anchor/proposal gets
      fg/bg weights; losses are weighted means (the expectation of d2's
      random sampling). Deterministic, no rng needed.
    * ``"sampled"``: d2 fidelity (reference
      configs/common/models/mask_rcnn_fpn.py:46-55) — per image, a random
      fixed-size subsample: RPN ``rpn_batch`` anchors at ``rpn_pos_frac``
      positives, ROI ``roi_batch`` proposals at ``roi_pos_frac`` positives
      (d2 ``subsample_labels``: n_pos = min(frac*batch, fg), remainder
      filled with negatives), losses normalized by the sampled count.
      Static shapes via _random_subset_mask; requires ``rng``.

    Per-class ``box_deltas`` ([B, P, C, 4], d2 FastRCNNOutputLayers) select
    the matched-class row for foreground proposals; class-agnostic
    ([B, P, 4]) use the single row.
    """
    sampled = sample_mode == "sampled"
    if sampled and rng is None:
        raise ValueError("sample_mode='sampled' requires an rng")
    gt_boxes = batch["gt_boxes"]
    gt_classes = batch["gt_classes"]
    gt_valid = batch["gt_valid"]
    anchors = out["anchors"]                       # [A, 4]

    has_masks = "gt_masks" in batch and "mask_logits" in out

    def per_image(rpn_obj, rpn_deltas, props, prop_valid, cls_logits,
                  box_deltas, mask_logits, gmasks, gts, gcls, gval, rng_i):
        # ---------------- RPN
        ious = pairwise_box_iou(anchors, gts)      # [A, G]
        ious = jnp.where(gval[None, :], ious, 0.0)
        best_iou = ious.max(axis=1)
        best_gt = ious.argmax(axis=1)
        is_fg = best_iou >= rpn_pos_iou
        # guarantee every valid gt owns its best anchor
        best_anchor = jnp.where(gval, ious.argmax(axis=0), -1)
        is_fg = is_fg.at[jnp.clip(best_anchor, 0)].set(
            jnp.where(gval, True, is_fg[jnp.clip(best_anchor, 0)])
        )
        is_bg = (best_iou < rpn_neg_iou) & ~is_fg
        if sampled:
            # d2 RPN sampling: 256/image, 50% positive fraction; negatives
            # fill whatever the positives leave (subsample_labels)
            r1, r2, r3, r4 = jax.random.split(rng_i, 4)
            n_pos_t = jnp.int32(round(rpn_batch * rpn_pos_frac))
            sel_fg = _random_subset_mask(is_fg, n_pos_t, r1)
            n_neg_t = rpn_batch - sel_fg.sum()
            sel_bg = _random_subset_mask(is_bg, n_neg_t, r2)
            norm = jnp.maximum(sel_fg.sum() + sel_bg.sum(), 1.0)
            obj_t = sel_fg.astype(jnp.float32)
            l_obj = (
                sigmoid_binary_cross_entropy(rpn_obj, obj_t)
                * (sel_fg | sel_bg)
            ).sum() / norm
            t_deltas = encode_deltas(anchors, gts[best_gt])
            l1 = jnp.abs(rpn_deltas - t_deltas).sum(-1)
            # d2 normalizes RPN localization by the same sampled-batch count
            l_rpn_box = (l1 * sel_fg).sum() / norm
        else:
            wsum = jnp.maximum(is_fg.sum() + is_bg.sum(), 1.0)
            obj_t = is_fg.astype(jnp.float32)
            l_obj = (
                sigmoid_binary_cross_entropy(rpn_obj, obj_t)
                * (is_fg | is_bg)
            ).sum() / wsum
            t_deltas = encode_deltas(anchors, gts[best_gt])
            l1 = jnp.abs(rpn_deltas - t_deltas).sum(-1)
            l_rpn_box = (l1 * is_fg).sum() / jnp.maximum(is_fg.sum(), 1.0)

        # ---------------- ROI heads
        pious = pairwise_box_iou(props, gts)       # [P, G]
        pious = jnp.where(gval[None, :], pious, 0.0)
        p_best = pious.max(axis=1)
        p_gt = pious.argmax(axis=1)
        p_fg = (p_best >= roi_pos_iou) & prop_valid
        p_bg = (~p_fg) & prop_valid
        if sampled:
            # d2 ROI sampling: 512/image at 25% positives
            n_pos_t = jnp.int32(round(roi_batch * roi_pos_frac))
            p_fg = _random_subset_mask(p_fg, n_pos_t, r3)
            n_neg_t = roi_batch - p_fg.sum()
            p_bg = _random_subset_mask(p_bg, n_neg_t, r4)
            p_sel = p_fg | p_bg
        else:
            p_sel = prop_valid
        target_cls = jnp.where(p_fg, gcls[p_gt], num_classes)  # bg = C
        n_sel = jnp.maximum(p_sel.sum(), 1.0)
        ce = -jax.nn.log_softmax(cls_logits)[
            jnp.arange(cls_logits.shape[0]), target_cls
        ]
        l_cls = (ce * p_sel).sum() / n_sel
        t_roi = encode_deltas(props, gts[p_gt], ROI_DELTA_WEIGHTS)
        if box_deltas.ndim == 3:
            # per-class regression: the matched class's delta row
            # (d2 FastRCNNOutputLayers.losses gather on gt_classes)
            cls_rows = jnp.clip(target_cls, 0, num_classes - 1)
            fg_deltas = jnp.take_along_axis(
                box_deltas, cls_rows[:, None, None], axis=1
            )[:, 0]                               # [P, 4]
        else:
            fg_deltas = box_deltas
        # d2 fast_rcnn: box loss summed over fg, normalized by the total
        # sampled count (gt_classes.numel()) in sampled mode
        box_norm = n_sel if sampled else jnp.maximum(p_fg.sum(), 1.0)
        l_roi_box = (
            jnp.abs(fg_deltas - t_roi).sum(-1) * p_fg
        ).sum() / box_norm

        losses = {
            "loss_rpn_cls": l_obj,
            "loss_rpn_loc": l_rpn_box,
            "loss_cls": l_cls,
            "loss_box_reg": l_roi_box,
        }

        # ---------------- mask head
        if has_masks:
            ms = mask_logits.shape[1]
            # matched GT mask cropped at the proposal box to ms x ms
            gmask = gmasks[p_gt]                   # [P, Hm, Wm]
            crops = jax.vmap(
                lambda m, bx: roi_align(
                    m[..., None].astype(jnp.float32), bx[None], ms
                )[0, ..., 0]
            )(gmask, props)                        # [P, ms, ms]
            # per-proposal logit plane of the TARGET class
            cls_sel = jnp.clip(target_cls, 0, num_classes - 1)
            logit = jnp.take_along_axis(
                mask_logits, cls_sel[:, None, None, None], axis=-1
            )[..., 0]
            lm = sigmoid_binary_cross_entropy(
                logit, (crops > 0.5).astype(jnp.float32)
            )
            losses["loss_mask"] = (
                lm.mean(axis=(1, 2)) * p_fg
            ).sum() / jnp.maximum(p_fg.sum(), 1.0)
        return losses

    dummy_masks = (
        batch["gt_masks"]
        if has_masks
        else jnp.zeros(gt_boxes.shape[:2] + (1, 1), jnp.float32)
    )
    dummy_mlogits = (
        out["mask_logits"]
        if has_masks
        else jnp.zeros(
            out["cls_logits"].shape[:2] + (1, 1, 1), jnp.float32
        )
    )
    b = gt_boxes.shape[0]
    rngs = (
        jax.random.split(rng, b)
        if sampled
        else jnp.zeros((b, 2), jnp.uint32)
    )
    per = jax.vmap(per_image)(
        out["rpn_obj"], out["rpn_deltas"], out["proposals"],
        out["proposal_valid"], out["cls_logits"], out["box_deltas"],
        dummy_mlogits, dummy_masks, gt_boxes, gt_classes, gt_valid, rngs,
    )
    totals = {k: v.mean() for k, v in per.items()}
    totals["total_loss"] = sum(totals.values())
    return totals


def mask_rcnn_postprocess(
    out: Dict[str, jnp.ndarray],
    score_threshold: float = 0.05,
    nms_threshold: float = 0.5,
    max_detections: int = 100,
) -> Detections:
    props = out["proposals"]                        # [B, P, 4]
    probs = jax.nn.softmax(out["cls_logits"], -1)[..., :-1]  # drop bg
    scores = probs.max(-1)
    classes = probs.argmax(-1)
    deltas = out["box_deltas"]
    if deltas.ndim == 4:
        # per-class regression: the predicted class's delta row
        deltas = jnp.take_along_axis(
            deltas, classes[..., None, None], axis=2
        )[..., 0, :]
    boxes = decode_deltas(props, deltas, ROI_DELTA_WEIGHTS)
    scores = jnp.where(
        (scores >= score_threshold) & out["proposal_valid"], scores, 0.0
    )

    keep_idx, keep_valid = batched_nms_batched(
        boxes, scores, classes, nms_threshold, max_detections
    )
    sel = jnp.clip(keep_idx, 0)
    return Detections(
        boxes=jnp.take_along_axis(boxes, sel[..., None], axis=1),
        scores=jnp.where(
            keep_valid, jnp.take_along_axis(scores, sel, axis=1), 0.0
        ),
        classes=jnp.take_along_axis(classes, sel, axis=1).astype(jnp.int32),
        valid=keep_valid,
    )


@META_ARCH_REGISTRY.register(name="MaskRCNN")
def build_mask_rcnn(cfg, dtype: Optional[Any] = None):
    dtype = dtype or (jnp.bfloat16 if cfg.SOLVER.AMP.ENABLED else jnp.float32)
    return MaskRCNN(
        num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
        resnet_depth=cfg.MODEL.RESNETS.DEPTH,
        fpn_channels=cfg.MODEL.FPN.OUT_CHANNELS,
        mask_on=cfg.MODEL.MASK_ON,
        num_proposals=cfg.MODEL.RPN.POST_NMS_TOPK,
        pre_nms_topk=cfg.MODEL.RPN.PRE_NMS_TOPK,
        cls_agnostic_bbox_reg=cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG,
        dtype=dtype,
    )


@META_ARCH_REGISTRY.register(name="FasterRCNN")
def build_faster_rcnn(cfg, dtype: Optional[Any] = None):
    dtype = dtype or (jnp.bfloat16 if cfg.SOLVER.AMP.ENABLED else jnp.float32)
    return MaskRCNN(
        num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
        resnet_depth=cfg.MODEL.RESNETS.DEPTH,
        fpn_channels=cfg.MODEL.FPN.OUT_CHANNELS,
        mask_on=False,
        num_proposals=cfg.MODEL.RPN.POST_NMS_TOPK,
        pre_nms_topk=cfg.MODEL.RPN.PRE_NMS_TOPK,
        cls_agnostic_bbox_reg=cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG,
        dtype=dtype,
    )
