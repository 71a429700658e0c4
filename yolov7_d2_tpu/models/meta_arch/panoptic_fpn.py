"""Panoptic FPN — Mask R-CNN + semantic-segmentation head on one FPN.

The reference ships this family through the d2 LazyConfig zoo
(/root/reference/configs/common/models/panoptic_fpn.py,
configs/new_baselines/panoptic_fpn_regnetx_0.4g*.py). TPU-native: the
MaskRCNN graph (mask_rcnn.py, static shapes) shares its FPN with a
SemSegFPNHead (heads/sem_seg_head.py) over p2..p5; panoptic fusion of
things + stuff happens in the host postprocess (the same combine logic as
d2's ``combine_semantic_and_instance_outputs``)."""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from yolov7_d2_tpu.core.registry import META_ARCH_REGISTRY
from yolov7_d2_tpu.models.heads.sem_seg_head import SemSegFPNHead
from yolov7_d2_tpu.models.meta_arch.mask_rcnn import MaskRCNN
from yolov7_d2_tpu.ops.losses import softmax_cross_entropy


class PanopticFPNShared(nn.Module):
    """Shared-FPN formulation: ONE ResNetFPN feeds both the RCNN heads
    (via the ``feats=`` argument of MaskRCNN) and the semantic head."""

    num_classes: int = 80
    sem_seg_classes: int = 54
    resnet_depth: int = 50
    fpn_channels: int = 256
    num_proposals: int = 128
    pre_nms_topk: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, images: jnp.ndarray, train: bool = False
    ) -> Dict[str, Any]:
        from yolov7_d2_tpu.models.necks.fpn import ResNetFPN

        mean = jnp.asarray([103.53, 116.28, 123.675])
        std = jnp.asarray([57.375, 57.12, 58.395])
        x = ((images - mean) / std).astype(self.dtype)
        feats = ResNetFPN(
            depth=self.resnet_depth, out_channels=self.fpn_channels,
            dtype=self.dtype, name="backbone",
        )(x, train)

        sem_logits = SemSegFPNHead(
            num_classes=self.sem_seg_classes, dtype=self.dtype,
            name="sem_seg_head",
        )([feats[f] for f in ("p2", "p3", "p4", "p5")], (4, 8, 16, 32), train)

        rcnn = MaskRCNN(
            num_classes=self.num_classes,
            resnet_depth=self.resnet_depth,
            fpn_channels=self.fpn_channels,
            mask_on=True,
            num_proposals=self.num_proposals,
            pre_nms_topk=self.pre_nms_topk,
            dtype=self.dtype,
            name="rcnn",
        )
        out = rcnn(images, train, feats=feats)
        out["sem_seg_logits"] = sem_logits
        return out


def panoptic_losses(
    out: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    num_classes: int,
    sem_seg_classes: int,
    sem_weight: float = 0.5,
    sample_mode: str = "expectation",
    rng=None,
) -> Dict[str, jnp.ndarray]:
    from yolov7_d2_tpu.models.meta_arch.mask_rcnn import mask_rcnn_losses

    losses = mask_rcnn_losses(
        out, batch, num_classes, sample_mode=sample_mode, rng=rng
    )
    if "gt_sem_seg" in batch and "sem_seg_logits" in out:
        logits = out["sem_seg_logits"]            # [B, Hs, Ws, S]
        hs, ws = logits.shape[1], logits.shape[2]
        tgt = batch["gt_sem_seg"]                 # [B, H, W] int
        tgt_small = jax.image.resize(
            tgt.astype(jnp.float32)[..., None],
            (tgt.shape[0], hs, ws, 1), "nearest",
        )[..., 0].astype(jnp.int32)
        valid = tgt_small < sem_seg_classes       # ignore label == S
        ce = softmax_cross_entropy(
            logits, jnp.clip(tgt_small, 0, sem_seg_classes - 1),
            sem_seg_classes,
        )
        l_sem = (ce * valid).sum() / jnp.maximum(valid.sum(), 1.0)
        losses["loss_sem_seg"] = sem_weight * l_sem
        losses["total_loss"] = losses["total_loss"] + losses["loss_sem_seg"]
    return losses


def combine_semantic_and_instance(
    sem_logits: np.ndarray,
    dets,
    overlap_threshold: float = 0.5,
    stuff_area_limit: int = 4096,
    instances_score_thresh: float = 0.5,
) -> np.ndarray:
    """Host-side panoptic fusion (d2 combine_semantic_and_instance_outputs
    semantics): paint confident instance masks by descending score, then
    large stuff regions. Returns an id map [H, W] (0 = void)."""
    h, w = sem_logits.shape[:2]
    panoptic = np.zeros((h, w), np.int32)
    next_id = 1
    order = np.argsort(-np.asarray(dets.scores))
    for i in order:
        if float(dets.scores[i]) < instances_score_thresh or not bool(
            dets.valid[i]
        ):
            continue
        mask = np.asarray(dets.masks[i]) > 0.5 if dets.masks is not None else None
        if mask is None:
            continue
        area = mask.sum()
        if area == 0:
            continue
        intersect = mask & (panoptic > 0)
        if intersect.sum() / area > overlap_threshold:
            continue
        panoptic[mask & (panoptic == 0)] = next_id
        next_id += 1
    sem = sem_logits.argmax(-1)
    for s in np.unique(sem):
        region = (sem == s) & (panoptic == 0)
        if region.sum() >= stuff_area_limit:
            panoptic[region] = next_id
            next_id += 1
    return panoptic


@META_ARCH_REGISTRY.register(name="PanopticFPN")
def build_panoptic_fpn(cfg, dtype: Optional[Any] = None):
    dtype = dtype or (jnp.bfloat16 if cfg.SOLVER.AMP.ENABLED else jnp.float32)
    return PanopticFPNShared(
        num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
        sem_seg_classes=cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES,
        resnet_depth=cfg.MODEL.RESNETS.DEPTH,
        fpn_channels=cfg.MODEL.FPN.OUT_CHANNELS,
        num_proposals=cfg.MODEL.RPN.POST_NMS_TOPK,
        pre_nms_topk=cfg.MODEL.RPN.PRE_NMS_TOPK,
        dtype=dtype,
    )
