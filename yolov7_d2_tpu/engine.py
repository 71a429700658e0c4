"""High-level assembly: cfg -> (model, train_step, eval_step, state).

The counterpart of the reference's Trainer subclass wiring in
/root/reference/train_det.py:21-50 — build_model/build_optimizer/
build_train_loader composition — as plain functions returning jittable
pieces.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from yolov7_d2_tpu.models.build import build_model
from yolov7_d2_tpu.models.meta_arch.yolox import yolox_loss_fn, yolox_postprocess
from yolov7_d2_tpu.train.optimizer import build_optimizer
from yolov7_d2_tpu.train.train_state import (
    TrainState,
    make_eval_step,
    make_train_step,
)


def resolve_simota_prefilter(cfg) -> Optional[int]:
    """MODEL.YOLO.SIMOTA_PREFILTER_TOPK -> effective top-K (None = off).

    0 = auto: max(1024, A // 4) where A is the anchor count at
    INPUT.INPUT_SIZE over strides 8/16/32 — keeps the kept fraction of
    anchors constant as the input grows, so the exactness condition
    (geometric candidate set fits in K) degrades no faster at 1280px
    than at 640px.
    """
    v = cfg.MODEL.YOLO.SIMOTA_PREFILTER_TOPK
    if v < 0:
        return None
    if v > 0:
        return int(v)
    h, w = cfg.INPUT.INPUT_SIZE
    a_total = sum((h // s) * (w // s) for s in (8, 16, 32))
    return max(1024, a_total // 4)


def make_yolox_loss_adapter(
    num_classes: int, prefilter_topk: Optional[int] = 2048
):
    """Loss fn whose L1 term is gated by a *traced* flag, so the
    L1-enable schedule (reference yolox.py:105-121) lives inside one
    compiled step instead of two recompilations."""

    def loss_fn(head_out, batch, use_l1_flag) -> Dict[str, jnp.ndarray]:
        losses = yolox_loss_fn(head_out, batch, num_classes, use_l1=True,
                               prefilter_topk=prefilter_topk)
        flag = jnp.asarray(use_l1_flag, jnp.float32)
        l1 = losses["loss_l1"] * flag
        total = losses["loss_iou"] + losses["loss_obj"] + losses["loss_cls"] + l1
        return {
            "loss_iou": losses["loss_iou"],
            "loss_obj": losses["loss_obj"],
            "loss_cls": losses["loss_cls"],
            "loss_l1": l1,
            "num_fg": losses["num_fg"],
            "total_loss": total,
        }

    return loss_fn


def dummy_batch(
    cfg, batch_size: int = 2, input_size: Optional[Tuple[int, int]] = None
) -> Dict[str, jnp.ndarray]:
    h, w = input_size or cfg.INPUT.INPUT_SIZE
    g = cfg.MODEL.YOLO.MAX_BOXES_NUM
    return {
        "image": jnp.full((batch_size, h, w, 3), 114.0, jnp.float32),
        "gt_boxes": jnp.tile(
            jnp.asarray([[10.0, 10.0, 50.0, 50.0]]), (batch_size, g, 1)
        ),
        "gt_classes": jnp.zeros((batch_size, g), jnp.int32),
        "gt_valid": jnp.zeros((batch_size, g), bool).at[:, 0].set(True),
    }


def build_yolox_system(cfg, rng: Optional[jax.Array] = None, batch_size: int = 2):
    """Build (model, state, train_step, eval_step) for the YOLOX family."""
    rng = rng if rng is not None else jax.random.PRNGKey(max(cfg.SEED, 0))
    model = build_model(cfg)
    sample = dummy_batch(cfg, batch_size)
    tx = None
    # init params first, optimizer needs the param tree for masks
    variables = model.init(rng, sample["image"], train=False)
    tx = build_optimizer(cfg, variables["params"])
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        ema_params=(
            jax.tree.map(jnp.copy, variables["params"])
            if cfg.SOLVER.EMA.ENABLED
            else None
        ),
    )
    loss_fn = make_yolox_loss_adapter(
        cfg.MODEL.YOLO.CLASSES, prefilter_topk=resolve_simota_prefilter(cfg)
    )
    # L1 turns on when strong aug turns off (reference yolox semantics)
    use_l1_after = cfg.INPUT.MOSAIC_AND_MIXUP.DISABLE_AT_ITER
    train_step = make_train_step(
        model,
        loss_fn,
        tx,
        ema_decay=cfg.SOLVER.EMA.DECAY if cfg.SOLVER.EMA.ENABLED else 0.0,
        use_l1_after=use_l1_after,
        remat=cfg.TPU.REMAT,
        seed=max(cfg.SEED, 0),
    )

    def postprocess(head_out):
        return yolox_postprocess(
            head_out,
            conf_threshold=cfg.MODEL.YOLO.CONF_THRESHOLD,
            nms_threshold=cfg.MODEL.YOLO.NMS_THRESHOLD,
            max_detections=cfg.MODEL.YOLO.MAX_DETECTIONS,
            pre_nms_topk=cfg.MODEL.YOLO.NMS_PRE_TOPK,
        )

    eval_step = make_eval_step(model, postprocess)
    return model, state, train_step, eval_step


# ---------------------------------------------------------------------------
# generic builder: dispatch any registered meta-arch to its loss wiring
# ---------------------------------------------------------------------------

def _make_state(model, cfg, rng, batch_size):
    h, w = cfg.INPUT.INPUT_SIZE
    variables = model.init(
        rng, jnp.zeros((batch_size, h, w, 3), jnp.float32), train=False
    )
    tx = build_optimizer(cfg, variables["params"])
    return variables, tx, TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        ema_params=(
            jax.tree.map(jnp.copy, variables["params"])
            if cfg.SOLVER.EMA.ENABLED else None
        ),
    )


def build_system(cfg, rng: Optional[jax.Array] = None, batch_size: int = 2):
    """cfg -> (model, state, train_step, batch_fields) for ANY registered
    meta-architecture (the generic counterpart of the reference's per-script
    Trainer subclasses)."""
    import numpy as np

    arch = cfg.MODEL.META_ARCHITECTURE
    rng = rng if rng is not None else jax.random.PRNGKey(max(cfg.SEED, 0))

    if arch == "YOLOX":
        model, state, train_step, _ = build_yolox_system(cfg, rng, batch_size)
        return model, state, train_step, (
            "image", "gt_boxes", "gt_classes", "gt_valid",
        )

    model = build_model(cfg)
    variables, tx, state = _make_state(model, cfg, rng, batch_size)
    h, w = cfg.INPUT.INPUT_SIZE
    nc = cfg.MODEL.YOLO.CLASSES
    fields = ("image", "gt_boxes", "gt_classes", "gt_valid")

    if arch in ("YOLO", "YOLOV5", "YOLOV7", "YOLOV7P"):
        from yolov7_d2_tpu.models.meta_arch.yolov7 import (
            _anchors_from_cfg,
            anchor_yolo_loss_fn,
        )

        anchors = np.asarray(_anchors_from_cfg(cfg), np.float32)
        variant = "yolov5" if arch == "YOLOV5" else (
            cfg.MODEL.YOLO.VARIANT if arch == "YOLO" else "yolov7"
        )
        btype = cfg.MODEL.YOLO.LOSS.BUILD_TARGET_TYPE
        if arch == "YOLOV5":
            btype = "yolov5"

        lcfg = cfg.MODEL.YOLO.LOSS
        lambdas = dict(
            lambda_iou=lcfg.LAMBDA_IOU, lambda_conf=lcfg.LAMBDA_CONF,
            lambda_cls=lcfg.LAMBDA_CLS, lambda_xy=lcfg.LAMBDA_XY,
            lambda_wh=lcfg.LAMBDA_WH,
        )
        # the reference exposes LOSS_TYPE v4 on both the YOLO and YOLOV7
        # archs (yolov7.py:546 branches on it)
        loss_type = "v4" if cfg.MODEL.YOLO.LOSS_TYPE == "v4" else "v7"

        def loss_fn(out, batch, use_l1_flag):
            return anchor_yolo_loss_fn(
                out, batch, anchors, nc,
                variant=variant, build_target_type=btype,
                iou_type=cfg.MODEL.YOLO.IOU_TYPE,
                loss_type=loss_type,
                ignore_threshold=max(cfg.MODEL.YOLO.IGNORE_THRESHOLD, 0.5),
                lambdas=lambdas,
            )

    elif arch == "YOLOV6":
        from yolov7_d2_tpu.models.meta_arch.yolov6 import yolov6_losses

        def loss_fn(out, batch, use_l1_flag):
            return yolov6_losses(out, batch, nc)

    elif arch == "YOLOF":
        from yolov7_d2_tpu.models.meta_arch.yolof import yolof_losses

        def loss_fn(out, batch, use_l1_flag):
            return yolof_losses(out, batch, nc)

    elif arch == "YOLOX_KPTS":
        from yolov7_d2_tpu.models.meta_arch.yolox_kpts import yolox_kpts_losses

        fields = fields + ("gt_keypoints",)

        def loss_fn(out, batch, use_l1_flag):
            return yolox_kpts_losses(
                out, batch, num_classes=1,
                num_keypoints=cfg.MODEL.YOLO.KEYPOINTS_NUM,
            )

    elif arch == "SparseInst":
        from yolov7_d2_tpu.models.meta_arch.sparseinst import sparseinst_losses

        fields = ("image", "gt_masks", "gt_classes", "gt_valid")
        li = cfg.MODEL.SPARSE_INST.LOSS

        def loss_fn(out, batch, use_l1_flag):
            return sparseinst_losses(
                out, batch["gt_masks"], batch["gt_classes"],
                batch["gt_valid"],
                num_classes=cfg.MODEL.SPARSE_INST.DECODER.NUM_CLASSES,
                class_weight=li.CLASS_WEIGHT,
                mask_pixel_weight=li.MASK_PIXEL_WEIGHT,
                mask_dice_weight=li.MASK_DICE_WEIGHT,
                objectness_weight=li.OBJECTNESS_WEIGHT,
            )

    elif arch == "SOLOv2":
        from yolov7_d2_tpu.models.meta_arch.solov2 import solov2_losses

        fields = ("image", "gt_masks", "gt_boxes", "gt_classes", "gt_valid")

        def loss_fn(out, batch, use_l1_flag):
            return solov2_losses(
                out, batch["gt_masks"], batch["gt_boxes"],
                batch["gt_classes"], batch["gt_valid"], (h, w),
                num_classes=cfg.MODEL.SOLOV2.NUM_CLASSES,
                num_grids=tuple(cfg.MODEL.SOLOV2.NUM_GRIDS),
            )

    elif arch in ("Detr", "DetrD2go", "AnchorDetr", "SMCADetr", "DABDetr",
                  "DetrSegm"):
        from yolov7_d2_tpu.models.meta_arch.detr import detr_losses

        use_focal = (
            cfg.MODEL.DETR.USE_FOCAL_LOSS or arch == "AnchorDetr"
        )
        if arch == "DetrSegm":
            fields = fields + ("gt_masks",)

        def loss_fn(out, batch, use_l1_flag):
            return detr_losses(
                out, batch, cfg.MODEL.DETR.NUM_CLASSES, (h, w),
                deep_supervision=cfg.MODEL.DETR.DEEP_SUPERVISION,
                eos_coef=cfg.MODEL.DETR.NO_OBJECT_WEIGHT,
                use_focal=use_focal,
            )

    elif arch in ("MaskRCNN", "FasterRCNN"):
        from yolov7_d2_tpu.models.meta_arch.mask_rcnn import mask_rcnn_losses

        if arch == "MaskRCNN" and cfg.MODEL.MASK_ON:
            fields = ("image", "gt_masks", "gt_boxes", "gt_classes", "gt_valid")

        _roi = cfg.MODEL.ROI_HEADS

        def loss_fn(out, batch, use_l1_flag, rng=None):
            return mask_rcnn_losses(
                out, batch, _roi.NUM_CLASSES,
                sample_mode=_roi.SAMPLE_MODE,
                rpn_batch=cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE,
                rpn_pos_frac=cfg.MODEL.RPN.POSITIVE_FRACTION,
                roi_batch=_roi.BATCH_SIZE_PER_IMAGE,
                roi_pos_frac=_roi.POSITIVE_FRACTION,
                rng=rng,
            )

    elif arch == "PanopticFPN":
        from yolov7_d2_tpu.models.meta_arch.panoptic_fpn import panoptic_losses

        fields = (
            "image", "gt_masks", "gt_boxes", "gt_classes", "gt_valid",
            "gt_sem_seg",
        )

        def loss_fn(out, batch, use_l1_flag, rng=None):
            return panoptic_losses(
                out, batch,
                cfg.MODEL.ROI_HEADS.NUM_CLASSES,
                cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES,
                sample_mode=cfg.MODEL.ROI_HEADS.SAMPLE_MODE,
                rng=rng,
            )

    elif arch == "YOLOMask":
        from yolov7_d2_tpu.models.meta_arch.yolomask import yolomask_losses
        from yolov7_d2_tpu.models.meta_arch.yolov7 import _anchors_from_cfg

        anchors = np.asarray(_anchors_from_cfg(cfg), np.float32)
        fields = fields + ("gt_masks",)
        image_hw = tuple(cfg.INPUT.INPUT_SIZE)

        def loss_fn(out, batch, use_l1_flag):
            # reference OrienMaskYOLOLoss semantics (yolomask.py:431):
            # detection + orientation terms in one criterion
            return yolomask_losses(
                out, batch, nc, anchors, image_hw,
                obj_ignore_threshold=max(
                    cfg.MODEL.YOLO.IGNORE_THRESHOLD, 0.5),
            )

    else:
        raise ValueError(f"No training wiring for meta-arch '{arch}'")

    train_step = make_train_step(
        model, loss_fn, tx,
        ema_decay=cfg.SOLVER.EMA.DECAY if cfg.SOLVER.EMA.ENABLED else 0.0,
        remat=cfg.TPU.REMAT,
        seed=max(cfg.SEED, 0),
    )
    return model, state, train_step, fields
