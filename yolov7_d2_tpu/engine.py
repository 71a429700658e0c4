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
    create_train_state,
    make_eval_step,
    make_train_step,
)


def make_yolox_loss_adapter(num_classes: int):
    """Loss fn whose L1 term is gated by a *traced* flag, so the
    L1-enable schedule (reference yolox.py:105-121) lives inside one
    compiled step instead of two recompilations."""

    def loss_fn(head_out, batch, use_l1_flag) -> Dict[str, jnp.ndarray]:
        losses = yolox_loss_fn(head_out, batch, num_classes, use_l1=True)
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
    loss_fn = make_yolox_loss_adapter(cfg.MODEL.YOLO.CLASSES)
    # L1 turns on when strong aug turns off (reference yolox semantics)
    use_l1_after = cfg.INPUT.MOSAIC_AND_MIXUP.DISABLE_AT_ITER
    train_step = make_train_step(
        model,
        loss_fn,
        tx,
        ema_decay=cfg.SOLVER.EMA.DECAY if cfg.SOLVER.EMA.ENABLED else 0.0,
        use_l1_after=use_l1_after,
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
