"""Canary: a tiny YOLOX actually LEARNS — after a short overfit on
synthetic bright-square data, eval AP on the training images becomes
strongly positive (the executable analogue of the reference's
configs/canaries smoke-training runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov7_d2_tpu.config import get_cfg
from yolov7_d2_tpu.engine import build_yolox_system
from yolov7_d2_tpu.evaluation.coco_eval import COCOEvaluator
from yolov7_d2_tpu.models.meta_arch.yolox import yolox_postprocess

S = 64


def _synthetic_batch(rng, b=8):
    imgs = np.full((b, S, S, 3), 40.0, np.float32)
    boxes = np.zeros((b, 4, 4), np.float32)
    valid = np.zeros((b, 4), bool)
    for i in range(b):
        x = int(rng.integers(4, 36))
        y = int(rng.integers(4, 36))
        w = int(rng.integers(14, 24))
        h = int(rng.integers(14, 24))
        imgs[i, y : y + h, x : x + w] = 220.0
        boxes[i, 0] = [x, y, x + w, y + h]
        valid[i, 0] = True
    return {
        "image": jnp.asarray(imgs),
        "gt_boxes": jnp.asarray(boxes),
        "gt_classes": jnp.zeros((b, 4), jnp.int32),
        "gt_valid": jnp.asarray(valid),
    }


@pytest.mark.slow
def test_canary_overfit_reaches_positive_ap():
    cfg = get_cfg()
    cfg.INPUT.INPUT_SIZE = [S, S]
    cfg.MODEL.YOLO.CLASSES = 1
    cfg.MODEL.YOLO.MAX_BOXES_NUM = 4
    cfg.MODEL.YOLO.DEPTH_MUL = 0.33
    cfg.MODEL.YOLO.WIDTH_MUL = 0.125
    cfg.SOLVER.BASE_LR = 0.005
    cfg.SOLVER.WARMUP_ITERS = 10
    cfg.SOLVER.LR_SCHEDULER_NAME = "WarmupCosineLR"
    cfg.SOLVER.MAX_ITER = 200
    cfg.SOLVER.AMP.ENABLED = False

    model, state, train_step, _ = build_yolox_system(cfg, batch_size=8)
    rng = np.random.default_rng(0)
    batch = _synthetic_batch(rng)  # fixed batch: pure overfit
    step = jax.jit(train_step)
    for i in range(150):
        state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total_loss"]))

    @jax.jit
    def predict(state, images):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, train=False,
        )
        return yolox_postprocess(
            out, conf_threshold=0.05, nms_threshold=0.65,
            max_detections=10, pre_nms_topk=256,
        )

    dets = jax.device_get(predict(state, batch["image"]))
    ev = COCOEvaluator(num_classes=1)
    gt_boxes = np.asarray(batch["gt_boxes"])
    gt_valid = np.asarray(batch["gt_valid"])
    for i in range(8):
        ev.add_gt(i, gt_boxes[i][gt_valid[i]], np.zeros(1, np.int64))
        v = dets.valid[i]
        ev.add_predictions(
            i, dets.boxes[i][v], dets.scores[i][v], dets.classes[i][v]
        )
    res = ev.evaluate()
    # overfit on 8 fixed images must find the squares
    assert res["AP50"] > 0.5, res
