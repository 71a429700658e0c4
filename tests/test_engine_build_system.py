"""build_system must wire a working jitted train step for every family."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov7_d2_tpu.config import get_cfg
from yolov7_d2_tpu.engine import build_system


def _cfg(arch, **yolo):
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = arch
    cfg.INPUT.INPUT_SIZE = [64, 64]
    cfg.MODEL.YOLO.CLASSES = 3
    cfg.MODEL.YOLO.MAX_BOXES_NUM = 4
    cfg.MODEL.YOLO.DEPTH_MUL = 0.33
    cfg.MODEL.YOLO.WIDTH_MUL = 0.25
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.DETR.NUM_CLASSES = 3
    cfg.MODEL.DETR.HIDDEN_DIM = 32
    cfg.MODEL.DETR.NHEADS = 4
    cfg.MODEL.DETR.ENC_LAYERS = 1
    cfg.MODEL.DETR.DEC_LAYERS = 1
    cfg.MODEL.DETR.DIM_FEEDFORWARD = 64
    cfg.MODEL.DETR.NUM_OBJECT_QUERIES = 8
    cfg.MODEL.DETR.NUM_QUERY_POSITION = 9
    cfg.MODEL.DETR.NUM_QUERY_PATTERN = 2
    cfg.MODEL.DETR.SPATIAL_PRIOR = "grid"
    cfg.MODEL.SPARSE_INST.DECODER.NUM_CLASSES = 3
    cfg.MODEL.SPARSE_INST.DECODER.NUM_MASKS = 8
    cfg.MODEL.SPARSE_INST.DECODER.KERNEL_DIM = 16
    cfg.MODEL.SPARSE_INST.ENCODER.NUM_CHANNELS = 32
    cfg.MODEL.SOLOV2.NUM_CLASSES = 3
    cfg.MODEL.SOLOV2.NUM_GRIDS = [8, 6, 4, 4, 2]
    cfg.MODEL.SOLOV2.NUM_KERNELS = 16
    cfg.MODEL.SOLOV2.INSTANCE_CHANNELS = 32
    cfg.MODEL.SOLOV2.MASK_CHANNELS = 16
    cfg.SOLVER.AMP.ENABLED = False
    for k, v in yolo.items():
        cfg.MODEL.YOLO[k] = v
    return cfg


def _batch(fields, b=2, g=4, s=64):
    batch = {
        "image": jnp.full((b, s, s, 3), 114.0),
        "gt_boxes": jnp.tile(jnp.array([[[8.0, 8.0, 40.0, 40.0]]]), (b, g, 1)),
        "gt_classes": jnp.ones((b, g), jnp.int32),
        "gt_valid": jnp.zeros((b, g), bool).at[:, 0].set(True),
    }
    if "gt_masks" in fields:
        m = np.zeros((b, g, s, s), np.float32)
        m[:, 0, 8:40, 8:40] = 1.0
        batch["gt_masks"] = jnp.asarray(m)
    if "gt_keypoints" in fields:
        k = np.zeros((b, g, 17, 3), np.float32)
        k[:, 0, :, 0] = 20.0
        k[:, 0, :, 1] = 20.0
        k[:, 0, :5, 2] = 2.0
        batch["gt_keypoints"] = jnp.asarray(k)
    return {k: v for k, v in batch.items() if k in fields}


@pytest.mark.parametrize(
    "arch",
    [
        "YOLOX", "YOLO", "YOLOV5", "YOLOV6", "YOLOV7", "YOLOF",
        "YOLOX_KPTS", "SparseInst", "SOLOv2", "Detr", "AnchorDetr",
        "YOLOMask", "DetrSegm",
    ],
)
def test_build_system_one_step(arch):
    cfg = _cfg(arch)
    model, state, train_step, fields = build_system(cfg, batch_size=2)
    batch = _batch(fields)
    step = jax.jit(train_step)
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total_loss"])), arch
    assert int(new_state.step) == 1
