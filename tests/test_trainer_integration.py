"""End-to-end smoke: tiny YOLOX trains on the synthetic mini-COCO set,
loss decreases-ish, checkpoint saves/restores, eval hook runs."""

import json

import cv2
import numpy as np
import pytest

from yolov7_d2_tpu.config import get_cfg
from yolov7_d2_tpu.data.coco import load_coco_json
from yolov7_d2_tpu.data.loader import build_detection_train_loader
from yolov7_d2_tpu.data.mappers import SimpleDatasetMapper
from yolov7_d2_tpu.engine import build_yolox_system
from yolov7_d2_tpu.parallel.mesh import build_mesh
from yolov7_d2_tpu.train.checkpoint import Checkpointer
from yolov7_d2_tpu.train.trainer import (
    IterationTimer,
    PeriodicCheckpointer,
    PeriodicWriter,
    Trainer,
)


@pytest.fixture()
def mini_dataset(tmp_path):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    images, annotations = [], []
    rng = np.random.default_rng(7)
    for i in range(8):
        img = np.full((64, 64, 3), 40, np.uint8)
        x, y = int(rng.integers(5, 30)), int(rng.integers(5, 30))
        img[y : y + 20, x : x + 20] = 220  # bright square = the object
        name = f"im{i}.jpg"
        cv2.imwrite(str(img_dir / name), img)
        images.append({"id": i, "file_name": name, "height": 64, "width": 64})
        annotations.append(
            {
                "id": i, "image_id": i, "category_id": 1,
                "bbox": [x, y, 20, 20], "area": 400, "iscrowd": 0,
            }
        )
    js = {
        "images": images, "annotations": annotations,
        "categories": [{"id": 1, "name": "square"}],
    }
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(js))
    return load_coco_json(str(p), str(img_dir))


def _tiny_cfg(tmp_path):
    cfg = get_cfg()
    cfg.INPUT.INPUT_SIZE = [64, 64]
    cfg.MODEL.YOLO.CLASSES = 1
    cfg.MODEL.YOLO.MAX_BOXES_NUM = 8
    cfg.MODEL.YOLO.DEPTH_MUL = 0.33
    cfg.MODEL.YOLO.WIDTH_MUL = 0.125
    cfg.SOLVER.IMS_PER_BATCH = 4
    cfg.SOLVER.BASE_LR = 0.01
    cfg.SOLVER.WARMUP_ITERS = 2
    cfg.SOLVER.MAX_ITER = 6
    cfg.SOLVER.AMP.ENABLED = False
    cfg.SOLVER.EMA.ENABLED = True
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    return cfg


def test_trainer_end_to_end(mini_dataset, tmp_path):
    cfg = _tiny_cfg(tmp_path)
    model, state, train_step, _ = build_yolox_system(cfg, batch_size=4)
    mapper = SimpleDatasetMapper(cfg, is_train=True)
    loader = build_detection_train_loader(cfg, mini_dataset, mapper)
    import jax

    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    # batch 4 -> a 4-device data mesh (mesh size must divide the batch)
    mesh = build_mesh((4, 1), ("data", "model"), devices=jax.devices()[:4])

    trainer = Trainer(
        train_step, state, loader, max_iter=6, mesh=mesh,
        hooks=[
            IterationTimer(),
            PeriodicCheckpointer(ckpt, period=5),
            PeriodicWriter(
                Trainer.default_writers(cfg.OUTPUT_DIR, 6, period=2), period=2
            ),
        ],
        output_dir=cfg.OUTPUT_DIR,
    )
    final_state = trainer.train()
    assert int(final_state.step) == 6
    # losses logged and finite
    latest = trainer.storage.latest()
    assert np.isfinite(latest["total_loss"])
    assert latest["num_fg"] >= 1
    # metrics.json written
    metrics_file = f"{cfg.OUTPUT_DIR}/metrics.json"
    lines = open(metrics_file).read().strip().splitlines()
    assert len(lines) >= 2

    # checkpoint round-trip
    import jax

    restored, step = ckpt.resume_or_load(jax.device_get(final_state), resume=True)
    assert step == 6
    a = jax.tree_util.tree_leaves(final_state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)


def test_loss_decreases_on_overfit(mini_dataset, tmp_path):
    """Sanity: repeated steps on one batch reduce the loss."""
    import jax

    cfg = _tiny_cfg(tmp_path)
    cfg.SOLVER.BASE_LR = 0.002
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.LR_SCHEDULER_NAME = "WarmupCosineLR"
    cfg.SOLVER.MAX_ITER = 100
    model, state, train_step, _ = build_yolox_system(cfg, batch_size=2)
    mapper = SimpleDatasetMapper(cfg, is_train=False)
    from yolov7_d2_tpu.data.loader import stack_batch

    batch = stack_batch([mapper(mini_dataset[0]), mapper(mini_dataset[1])])
    batch = {
        k: v for k, v in batch.items()
        if k in ("image", "gt_boxes", "gt_classes", "gt_valid")
    }
    step_fn = jax.jit(train_step)
    first = None
    for i in range(30):
        state, metrics = step_fn(state, batch)
        if i == 0:
            first = float(metrics["total_loss"])
    last = float(metrics["total_loss"])
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first, (first, last)


def test_multiscale_hook_advances_mapper(mini_dataset, tmp_path):
    import jax

    from yolov7_d2_tpu.data.multiscale import MultiScaleMapperWrapper
    from yolov7_d2_tpu.train.trainer import MultiScaleHook

    cfg = _tiny_cfg(tmp_path)
    cfg.SOLVER.MAX_ITER = 3
    model, state, train_step, _ = build_yolox_system(cfg, batch_size=4)
    base_mapper = SimpleDatasetMapper(cfg, is_train=True)
    ms = MultiScaleMapperWrapper(base_mapper, [(64, 64)], interval=1)
    loader = build_detection_train_loader(cfg, mini_dataset, ms)
    mesh = build_mesh((4, 1), ("data", "model"), devices=jax.devices()[:4])
    trainer = Trainer(
        train_step, state, loader, max_iter=3, mesh=mesh,
        hooks=[MultiScaleHook(ms)], output_dir=cfg.OUTPUT_DIR,
    )
    trainer.train()
    assert ms.step == 3
