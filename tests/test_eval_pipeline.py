"""COCO-eval round trip on a mini dataset through the full jitted eval path
(loader -> model -> postprocess -> evaluator), SURVEY §4's missing-test
item for the reference."""

import json

import cv2
import jax
import numpy as np
import pytest

from yolov7_d2_tpu.config import get_cfg
from yolov7_d2_tpu.data.coco import load_coco_json
from yolov7_d2_tpu.data.loader import build_detection_test_loader
from yolov7_d2_tpu.data.mappers import SimpleDatasetMapper
from yolov7_d2_tpu.evaluation.coco_eval import COCOEvaluator
from yolov7_d2_tpu.models.build import build_model
from yolov7_d2_tpu.models.meta_arch.yolox import yolox_postprocess


@pytest.fixture()
def mini_coco(tmp_path):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    images, annotations = [], []
    rng = np.random.default_rng(5)
    for i in range(5):
        img = rng.integers(0, 255, (96, 128, 3), np.uint8)
        cv2.imwrite(str(img_dir / f"im{i}.jpg"), img)
        images.append(
            {"id": i, "file_name": f"im{i}.jpg", "height": 96, "width": 128}
        )
        annotations.append(
            {"id": i, "image_id": i, "category_id": 1,
             "bbox": [10, 10, 40, 40], "area": 1600, "iscrowd": 0}
        )
    p = tmp_path / "ann.json"
    p.write_text(json.dumps({
        "images": images, "annotations": annotations,
        "categories": [{"id": 1, "name": "thing"}],
    }))
    return str(p), str(img_dir)


def test_eval_round_trip(mini_coco):
    json_file, image_root = mini_coco
    cfg = get_cfg()
    cfg.INPUT.INPUT_SIZE = [64, 64]
    cfg.MODEL.YOLO.CLASSES = 1
    cfg.MODEL.YOLO.DEPTH_MUL = 0.33
    cfg.MODEL.YOLO.WIDTH_MUL = 0.125
    cfg.MODEL.YOLO.NMS_PRE_TOPK = 64
    cfg.SOLVER.AMP.ENABLED = False
    cfg.freeze()

    records = load_coco_json(json_file, image_root)
    model = build_model(cfg)
    import jax.numpy as jnp

    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )

    @jax.jit
    def predict(variables, images):
        out = model.apply(variables, images, train=False)
        return yolox_postprocess(
            out, conf_threshold=0.0, max_detections=10, pre_nms_topk=64
        )

    mapper = SimpleDatasetMapper(cfg, is_train=False)
    loader = build_detection_test_loader(cfg, records, mapper, batch_size=2)
    evaluator = COCOEvaluator(1)
    n_images = 0
    for batch in loader:
        dets = jax.device_get(predict(variables, batch["image"]))
        for i in range(len(batch["image"])):
            scale = float(batch["scale"][i])
            v = dets.valid[i]
            evaluator.add_predictions(
                int(batch["image_id"][i]),
                dets.boxes[i][v] / scale, dets.scores[i][v],
                dets.classes[i][v],
            )
            gv = batch["gt_valid"][i]
            evaluator.add_gt(
                int(batch["image_id"][i]),
                batch["gt_boxes"][i][gv] / scale,
                batch["gt_classes"][i][gv],
            )
            n_images += 1
    assert n_images == 5
    res = evaluator.evaluate()
    # untrained model: the metric exists and is a sane number in [0, 1]
    assert 0.0 <= res["AP"] <= 1.0
    assert np.isfinite(res["AP50"])
