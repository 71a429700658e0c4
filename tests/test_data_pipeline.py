import json
import os

import cv2
import numpy as np
import pytest

from yolov7_d2_tpu.config import get_cfg
from yolov7_d2_tpu.data.catalog import (
    DatasetCatalog,
    MetadataCatalog,
    register_coco_instances,
)
from yolov7_d2_tpu.data.coco import load_coco_json
from yolov7_d2_tpu.data.loader import DataLoader
from yolov7_d2_tpu.data.mappers import SimpleDatasetMapper, YOLOXDatasetMapper
from yolov7_d2_tpu.data.transforms import augment as A


@pytest.fixture()
def mini_coco(tmp_path):
    """5-image synthetic COCO dataset on disk."""
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    images, annotations = [], []
    ann_id = 1
    rng = np.random.default_rng(0)
    for i in range(5):
        h, w = 80 + 10 * i, 100 + 5 * i
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        name = f"im{i}.jpg"
        cv2.imwrite(str(img_dir / name), img)
        images.append({"id": i + 1, "file_name": name, "height": h, "width": w})
        for _ in range(2):
            x, y = int(rng.integers(0, w - 30)), int(rng.integers(0, h - 30))
            bw, bh = int(rng.integers(10, 25)), int(rng.integers(10, 25))
            annotations.append(
                {
                    "id": ann_id, "image_id": i + 1,
                    "category_id": int(rng.choice([1, 2, 3])),
                    "bbox": [x, y, bw, bh], "area": bw * bh, "iscrowd": 0,
                }
            )
            ann_id += 1
    js = {
        "images": images,
        "annotations": annotations,
        "categories": [
            {"id": 1, "name": "a"}, {"id": 2, "name": "b"}, {"id": 3, "name": "c"},
        ],
    }
    json_path = tmp_path / "ann.json"
    json_path.write_text(json.dumps(js))
    return str(json_path), str(img_dir)


def test_load_coco_json(mini_coco):
    json_file, image_root = mini_coco
    records = load_coco_json(json_file, image_root)
    assert len(records) == 5
    r = records[0]
    assert os.path.exists(r["file_name"])
    assert len(r["annotations"]) == 2
    # category ids remapped to contiguous [0, 2]
    cats = {a["category_id"] for rec in records for a in rec["annotations"]}
    assert cats <= {0, 1, 2}


def test_register_and_catalog(mini_coco):
    json_file, image_root = mini_coco
    name = "unit_mini_coco"
    DatasetCatalog.remove(name)
    register_coco_instances(name, {}, json_file, image_root)
    records = DatasetCatalog.get(name)
    assert len(records) == 5
    assert MetadataCatalog.get(name).thing_classes == ["a", "b", "c"]


def test_simple_mapper_static_shapes(mini_coco):
    json_file, image_root = mini_coco
    records = load_coco_json(json_file, image_root)
    cfg = get_cfg()
    cfg.INPUT.INPUT_SIZE = [64, 64]
    cfg.MODEL.YOLO.MAX_BOXES_NUM = 10
    mapper = SimpleDatasetMapper(cfg, is_train=True)
    s = mapper(records[0])
    assert s["image"].shape == (64, 64, 3)
    assert s["gt_boxes"].shape == (10, 4)
    assert s["gt_valid"].sum() == 2
    # boxes stay inside the canvas
    assert s["gt_boxes"].max() <= 64.0


def test_yolox_mapper_mosaic_path(mini_coco):
    json_file, image_root = mini_coco
    records = load_coco_json(json_file, image_root)
    cfg = get_cfg()
    cfg.INPUT.INPUT_SIZE = [64, 64]
    cfg.MODEL.YOLO.MAX_BOXES_NUM = 30
    cfg.INPUT.MOSAIC_AND_MIXUP.ENABLED = True
    cfg.INPUT.MOSAIC_AND_MIXUP.MOSAIC_WIDTH_RANGE = [64, 64]
    cfg.INPUT.MOSAIC_AND_MIXUP.MOSAIC_HEIGHT_RANGE = [64, 64]
    mapper = YOLOXDatasetMapper(cfg, is_train=True, seed=1)
    shapes = set()
    for r in records * 3:
        s = mapper(r)
        shapes.add(s["image"].shape)
    assert shapes == {(64, 64, 3)}  # static whatever the aug path
    # disabling aug falls back to the plain path
    mapper.enable_aug = False
    s = mapper(records[0])
    assert s["image"].shape == (64, 64, 3)


def test_loader_batches_and_epochs(mini_coco):
    json_file, image_root = mini_coco
    records = load_coco_json(json_file, image_root)
    cfg = get_cfg()
    cfg.INPUT.INPUT_SIZE = [64, 64]
    mapper = SimpleDatasetMapper(cfg, is_train=False)
    loader = DataLoader(
        records, mapper, batch_size=2, shuffle=False, infinite=False,
        drop_last=False,
    )
    batches = list(loader)
    assert sum(b["image"].shape[0] for b in batches) == 5
    assert batches[0]["image"].shape == (2, 64, 64, 3)
    assert batches[0]["gt_boxes"].shape == (2, 100, 4)


def test_letterbox_box_geometry():
    img = np.zeros((50, 100, 3), np.uint8)
    boxes = np.array([[10.0, 10.0, 30.0, 30.0]])
    out, b, r = A.letterbox(img, boxes, (64, 64))
    assert out.shape == (64, 64, 3)
    assert r == pytest.approx(0.64)
    np.testing.assert_allclose(b[0], np.array([10, 10, 30, 30]) * 0.64)
    # pad region filled with gray
    assert out[40, 0].tolist() == [114, 114, 114]


def test_hflip_roundtrip():
    img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    boxes = np.array([[0.0, 0.0, 1.0, 2.0]])
    img2, b2 = A.hflip(img, boxes)
    img3, b3 = A.hflip(img2, b2)
    np.testing.assert_array_equal(img, img3)
    np.testing.assert_allclose(boxes, b3)


def test_random_perspective_keeps_boxes_in_canvas():
    rng = np.random.default_rng(0)
    img = np.full((80, 80, 3), 200, np.uint8)
    boxes = np.array([[10.0, 10.0, 60.0, 60.0]])
    classes = np.array([1])
    out, b, c = A.random_perspective(
        img, boxes, classes, rng, target_size=(64, 64)
    )
    assert out.shape == (64, 64, 3)
    if len(b):
        assert b.min() >= 0 and b.max() <= 64


def test_mosaic4_combines_labels():
    rng = np.random.default_rng(0)
    imgs = [np.full((40, 40, 3), i * 60, np.uint8) for i in range(4)]
    boxes = [np.array([[5.0, 5.0, 30.0, 30.0]]) for _ in range(4)]
    classes = [np.array([i]) for i in range(4)]
    canvas, b, c = A.mosaic4(imgs, boxes, classes, (40, 40), rng)
    assert canvas.shape == (80, 80, 3)
    assert len(b) == len(c) and len(b) >= 1
    assert b.max() <= 80


def test_mixup_unions_labels():
    rng = np.random.default_rng(0)
    a = np.zeros((64, 64, 3), np.uint8)
    bimg = np.full((64, 64, 3), 255, np.uint8)
    out, boxes, classes = A.mixup(
        a, np.array([[1.0, 1.0, 10.0, 10.0]]), np.array([0]),
        bimg, np.array([[5.0, 5.0, 40.0, 40.0]]), np.array([1]), rng,
    )
    assert out.shape == (64, 64, 3)
    assert len(boxes) == 2 and set(classes.tolist()) == {0, 1}
    assert out.mean() > 50  # blended toward the bright image


def test_grid_mask_zeroes_pixels():
    rng = np.random.default_rng(0)
    img = np.full((32, 32, 3), 255, np.uint8)
    out = A.grid_mask(img, rng, mode=0)
    assert (out == 0).any()
    assert out.shape == img.shape


def test_hsv_distort_valid_range():
    rng = np.random.default_rng(0)
    img = np.random.default_rng(1).integers(0, 255, (16, 16, 3), np.uint8)
    out = A.hsv_distort(img, rng)
    assert out.dtype == np.uint8 and out.shape == img.shape


def test_multiscale_schedule_deterministic():
    from yolov7_d2_tpu.data.multiscale import (
        MultiScaleMapperWrapper,
        default_size_set,
        size_for_step,
    )

    sizes = default_size_set(320, span=2)
    assert all(s[0] % 32 == 0 for s in sizes)
    # constant within an interval, deterministic across "hosts"
    assert size_for_step(0, sizes) == size_for_step(9, sizes)
    assert size_for_step(5, sizes, seed=1) == size_for_step(5, sizes, seed=1)
    # changes over buckets (with high probability over 20 buckets)
    picked = {size_for_step(i * 10, sizes) for i in range(20)}
    assert len(picked) > 1


def test_multiscale_mapper_wrapper(mini_coco):
    from yolov7_d2_tpu.config import get_cfg
    from yolov7_d2_tpu.data.coco import load_coco_json
    from yolov7_d2_tpu.data.mappers import SimpleDatasetMapper
    from yolov7_d2_tpu.data.multiscale import MultiScaleMapperWrapper

    json_file, image_root = mini_coco
    records = load_coco_json(json_file, image_root)
    cfg = get_cfg()
    mapper = SimpleDatasetMapper(cfg, is_train=False)
    ms = MultiScaleMapperWrapper(mapper, [(32, 32), (64, 64)], interval=1)
    shapes = set()
    for step in range(4):
        ms.step = step
        shapes.add(ms(records[0])["image"].shape)
    assert shapes <= {(32, 32, 3), (64, 64, 3)}
    assert len(shapes) >= 1


def test_mapper_keypoints(tmp_path):
    img_dir = tmp_path / "kimgs"
    img_dir.mkdir()
    img = np.zeros((100, 200, 3), np.uint8)
    cv2.imwrite(str(img_dir / "k.jpg"), img)
    kpts = [0.0] * (17 * 3)
    kpts[0:3] = [50.0, 40.0, 2.0]      # one visible keypoint at (50, 40)
    record = {
        "file_name": str(img_dir / "k.jpg"), "height": 100, "width": 200,
        "image_id": 0,
        "annotations": [{
            "bbox": [20, 20, 60, 60], "bbox_mode": 5, "category_id": 0,
            "iscrowd": 0, "area": 3600, "keypoints": kpts,
        }],
    }
    cfg = get_cfg()
    cfg.INPUT.INPUT_SIZE = [64, 64]
    cfg.MODEL.YOLO.MAX_BOXES_NUM = 4
    cfg.MODEL.KEYPOINT_ON = True
    mapper = SimpleDatasetMapper(cfg, is_train=False)
    s = mapper(record)
    assert s["gt_keypoints"].shape == (4, 17, 3)
    # scale = 64/200 = 0.32
    np.testing.assert_allclose(
        s["gt_keypoints"][0, 0], [50 * 0.32, 40 * 0.32, 2.0], rtol=1e-5
    )
    assert s["gt_keypoints"][1].sum() == 0  # padded instance slots are zero


def test_loader_overlaps_host_mapping_with_compute():
    """Round-1 gap: prove the producer/prefetch design keeps the consumer
    fed — steady-state loop time tracks max(map, step), not their sum.
    Mapping sleeps 8ms/sample (IO-bound stand-in, releases the GIL) across
    4 worker threads at bs=4 (~8ms/batch); the consumer 'step' sleeps
    30ms. Overlapped: ~30ms/iter. Serial would be >=38ms/iter."""
    import time
    from yolov7_d2_tpu.data.loader import DataLoader

    records = [{"i": i} for i in range(64)]

    def mapper(rec):
        time.sleep(0.008)
        return {"image": np.full((8, 8, 3), rec["i"], np.float32)}

    loader = DataLoader(records, mapper, batch_size=4, num_workers=4,
                        prefetch=4, infinite=True)
    it = iter(loader)
    next(it)  # spin-up
    iters = 15
    t0 = time.perf_counter()
    for _ in range(iters):
        next(it)
        time.sleep(0.030)  # consumer compute
    per_iter = (time.perf_counter() - t0) / iters
    # Compare against the measured consumer-only cost (captures this
    # host's time.sleep overshoot) instead of a hard-coded wall time:
    # overlapped per-iter should be close to consumer-only; serial would
    # add the full ~8ms batch production on top.
    t1 = time.perf_counter()
    for _ in range(iters):
        time.sleep(0.030)
    consumer_only = (time.perf_counter() - t1) / iters
    assert per_iter < consumer_only + 0.004, (
        f"loader did not overlap: {per_iter*1e3:.1f}ms vs consumer-only "
        f"{consumer_only*1e3:.1f}ms"
    )
