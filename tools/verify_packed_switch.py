"""End-to-end drive of the packed-shard DISABLE_AT_ITER path through the
REAL train_det.main: synthetic mini-COCO -> geometry + plain shards ->
SwitchingPackedLoader + DevicePhotometric lax.cond crossing the switch
iteration. Verification harness for DATALOADER.PACKED_CACHE_PLAIN_DIR."""
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run():
    import cv2

    from yolov7_d2_tpu.config import get_cfg
    from yolov7_d2_tpu.data.catalog import DatasetCatalog
    from yolov7_d2_tpu.data.packed_cache import (
        write_geometry_shards,
        write_plain_shards,
    )

    root = tempfile.mkdtemp(prefix="packed_verify_")
    rng = np.random.default_rng(0)
    records = []
    for i in range(12):
        img = rng.integers(0, 255, (96, 128, 3), np.uint8)
        path = os.path.join(root, f"im{i}.png")
        cv2.imwrite(path, img)
        records.append({
            "file_name": path, "height": 96, "width": 128, "image_id": i,
            "annotations": [{
                "bbox": [8.0, 8.0, 48.0, 48.0], "bbox_mode": 0,
                "category_id": i % 3, "iscrowd": 0,
            }],
        })
    DatasetCatalog.register("packed_verify_train", lambda: records)
    DatasetCatalog.register("packed_verify_val", lambda: records[:2])

    cfg = get_cfg()
    cfg.MODEL.YOLO.CLASSES = 3
    cfg.MODEL.YOLO.WIDTH_MUL = 0.125
    cfg.MODEL.YOLO.DEPTH_MUL = 0.33
    cfg.INPUT.INPUT_SIZE = [64, 64]
    cfg.INPUT.MOSAIC_AND_MIXUP.ENABLED = True
    cfg.INPUT.MOSAIC_AND_MIXUP.ENABLE_MIXUP = True
    cfg.INPUT.MOSAIC_AND_MIXUP.MOSAIC_WIDTH_RANGE = [64, 64]
    cfg.INPUT.MOSAIC_AND_MIXUP.MOSAIC_HEIGHT_RANGE = [64, 64]
    cfg.INPUT.DISTORTION.ENABLED = True
    cfg.freeze()

    geo_dir = os.path.join(root, "geo")
    plain_dir = os.path.join(root, "plain")
    n1 = write_geometry_shards(records, cfg, geo_dir, epochs=2, shard_size=8)
    n2 = write_plain_shards(records, cfg, plain_dir, shard_size=8)
    print(f"shards written: geometry {n1}, plain {n2}", flush=True)

    import train_det
    from yolov7_d2_tpu.utils.args import default_argument_parser

    out_dir = os.path.join(root, "out")
    args = default_argument_parser().parse_args([
        "--config-file", "configs/coco/yolox_s.yaml",
        "MODEL.YOLO.CLASSES", "3",
        "MODEL.YOLO.WIDTH_MUL", "0.125",
        "MODEL.YOLO.DEPTH_MUL", "0.33",
        "INPUT.INPUT_SIZE", "[64,64]",
        "DATASETS.TRAIN", "('packed_verify_train',)",
        "DATASETS.TEST", "('packed_verify_val',)",
        "DATALOADER.PACKED_CACHE_DIR", geo_dir,
        "DATALOADER.PACKED_CACHE_PLAIN_DIR", plain_dir,
        "INPUT.MOSAIC_AND_MIXUP.DISABLE_AT_ITER", "3",
        "SOLVER.MAX_ITER", "6",
        "SOLVER.IMS_PER_BATCH", "4",
        "SOLVER.CHECKPOINT_PERIOD", "100",
        "TEST.EVAL_PERIOD", "0",
        "OUTPUT_DIR", out_dir,
    ])
    train_det.main(args)
    print("packed DISABLE_AT_ITER drive: OK", flush=True)


if __name__ == "__main__":
    run()
