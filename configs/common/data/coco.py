"""LazyConfig COCO data fragment (reference configs/common/data/coco.py):
train/test dataloaders as LazyCalls over the catalog + mappers."""

from yolov7_d2_tpu.config.lazy import LazyCall
from yolov7_d2_tpu.data.catalog import DatasetCatalog
from yolov7_d2_tpu.data.loader import (
    build_detection_test_loader,
    build_detection_train_loader,
)
from yolov7_d2_tpu.data.mappers import SimpleDatasetMapper, YOLOXDatasetMapper

dataloader = dict(
    train=dict(
        dataset="coco_2017_train",
        mapper=LazyCall(YOLOXDatasetMapper)(cfg=None, is_train=True),
        total_batch_size=64,
        num_workers=4,
    ),
    test=dict(
        dataset="coco_2017_val",
        mapper=LazyCall(SimpleDatasetMapper)(cfg=None, is_train=False),
        num_workers=4,
    ),
    evaluator=dict(type="COCOEvaluator"),
)
