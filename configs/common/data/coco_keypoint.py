"""LazyConfig COCO keypoint data fragment (reference
configs/common/data/coco_keypoint.py): the keypoint flip-index handling
lives in the mapper (data/mappers.py keypoint_hflip_indices — the
counterpart of d2's create_keypoint_hflip_indices)."""

from yolov7_d2_tpu.config.lazy import LazyCall
from yolov7_d2_tpu.data.mappers import SimpleDatasetMapper

dataloader = dict(
    train=dict(
        dataset="keypoints_coco_2017_train",
        mapper=LazyCall(SimpleDatasetMapper)(
            cfg=None, is_train=True, with_keypoints=True
        ),
        total_batch_size=64,
        num_workers=4,
    ),
    test=dict(
        dataset="keypoints_coco_2017_val",
        mapper=LazyCall(SimpleDatasetMapper)(
            cfg=None, is_train=False, with_keypoints=True
        ),
        num_workers=4,
    ),
    evaluator=dict(type="KeypointEvaluator"),
)
