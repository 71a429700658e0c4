"""LazyConfig Mask R-CNN FPN for keypoints (reference
configs/common/models/mask_rcnn_fpn_kps.py). The keypoint capability is
carried by the YOLOX-KPTS pose path (meta_arch/yolox_kpts.py) — here the
RCNN detector is configured for the person class, feeding the same OKS
evaluator (evaluation/coco_eval.py)."""

from yolov7_d2_tpu.config.lazy import LazyCall
from yolov7_d2_tpu.models.meta_arch.mask_rcnn import MaskRCNN

model = LazyCall(MaskRCNN)(
    num_classes=1,          # person
    resnet_depth=50,
    fpn_channels=256,
    mask_on=False,
    num_proposals=128,
)
