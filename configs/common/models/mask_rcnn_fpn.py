"""LazyConfig Mask R-CNN FPN model (reference
configs/common/models/mask_rcnn_fpn.py — d2's GeneralizedRCNN rebuilt
TPU-native in models/meta_arch/mask_rcnn.py)."""

from yolov7_d2_tpu.config.lazy import LazyCall
from yolov7_d2_tpu.models.meta_arch.mask_rcnn import MaskRCNN

model = LazyCall(MaskRCNN)(
    num_classes=80,
    resnet_depth=50,
    fpn_channels=256,
    mask_on=True,
    num_proposals=128,
)
