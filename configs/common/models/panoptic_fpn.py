"""LazyConfig Panoptic FPN model (reference
configs/common/models/panoptic_fpn.py)."""

from yolov7_d2_tpu.config.lazy import LazyCall
from yolov7_d2_tpu.models.meta_arch.panoptic_fpn import PanopticFPNShared

model = LazyCall(PanopticFPNShared)(
    num_classes=80,
    sem_seg_classes=54,
    resnet_depth=50,
    fpn_channels=256,
)
