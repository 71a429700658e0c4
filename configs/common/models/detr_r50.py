"""LazyConfig DETR-R50 model fragment (second config universe)."""

from yolov7_d2_tpu.config.lazy import LazyCall
from yolov7_d2_tpu.models.meta_arch.detr import DETR

model = LazyCall(DETR)(
    num_classes=80,
    hidden_dim=256,
    num_queries=100,
    enc_layers=6,
    dec_layers=6,
    resnet_depth=50,
)
