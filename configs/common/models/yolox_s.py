from yolov7_d2_tpu.config.lazy import LazyCall
from yolov7_d2_tpu.models.meta_arch.yolox import YOLOX

model = LazyCall(YOLOX)(num_classes=80, depth_mul=0.33, width_mul=0.50)
