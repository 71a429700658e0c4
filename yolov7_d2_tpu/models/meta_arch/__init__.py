from yolov7_d2_tpu.models.meta_arch import yolox  # noqa: F401
from yolov7_d2_tpu.models.meta_arch.yolox import (  # noqa: F401
    YOLOX,
    build_yolox,
    yolox_loss_fn,
    yolox_postprocess,
)
