from yolov7_d2_tpu.models.heads import yolox_head  # noqa: F401
from yolov7_d2_tpu.models.heads.yolox_head import (  # noqa: F401
    YOLOXHead,
    decode_outputs,
    simota_assign,
    yolox_losses,
)
