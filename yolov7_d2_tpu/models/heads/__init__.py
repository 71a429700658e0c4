from yolov7_d2_tpu.models.heads import (  # noqa: F401
    anchor_yolo_head,
    sem_seg_head,
    yolox_head,
)
from yolov7_d2_tpu.models.heads.anchor_yolo_head import (  # noqa: F401
    AnchorYOLOHead,
    anchor_yolo_losses,
    build_targets_max_iou,
    build_targets_ratio,
    decode_anchor_outputs,
    flatten_anchor_outputs,
)
from yolov7_d2_tpu.models.heads.sem_seg_head import (  # noqa: F401
    SemSegFPNHead,
    build_sem_seg_head,
)
from yolov7_d2_tpu.models.heads.yolox_head import (  # noqa: F401
    YOLOXHead,
    decode_outputs,
    simota_assign,
    yolox_losses,
)
