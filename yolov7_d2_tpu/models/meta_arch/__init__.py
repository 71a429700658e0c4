from yolov7_d2_tpu.models.meta_arch import sparseinst, yolov7, yolox  # noqa: F401
from yolov7_d2_tpu.models.meta_arch.sparseinst import (  # noqa: F401
    SparseInst,
    build_sparseinst,
    sparseinst_losses,
    sparseinst_postprocess,
)
from yolov7_d2_tpu.models.meta_arch.yolov7 import (  # noqa: F401
    AnchorYOLO,
    anchor_yolo_loss_fn,
    anchor_yolo_postprocess,
    build_yolo,
    build_yolov7,
)
from yolov7_d2_tpu.models.meta_arch.yolox import (  # noqa: F401
    YOLOX,
    build_yolox,
    yolox_loss_fn,
    yolox_postprocess,
)
from yolov7_d2_tpu.models.meta_arch import yolof, yolov6, yolox_kpts  # noqa: F401
from yolov7_d2_tpu.models.meta_arch import detr  # noqa: F401
from yolov7_d2_tpu.models.meta_arch import solov2  # noqa: F401
from yolov7_d2_tpu.models.meta_arch import detr_variants  # noqa: F401
from yolov7_d2_tpu.models.meta_arch import detr_seg, yolomask  # noqa: F401
from yolov7_d2_tpu.models.meta_arch import mask_rcnn, panoptic_fpn  # noqa: F401
