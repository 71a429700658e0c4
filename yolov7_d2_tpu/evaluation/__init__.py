from yolov7_d2_tpu.evaluation.coco_eval import (  # noqa: F401
    COCOEvaluator,
    COCOMaskEvaluator,
    box_iou_matrix,
    mask_iou_matrix,
    polygons_to_mask,
)
