from yolov7_d2_tpu.models.necks import yolo_pafpn  # noqa: F401
from yolov7_d2_tpu.models.necks.yolo_pafpn import YOLOPAFPN, build_yolo_pafpn  # noqa: F401
from yolov7_d2_tpu.models.necks import bifpn, reppan, yolo_fpn  # noqa: F401
from yolov7_d2_tpu.models.necks import fpn  # noqa: F401
