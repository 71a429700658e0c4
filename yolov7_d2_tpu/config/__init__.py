from yolov7_d2_tpu.config.cfg_node import CfgNode, load_yaml_with_base  # noqa: F401
from yolov7_d2_tpu.config.defaults import get_cfg, add_yolo_config  # noqa: F401
from yolov7_d2_tpu.config.lazy import LazyCall, LazyConfig, instantiate  # noqa: F401
