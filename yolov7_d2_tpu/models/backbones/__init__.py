from yolov7_d2_tpu.models.backbones import darknetx  # noqa: F401
from yolov7_d2_tpu.models.backbones.darknetx import (  # noqa: F401
    CSPDarknetX,
    build_cspdarknetx_backbone,
)
