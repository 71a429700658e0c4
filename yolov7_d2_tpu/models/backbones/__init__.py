from yolov7_d2_tpu.models.backbones import darknet, darknetx, resnet  # noqa: F401
from yolov7_d2_tpu.models.backbones.darknet import (  # noqa: F401
    Darknet53,
    build_cspdarknet_backbone,
    build_darknet_backbone,
)
from yolov7_d2_tpu.models.backbones.darknetx import (  # noqa: F401
    CSPDarknetX,
    build_cspdarknetx_backbone,
)
from yolov7_d2_tpu.models.backbones.resnet import (  # noqa: F401
    ResNet,
    build_resnet_backbone,
    build_resnet_vd_backbone,
)
from yolov7_d2_tpu.models.backbones import (  # noqa: F401
    convnext,
    efficientnet,
    efficientrep,
    pvt_v2,
    regnet,
    res2net,
    swin,
)
from yolov7_d2_tpu.models.backbones import dla, mobile, yolov5  # noqa: F401
