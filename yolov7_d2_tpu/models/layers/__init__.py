from yolov7_d2_tpu.models.layers.blocks import (  # noqa: F401
    BaseConv,
    Bottleneck,
    CSPLayer,
    DWConv,
    Focus,
    RepVGGBlock,
    SPPBottleneck,
    get_activation,
)
