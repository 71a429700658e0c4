"""LazyConfig example (the reference's second config universe,
configs/common/*.py + tools/lazyconfig_train_net.py)."""

from yolov7_d2_tpu.config.lazy import LazyCall
from yolov7_d2_tpu.models.meta_arch.yolox import YOLOX

model = LazyCall(YOLOX)(
    num_classes=80,
    depth_mul=0.33,
    width_mul=0.50,
)

train = dict(
    max_iter=150000,
    output_dir="./output/yolox_s_lazy",
    checkpointer=dict(period=5000, max_to_keep=5),
)

optimizer = dict(name="sgd", base_lr=0.02, momentum=0.9, weight_decay=5e-4)
