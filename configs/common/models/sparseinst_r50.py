from yolov7_d2_tpu.config.lazy import LazyCall
from yolov7_d2_tpu.models.meta_arch.sparseinst import SparseInst

model = LazyCall(SparseInst)(num_classes=80, num_masks=100, groups=4)
