"""Reference configs/new_baselines/mask_rcnn_R_50_FPN_100ep_LSJ.py:
Mask R-CNN R-50 FPN, 100-epoch large-scale-jitter schedule."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common.models.mask_rcnn_fpn import model  # noqa: E402,F401

train = dict(
    max_iter=184375,          # 100 ep * 118k / 64
    output_dir="./output/mask_rcnn_R_50_FPN_100ep_LSJ",
    ims_per_batch=64,
    input_size=(1024, 1024),  # LSJ crop size
    checkpointer=dict(period=5000, max_to_keep=5),
)
optimizer = dict(name="sgd", base_lr=0.1, momentum=0.9, weight_decay=4e-5)
