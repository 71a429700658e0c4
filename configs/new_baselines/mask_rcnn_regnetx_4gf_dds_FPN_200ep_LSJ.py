"""Reference configs/new_baselines/mask_rcnn_regnetx_4gf_dds_FPN_200ep_LSJ.py."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common.models.mask_rcnn_fpn import model  # noqa: E402

train = dict(
    max_iter=368750,  # 200 ep
    output_dir="./output/mask_rcnn_regnetx_4gf_dds_FPN_200ep_LSJ",
    ims_per_batch=64,
    input_size=(1024, 1024),
)
optimizer = dict(name="sgd", base_lr=0.1, momentum=0.9, weight_decay=4e-5)
