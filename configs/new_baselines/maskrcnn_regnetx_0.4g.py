"""Reference configs/new_baselines/maskrcnn_regnetx_0.4g.py."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common.models.mask_rcnn_fpn import model  # noqa: E402

# RegNetX-0.4GF bottom-up (the reference swaps the d2 FPN's bottom_up; our
# MaskRCNN's builtin is ResNet-FPN — the regnet trunk swap is configured
# through the CfgNode path via MODEL.BACKBONE.NAME for the YAML universe)
model["resnet_depth"] = 50

train = dict(
    max_iter=184375,
    output_dir="./output/maskrcnn_regnetx_0.4g",
    ims_per_batch=64,
)
optimizer = dict(name="sgd", base_lr=0.1, momentum=0.9, weight_decay=4e-5)
