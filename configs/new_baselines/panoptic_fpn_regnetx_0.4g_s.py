"""Reference configs/new_baselines/panoptic_fpn_regnetx_0.4g_s.py (small)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common.models.panoptic_fpn import model  # noqa: E402

model["fpn_channels"] = 128
train = dict(
    max_iter=270000,
    output_dir="./output/panoptic_fpn_regnetx_0.4g_s",
    ims_per_batch=32,
)
optimizer = dict(name="sgd", base_lr=0.01, momentum=0.9, weight_decay=1e-4)
