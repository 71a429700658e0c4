"""Every shipped YAML must load cleanly and build its model."""

import glob
import os

import pytest

from yolov7_d2_tpu.config import LazyConfig, get_cfg, instantiate
from yolov7_d2_tpu.models.build import build_model

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
YAMLS = sorted(glob.glob(f"{REPO}/configs/**/*.yaml", recursive=True))


@pytest.mark.parametrize("path", YAMLS, ids=[os.path.relpath(p, REPO) for p in YAMLS])
def test_yaml_loads_and_builds(path):
    cfg = get_cfg()
    cfg.merge_from_file(path)
    cfg.freeze()
    model = build_model(cfg)
    assert model is not None


def test_lazyconfig_loads():
    cfg = LazyConfig.load(f"{REPO}/configs/common/yolox_s_lazy.py")
    model = instantiate(cfg["model"])
    assert model.num_classes == 80
    assert cfg["train"]["max_iter"] == 150000
