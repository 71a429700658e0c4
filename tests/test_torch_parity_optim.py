"""Differential OPTIMIZER parity against the reference's own param-group
builder (/root/reference/yolov7/optimizer/build.py) driving
``torch.optim.{SGD,AdamW}``.

The forward/loss/gradient rungs are covered by test_torch_parity_grads.py;
this file pins the remaining training-dynamics layer: the d2go parameter
groups — per-param LR (``BIAS_LR_FACTOR``, ``LR_MULTIPLIER_OVERWRITE``,
build.py:78-117) and per-param weight decay (``WEIGHT_DECAY_NORM`` for
norm-module params incl. their biases, ``WEIGHT_DECAY_BIAS`` for other
biases, ``WEIGHT_DECAY_EMBED`` for embeddings, build.py:120-171) — plus
the optimizer arithmetic itself (SGD coupled decay + nesterov momentum,
AdamW decoupled decay with group-lr scaling, bias-corrected moments).

Method: a small torch model with one of every param class (conv
kernel/bias, BatchNorm affine, dense kernel/bias, LayerNorm affine,
Embedding table), the reference's ``build_optimizer_mapper`` building the
real param groups, and 3 optimizer steps driven by IDENTICAL synthetic
gradients on both sides. Our side is ``train.optimizer.build_optimizer``
over a name-mirrored flax param tree. Final params must agree to fp32
tolerance — any group misclassification or update-rule deviation shows up
at the first step.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from _torchref import install_stubs, ref_module  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

STEPS = 3
BASE_LR = 0.02


def _build_torch_model(seed=0):
    import torch
    import torch.nn as nn

    torch.manual_seed(seed)

    class RefNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = nn.Sequential(
                nn.Conv2d(3, 8, 3, bias=True),
                nn.BatchNorm2d(8),
            )
            self.head = nn.Linear(8, 4, bias=True)
            self.ln = nn.LayerNorm(4)
            self.embed = nn.Embedding(5, 4)

    m = RefNet()
    # non-trivial starting values everywhere (BN/LN affines init to 1/0)
    with torch.no_grad():
        for p in m.parameters():
            p.add_(torch.randn_like(p) * 0.05)
    return m


# (torch param name, ours path, transpose to ours layout)
_NAME_MAP = [
    ("backbone.0.weight", ("backbone", "conv", "kernel"), (2, 3, 1, 0)),
    ("backbone.0.bias", ("backbone", "conv", "bias"), None),
    ("backbone.1.weight", ("backbone", "bn", "scale"), None),
    ("backbone.1.bias", ("backbone", "bn", "bias"), None),
    ("head.weight", ("head", "dense", "kernel"), (1, 0)),
    ("head.bias", ("head", "dense", "bias"), None),
    ("ln.weight", ("ln", "scale"), None),
    ("ln.bias", ("ln", "bias"), None),
    ("embed.weight", ("embed", "embedding"), None),
]


def _ours_tree_from_torch(tm):
    # .copy() is load-bearing: .numpy() aliases the live parameter storage
    # and jnp.asarray is zero-copy on the CPU backend — without it, `init`
    # snapshots taken before opt.step() would mutate along with the params
    sd = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}
    tree: dict = {}
    for tname, path, tr in _NAME_MAP:
        a = sd[tname]
        if tr is not None:
            a = a.transpose(tr)
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = jnp.asarray(np.ascontiguousarray(a, np.float32))
    return tree


def _grads_for_step(tm, step, seed=123):
    """Same synthetic gradient values for both sides, keyed by torch name."""
    rng = np.random.default_rng(seed + step)
    out = {}
    for name, p in tm.named_parameters():
        out[name] = rng.standard_normal(tuple(p.shape)).astype(np.float32)
    return out


def _ref_cfg(optimizer, **solver):
    """cfg for the reference's build_optimizer_mapper (reads SOLVER.*)."""
    from yolov7_d2_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.SOLVER.OPTIMIZER = optimizer
    cfg.SOLVER.BASE_LR = BASE_LR
    cfg.SOLVER.CLIP_GRADIENTS.ENABLED = False
    for k, v in solver.items():
        setattr(cfg.SOLVER, k, v)
    return cfg


def _run_torch(cfg):
    import torch

    build = ref_module("yolov7.optimizer.build")
    tm = _build_torch_model()
    init = _ours_tree_from_torch(tm)
    opt = build.build_optimizer_mapper(cfg, tm)
    for s in range(STEPS):
        grads = _grads_for_step(tm, s)
        opt.zero_grad()
        for name, p in tm.named_parameters():
            p.grad = torch.as_tensor(grads[name])
        opt.step()
    return init, _ours_tree_from_torch(tm)


def _run_ours(cfg, init, tm_for_grads):
    from yolov7_d2_tpu.train.optimizer import build_optimizer

    params = jax.tree.map(jnp.asarray, init)
    tx = build_optimizer(cfg, params, lr_schedule=lambda s: BASE_LR)
    state = tx.init(params)
    for s in range(STEPS):
        g = _grads_for_step(tm_for_grads, s)
        gtree: dict = {}
        for tname, path, tr in _NAME_MAP:
            a = g[tname]
            if tr is not None:
                a = a.transpose(tr)
            node = gtree
            for k in path[:-1]:
                node = node.setdefault(k, {})
            node[path[-1]] = jnp.asarray(np.ascontiguousarray(a))
        updates, state = tx.update(gtree, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
    return params


def _assert_trees_close(ref_tree, ours_tree, rtol=3e-5, atol=1e-6):
    # atol floors fp32 rounding: torch's in-place p.mul_(1-lr*wd) and our
    # fused (p - lr*(u + wd*p)) round differently at ~1e-7/step on ~0.05
    # params; 3 steps of ~0.02 updates puts honest noise near 4e-7
    flat_r = jax.tree_util.tree_flatten_with_path(ref_tree)[0]
    flat_o = jax.tree_util.tree_flatten_with_path(ours_tree)[0]
    assert len(flat_r) == len(flat_o)
    for (path_r, vr), (path_o, vo) in zip(flat_r, flat_o):
        assert path_r == path_o
        np.testing.assert_allclose(
            np.asarray(vo), np.asarray(vr), rtol=rtol, atol=atol,
            err_msg=f"param mismatch after {STEPS} steps: "
                    f"{jax.tree_util.keystr(path_r)}")


def _torch_and_ours(optimizer, **solver):
    install_stubs()
    cfg = _ref_cfg(optimizer, **solver)
    init, ref_final = _run_torch(cfg)
    tm = _build_torch_model()  # same seed: identical param shapes/names
    ours_final = _run_ours(cfg, init, tm)
    # sanity: training moved the params (the diff isn't vacuous)
    moved = jax.tree_util.tree_reduce(
        lambda acc, x: acc + float(np.abs(x).sum()),
        jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b),
                     ref_final, init), 0.0)
    assert moved > 1e-3
    _assert_trees_close(ref_final, ours_final)


def test_adamw_d2go_groups_3steps():
    """The transformer-trainer path (train_transformer.py:106): AdamW with
    d2 defaults — WEIGHT_DECAY_NORM=0, WEIGHT_DECAY_BIAS=None (=> decay
    biases at WEIGHT_DECAY), embeddings at WEIGHT_DECAY_EMBED=0 — plus the
    d2go LR_MULTIPLIER_OVERWRITE backbone drop used by the DETR recipes."""
    _torch_and_ours(
        "adamw",
        WEIGHT_DECAY=1e-4,
        WEIGHT_DECAY_NORM=0.0,
        WEIGHT_DECAY_BIAS=None,
        WEIGHT_DECAY_EMBED=0.0,
        LR_MULTIPLIER_OVERWRITE=[{"backbone": 0.1}],
    )


def test_adamw_bias_lr_factor_and_embed_decay():
    """Non-default knobs: BIAS_LR_FACTOR=2 (build.py:102-103 — applies to
    EVERY bias-named param, norm biases included) and a nonzero embedding
    decay, exercising all four decay classes at distinct values."""
    _torch_and_ours(
        "adamw",
        WEIGHT_DECAY=1e-3,
        WEIGHT_DECAY_NORM=1e-5,
        WEIGHT_DECAY_BIAS=1e-4,
        WEIGHT_DECAY_EMBED=5e-4,
        BIAS_LR_FACTOR=2.0,
    )


def test_sgd_d2_default_groups_3steps():
    """The detection-trainer path (train_det.py DefaultTrainer → d2
    build_optimizer semantics): nesterov momentum SGD with coupled decay;
    d2 defaults decay conv/dense biases at WEIGHT_DECAY and norms at 0."""
    _torch_and_ours(
        "sgd",
        MOMENTUM=0.9,
        NESTEROV=True,
        WEIGHT_DECAY=5e-4,
        WEIGHT_DECAY_NORM=0.0,
        WEIGHT_DECAY_BIAS=None,
    )


def test_sgd_lr_multiplier_overwrite():
    """Per-module LR overwrite under SGD: the multiplier must scale the
    applied update (torch applies group lr AFTER the momentum buffer)."""
    _torch_and_ours(
        "sgd",
        MOMENTUM=0.9,
        NESTEROV=False,
        WEIGHT_DECAY=1e-4,
        LR_MULTIPLIER_OVERWRITE=[{"backbone": 0.5}, {"head": 2.0}],
    )
