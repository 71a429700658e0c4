"""Differential GRADIENT parity against the reference's torch autograd
(VERDICT round-4 item 1 — the capstone of the forward -> loss -> gradient
ladder).

Loss VALUES agreeing (test_torch_parity_losses.py) does not pin the
stop-gradient boundaries: a misplaced ``stop_gradient`` on our side or an
undetached tensor on theirs (the reference deliberately detaches SimOTA
costs inside ``yolox_head.py:450`` ``@torch.no_grad`` and SparseInst's
matcher ``sparseinst_loss.py:305-350`` runs no-grad) leaves every
value-level test green while training diverges. These tests compare the
actual gradients:

  * criterion-INPUT gradients (d loss / d head outputs) for YOLOX,
    SparseInst, DETR (softmax + focal), and YOLOF — element-wise against
    ``loss.backward()`` on the reference's own torch criteria;
  * full-model PER-PARAMETER gradients for the flagship YOLOX stack
    (CSPDarknet + PAFPN + YOLOXHead + get_losses, train-mode BN), the
    full SparseInst train path, and the full DETR train path with deep
    supervision (aux gradients through every decoder layer) — torch
    grads ported through the same name maps as the weights;
  * a 3-step SGD training-trajectory parity test (same data, same LR):
    parameters AND BatchNorm running statistics agree after 3 steps,
    pinning optimizer semantics and the torch unbiased running-var
    update rule (models/layers/norm.py).

Scenes avoid measure-zero assignment ties exactly as in
test_torch_parity_losses.py so matchings are unique and the gradients
are well-defined on both sides.
"""

from __future__ import annotations

import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from _torchref import install_stubs, ref_module  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _t(x, requires_grad=False):
    import torch

    t = torch.as_tensor(np.asarray(x))
    if requires_grad:
        t = t.clone().requires_grad_(True)
    return t


def _assert_grad_close(ours, ref, name, rtol=1e-3, atol_scale=1e-5):
    """Element-wise gradient comparison with a tolerance floored at a
    fraction of the gradient's own magnitude (tiny entries are dominated
    by fp32 reassociation noise on both sides)."""
    ours = np.asarray(ours, np.float64)
    ref = np.asarray(ref, np.float64)
    assert ours.shape == ref.shape, (name, ours.shape, ref.shape)
    scale = max(float(np.abs(ref).max()), 1e-8)
    np.testing.assert_allclose(
        ours, ref, rtol=rtol, atol=scale * atol_scale,
        err_msg=f"gradient mismatch: {name}")


# ---------------------------------------------------------------------------
# YOLOX: d total_loss / d raw head outputs, across the no-grad SimOTA boundary
# ---------------------------------------------------------------------------

def _yolox_scene(rng, B, C, img, level_hw, strides_l, gt_counts, Gmax):
    A = sum(h * w for h, w in level_hw)
    raw = rng.randn(B, A, 5 + C).astype(np.float32) * 0.5
    grids, stride_v, x_shifts, y_shifts, exp_strides = [], [], [], [], []
    for (h, w), s in zip(level_hw, strides_l):
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        g = np.stack([xs, ys], -1).reshape(-1, 2).astype(np.float32)
        grids.append(g)
        stride_v.append(np.full((h * w,), s, np.float32))
        x_shifts.append(_t(g[None, :, 0]))
        y_shifts.append(_t(g[None, :, 1]))
        exp_strides.append(_t(np.full((1, h * w), s, np.float32)))
    grids = np.concatenate(grids)
    stride_v = np.concatenate(stride_v)

    labels = np.zeros((B, Gmax, 5), np.float32)
    gt_boxes = np.zeros((B, Gmax, 4), np.float32)
    gt_classes = np.zeros((B, Gmax), np.int32)
    gt_valid = np.zeros((B, Gmax), bool)
    for b, g in enumerate(gt_counts):
        cxcy = rng.uniform(12, img - 12, size=(g, 2)).astype(np.float32)
        wh = rng.uniform(8, 30, size=(g, 2)).astype(np.float32)
        cls = rng.randint(0, C, size=(g,))
        labels[b, :g, 0] = cls
        labels[b, :g, 1:3] = cxcy
        labels[b, :g, 3:5] = wh
        gt_boxes[b, :g, 0:2] = cxcy - wh / 2
        gt_boxes[b, :g, 2:4] = cxcy + wh / 2
        gt_classes[b, :g] = cls
        gt_valid[b, :g] = True
    return (raw, grids, stride_v, x_shifts, y_shifts, exp_strides,
            labels, gt_boxes, gt_classes, gt_valid)


@pytest.mark.parametrize("use_l1", [False, True])
def test_yolox_criterion_input_grads(use_l1):
    """d total / d raw outputs through decode + get_losses. The SimOTA
    assignment is no-grad on BOTH sides; everything downstream of it
    (iou/obj/cls/l1 terms) must produce identical gradients."""
    import torch

    install_stubs()
    ref_head_mod = ref_module("yolov7.modeling.head.yolox_head")
    from yolov7_d2_tpu.models.heads.yolox_head import yolox_losses

    rng = np.random.RandomState(5)
    B, C, img = 2, 7, 64
    level_hw = [(8, 8), (4, 4), (2, 2)]
    strides_l = [8, 16, 32]
    (raw, grids, stride_v, x_shifts, y_shifts, exp_strides,
     labels, gt_boxes, gt_classes, gt_valid) = _yolox_scene(
        rng, B, C, img, level_hw, strides_l, (3, 2), 4)

    head = ref_head_mod.YOLOXHead(
        num_classes=C, width=0.25, strides=strides_l,
        in_channels=[64, 128, 256])
    head.use_l1 = use_l1

    raw_t = _t(raw, requires_grad=True)
    grids_t, stride_t = _t(grids), _t(stride_v)
    decoded = torch.cat([
        (raw_t[..., 0:2] + grids_t) * stride_t[:, None],
        torch.exp(raw_t[..., 2:4]) * stride_t[:, None],
        raw_t[..., 4:],
    ], dim=-1)
    offs = np.cumsum([0] + [h * w for h, w in level_hw[:-1]])
    origin_preds = [
        raw_t[:, o:o + h * w, :4] for o, (h, w) in zip(offs, level_hw)
    ]
    total = head.get_losses(
        None, x_shifts, y_shifts, exp_strides,
        _t(labels), decoded, origin_preds, dtype=torch.float32,
    )[0]
    total.backward()
    g_ref = raw_t.grad.numpy()

    def f(r):
        return yolox_losses(
            {"outputs": r, "grids": jnp.asarray(grids),
             "strides": jnp.asarray(stride_v)},
            jnp.asarray(gt_boxes), jnp.asarray(gt_classes),
            jnp.asarray(gt_valid),
            num_classes=C, use_l1=use_l1, prefilter_topk=None,
        )["total_loss"]

    g_ours = jax.grad(f)(jnp.asarray(raw))
    _assert_grad_close(g_ours, g_ref, f"yolox d/d_raw (l1={use_l1})")


# ---------------------------------------------------------------------------
# SparseInst: d sum(losses) / d (cls, mask, obj) logits — no-grad matcher
# ---------------------------------------------------------------------------

def _soft_blob_masks(rng, n, h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    masks = []
    for _ in range(n):
        cy, cx = rng.uniform(0.2, 0.8) * h, rng.uniform(0.2, 0.8) * w
        ry, rx = rng.uniform(0.15, 0.4) * h, rng.uniform(0.15, 0.4) * w
        d = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2
        masks.append((d < 1.0).astype(np.float32))
    return np.stack(masks)


class _MasksShim:
    def __init__(self, tensor):
        self.tensor = tensor

    def __len__(self):
        return self.tensor.shape[0]


def test_sparseinst_criterion_input_grads():
    import torch

    install_stubs()
    ref = ref_module("yolov7.modeling.loss.sparseinst_loss")
    from yolov7_d2_tpu.models.meta_arch.sparseinst import sparseinst_losses

    rng = np.random.RandomState(0)
    gt_counts = (3, 2)
    B, N, C = len(gt_counts), 16, 6
    H, W = 64, 96
    Hm, Wm = 16, 24
    Gmax = max(gt_counts)

    cls_logits = rng.randn(B, N, C).astype(np.float32)
    mask_logits = rng.randn(B, N, Hm, Wm).astype(np.float32) * 2.0
    obj_logits = rng.randn(B, N).astype(np.float32)

    gt_masks = np.zeros((B, Gmax, H, W), np.float32)
    gt_classes = np.zeros((B, Gmax), np.int32)
    gt_valid = np.zeros((B, Gmax), bool)
    targets = []
    for b, g in enumerate(gt_counts):
        m = _soft_blob_masks(rng, g, H, W)
        cls = rng.randint(0, C, size=(g,))
        gt_masks[b, :g] = m
        gt_classes[b, :g] = cls
        gt_valid[b, :g] = True
        targets.append({
            "labels": _t(cls.astype(np.int64)),
            "masks": _MasksShim(_t(m)),
        })

    loss_cfg = SimpleNamespace(
        ITEMS=("labels", "masks"), CLASS_WEIGHT=2.0, MASK_PIXEL_WEIGHT=5.0,
        MASK_DICE_WEIGHT=2.0, OBJECTNESS_WEIGHT=1.0,
        NAME="SparseInstCriterion")
    matcher_cfg = SimpleNamespace(ALPHA=0.8, BETA=0.2,
                                  NAME="SparseInstMatcher")
    cfg = SimpleNamespace(MODEL=SimpleNamespace(SPARSE_INST=SimpleNamespace(
        LOSS=loss_cfg, MATCHER=matcher_cfg,
        DECODER=SimpleNamespace(NUM_CLASSES=C))))
    criterion = ref.SparseInstCriterion(cfg, ref.SparseInstMatcher(cfg))

    cls_t = _t(cls_logits, requires_grad=True)
    mask_t = _t(mask_logits, requires_grad=True)
    obj_t = _t(obj_logits, requires_grad=True)
    ref_losses = criterion(
        {"pred_logits": cls_t, "pred_masks": mask_t,
         "pred_scores": obj_t[..., None]},
        targets, input_shape=(H, W),
    )
    total = (ref_losses["loss_ce"] + ref_losses["loss_mask"]
             + ref_losses["loss_dice"] + ref_losses["loss_objectness"])
    total.backward()

    def f(cl, ml, ol):
        l = sparseinst_losses(
            {"cls_logits": cl, "mask_logits": ml, "obj_logits": ol},
            jnp.asarray(gt_masks), jnp.asarray(gt_classes),
            jnp.asarray(gt_valid), num_classes=C,
        )
        return (l["loss_ce"] + l["loss_mask"] + l["loss_dice"]
                + l["loss_objectness"])

    g_cls, g_mask, g_obj = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(cls_logits), jnp.asarray(mask_logits),
        jnp.asarray(obj_logits))
    _assert_grad_close(g_cls, cls_t.grad.numpy(), "sparseinst d/d_cls")
    _assert_grad_close(g_mask, mask_t.grad.numpy(), "sparseinst d/d_mask")
    _assert_grad_close(g_obj, obj_t.grad.numpy(), "sparseinst d/d_obj")


# ---------------------------------------------------------------------------
# DETR SetCriterion (softmax + focal): d / d (logits, boxes) — no-grad
# hungarian matcher
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("use_focal", [False, True])
def test_detr_criterion_input_grads(use_focal):
    import torch

    install_stubs()
    setcrit = ref_module("yolov7.modeling.loss.setcriterion")
    detr_utils = ref_module("yolov7.utils.detr_utils")
    from yolov7_d2_tpu.models.meta_arch.detr import detr_set_criterion

    rng = np.random.RandomState(7 if use_focal else 3)
    B, Q, C = 2, 24, 7
    gt_counts = (4, 2)
    logits = rng.randn(B, Q, C + 1).astype(np.float32)
    pred = 1.0 / (1.0 + np.exp(-rng.randn(B, Q, 4).astype(np.float32)))
    Gmax = max(gt_counts)
    gt_boxes = np.zeros((B, Gmax, 4), np.float32)
    gt_classes = np.zeros((B, Gmax), np.int32)
    gt_valid = np.zeros((B, Gmax), bool)
    targets = []
    for b, g in enumerate(gt_counts):
        cxcy = rng.uniform(0.25, 0.75, size=(g, 2))
        wh = rng.uniform(0.05, 0.4, size=(g, 2))
        boxes = np.concatenate([cxcy, wh], -1).astype(np.float32)
        cls = rng.randint(0, C, size=(g,))
        gt_boxes[b, :g] = boxes
        gt_classes[b, :g] = cls
        gt_valid[b, :g] = True
        targets.append({"labels": _t(cls.astype(np.int64)),
                        "boxes": _t(boxes)})

    if use_focal:
        matcher = detr_utils.HungarianMatcherAnchorDETR(
            cost_class=1, cost_bbox=5, cost_giou=2)
        criterion = setcrit.FocalLossSetCriterion(
            num_classes=C, matcher=matcher, weight_dict={},
            losses=["labels", "boxes"], focal_alpha=0.25)
    else:
        matcher = detr_utils.HungarianMatcher(
            cost_class=1, cost_bbox=5, cost_giou=2)
        criterion = setcrit.SetCriterion(
            num_classes=C, matcher=matcher, weight_dict={}, eos_coef=0.1,
            losses=["labels", "boxes"])

    logits_t = _t(logits, requires_grad=True)
    pred_t = _t(pred, requires_grad=True)
    ref_logits = logits_t[..., :C] if use_focal else logits_t
    ref_losses = criterion(
        {"pred_logits": ref_logits, "pred_boxes": pred_t}, targets)
    total = (ref_losses["loss_ce"] + 5.0 * ref_losses["loss_bbox"]
             + 2.0 * ref_losses["loss_giou"])
    total.backward()

    def f(lg, pb):
        l = detr_set_criterion(
            lg, pb, jnp.asarray(gt_boxes), jnp.asarray(gt_classes),
            jnp.asarray(gt_valid), num_classes=C, eos_coef=0.1,
            use_focal=use_focal)
        # ours already bakes the meta-arch weights (bbox 5, giou 2)
        return l["loss_ce"] + l["loss_bbox"] + l["loss_giou"]

    g_logits, g_pred = jax.grad(f, argnums=(0, 1))(
        jnp.asarray(logits), jnp.asarray(pred))
    _assert_grad_close(
        g_logits, logits_t.grad.numpy(), f"detr d/d_logits focal={use_focal}")
    _assert_grad_close(
        g_pred, pred_t.grad.numpy(), f"detr d/d_boxes focal={use_focal}")


# ---------------------------------------------------------------------------
# YOLOF: d / d (logits, deltas) — no-grad UniformMatcher, grads flow through
# apply_deltas into the giou regression term
# ---------------------------------------------------------------------------

def test_yolof_criterion_input_grads():
    import torch
    import torch.nn as nn

    install_stubs()
    yolof_mod = ref_module("yolov7.modeling.meta_arch.yolof")
    um = ref_module("yolov7.modeling.head.uniform_matcher")
    br = ref_module("yolov7.modeling.head.box_regression")
    from detectron2.structures import Boxes

    from yolov7_d2_tpu.models.meta_arch.yolof import (
        yolof_anchors, yolof_losses)

    rng = np.random.RandomState(13)
    gt_counts = (3, 2)
    B, C = len(gt_counts), 6
    H = W = 4
    stride, img = 32, 128
    anchors_np = yolof_anchors(H, W, stride=stride)
    A = anchors_np.shape[0]
    Gmax = max(gt_counts)

    logits = (rng.randn(B, A, C) * 0.5).astype(np.float32)
    deltas = (rng.randn(B, A, 4) * 0.3).astype(np.float32)

    gt_boxes = np.zeros((B, Gmax, 4), np.float32)
    gt_classes = np.zeros((B, Gmax), np.int32)
    gt_valid = np.zeros((B, Gmax), bool)
    targets = []
    for b, g in enumerate(gt_counts):
        cxcy = rng.uniform(24, img - 24, size=(g, 2))
        wh = rng.uniform(20, 80, size=(g, 2))
        boxes = np.concatenate(
            [cxcy - wh / 2, cxcy + wh / 2], -1).astype(np.float32)
        cls = rng.randint(0, C, size=(g,))
        gt_boxes[b, :g] = boxes
        gt_classes[b, :g] = cls
        gt_valid[b, :g] = True
        targets.append(SimpleNamespace(
            gt_boxes=Boxes(_t(boxes)),
            gt_classes=_t(cls.astype(np.int64))))

    ref = object.__new__(yolof_mod.YOLOF)
    nn.Module.__init__(ref)
    ref.num_classes = C
    ref.focal_loss_alpha = 0.25
    ref.focal_loss_gamma = 2.0
    ref.neg_ignore_thresh = 0.7
    ref.pos_ignore_thresh = 0.15
    ref.box2box_transform = br.YOLOFBox2BoxTransform(
        weights=(1.0, 1.0, 1.0, 1.0))
    ref.matcher = um.UniformMatcher(4)

    logits_t = _t(logits, requires_grad=True)
    deltas_t = _t(deltas, requires_grad=True)
    anchors_t = _t(anchors_np)
    with torch.no_grad():
        pred_boxes_m = ref.box2box_transform.apply_deltas(
            deltas_t.detach().reshape(-1, 4),
            anchors_t[None].repeat(B, 1, 1).reshape(-1, 4),
        ).reshape(B, A, 4)
        indices = ref.matcher(
            pred_boxes_m, anchors_t[None].repeat(B, 1, 1), targets)
    ref_losses = ref.losses(
        indices, targets, [[Boxes(anchors_t)] for _ in range(B)],
        [logits_t], [deltas_t])
    total = ref_losses["loss_cls"] + ref_losses["loss_box_reg"]
    total.backward()

    def f(lg, dl):
        l = yolof_losses(
            {"logits": lg, "deltas": dl, "anchors": jnp.asarray(anchors_np)},
            {"gt_boxes": jnp.asarray(gt_boxes),
             "gt_classes": jnp.asarray(gt_classes),
             "gt_valid": jnp.asarray(gt_valid)},
            num_classes=C)
        return l["total_loss"]

    g_logits, g_deltas = jax.grad(f, argnums=(0, 1))(
        jnp.asarray(logits), jnp.asarray(deltas))
    _assert_grad_close(g_logits, logits_t.grad.numpy(), "yolof d/d_logits")
    _assert_grad_close(g_deltas, deltas_t.grad.numpy(), "yolof d/d_deltas")


# ---------------------------------------------------------------------------
# Full-model per-parameter gradients + 3-step SGD trajectory (YOLOX stack)
# ---------------------------------------------------------------------------

def _build_torch_yolox(num_classes, depth, width):
    import torch

    dx = ref_module("yolov7.modeling.backbone.darknetx")
    pafpn = ref_module("yolov7.modeling.neck.yolo_pafpn")
    yh = ref_module("yolov7.modeling.head.yolox_head")

    class _TorchYOLOXTrain(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = dx.CSPDarknet(depth, width)
            self.neck = pafpn.YOLOPAFPN(depth=depth, width=width)
            self.head = yh.YOLOXHead(num_classes, width=width)

        def forward(self, x, labels):
            feats = self.backbone(x)
            fpn_outs = self.neck(feats)
            return self.head(fpn_outs, labels=labels)

    tm = _TorchYOLOXTrain()
    # the reference meta-arch reinits EVERY BN to eps=1e-3, momentum=0.03
    # (yolox.py:82-90 _init_model) — matching our blocks.py BN defaults;
    # composing backbone/neck/head without this leaves torch BatchNorm2d
    # defaults (eps 1e-5) and train-mode outputs diverge wildly wherever
    # batch variance is small
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.eps = 1e-3
            m.momentum = 0.03
    return tm


def _randomize(module, seed=0):
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.empty_like(p).uniform_(-0.1, 0.1, generator=g))
        for m in module.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)


def _full_model_scene(seed, steps, B=2, img=64, Gmax=3, C=8):
    rng = np.random.RandomState(seed)
    xs, labels, gts = [], [], []
    for _ in range(steps):
        xs.append(rng.uniform(0, 255, (B, 3, img, img)).astype(np.float32))
        lab = np.zeros((B, Gmax, 5), np.float32)
        gt_boxes = np.zeros((B, Gmax, 4), np.float32)
        gt_classes = np.zeros((B, Gmax), np.int32)
        gt_valid = np.zeros((B, Gmax), bool)
        for b in range(B):
            g = rng.randint(1, Gmax + 1)
            cxcy = rng.uniform(12, img - 12, size=(g, 2)).astype(np.float32)
            wh = rng.uniform(8, 30, size=(g, 2)).astype(np.float32)
            cls = rng.randint(0, C, size=(g,))
            lab[b, :g, 0] = cls
            lab[b, :g, 1:3] = cxcy
            lab[b, :g, 3:5] = wh
            gt_boxes[b, :g, 0:2] = cxcy - wh / 2
            gt_boxes[b, :g, 2:4] = cxcy + wh / 2
            gt_classes[b, :g] = cls
            gt_valid[b, :g] = True
        labels.append(lab)
        gts.append((gt_boxes, gt_classes, gt_valid))
    return xs, labels, gts


@pytest.fixture(scope="module")
def yolox_train_pair():
    """(torch train-mode model, our flax model + ported variables) at
    width 0.25 / 64 px — small enough for CPU backward in seconds."""
    install_stubs()
    from yolov7_d2_tpu.models.meta_arch.yolox import YOLOX
    from yolov7_d2_tpu.utils.weight_port import port_torch_state_dict

    num_classes, depth, width = 8, 0.33, 0.25
    tm = _build_torch_yolox(num_classes, depth, width)
    _randomize(tm)
    tm.train()

    fm = YOLOX(num_classes=num_classes, depth_mul=depth, width_mul=width)
    x0 = np.zeros((2, 64, 64, 3), np.float32)
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x0))
    sd = {k: v.detach().cpu().clone() for k, v in tm.state_dict().items()}
    ported, report = port_torch_state_dict(
        {k: v.numpy() for k, v in sd.items()}, variables)
    assert not report["unused"], report["unused"][:10]
    return tm, fm, ported, sd


def _our_yolox_loss(fm, params, batch_stats, x_nhwc, gt, num_classes=8):
    from yolov7_d2_tpu.models.heads.yolox_head import yolox_losses

    out, mut = fm.apply(
        {"params": params, "batch_stats": batch_stats},
        x_nhwc, train=True, mutable=["batch_stats"])
    l = yolox_losses(
        {"outputs": out["outputs"], "grids": out["grids"],
         "strides": out["strides"]},
        jnp.asarray(gt[0]), jnp.asarray(gt[1]), jnp.asarray(gt[2]),
        num_classes=num_classes, use_l1=False, prefilter_topk=None)
    return l["total_loss"], mut["batch_stats"]


def test_yolox_full_model_param_grads(yolox_train_pair):
    """torch loss.backward() vs jax.grad through the whole weight-ported
    stack: per-parameter agreement (worst leaf reported on failure)."""
    import torch

    from yolov7_d2_tpu.utils.weight_port import port_torch_state_dict

    tm, fm, ported, _ = yolox_train_pair
    xs, labels, gts = _full_model_scene(21, 1)
    x, lab, gt = xs[0], labels[0], gts[0]

    tm.zero_grad(set_to_none=False)
    total = tm(_t(x), _t(lab))[0]
    total.backward()
    grad_sd = {
        k: (p.grad if p.grad is not None else torch.zeros_like(p))
        .detach().numpy()
        for k, p in tm.named_parameters()
    }

    def loss_fn(params):
        return _our_yolox_loss(fm, params, ported["batch_stats"],
                               jnp.asarray(x.transpose(0, 2, 3, 1)), gt)

    (ours_total, _), g_ours = jax.value_and_grad(
        loss_fn, has_aux=True)(ported["params"])
    np.testing.assert_allclose(
        float(ours_total), float(total.detach()), rtol=5e-4,
        err_msg="total loss diverged before comparing grads")

    # port the torch grads through the SAME name map as the weights
    tmpl = {
        "params": jax.tree.map(
            lambda a: np.zeros(np.shape(a), np.float32), ported["params"]),
        "batch_stats": jax.tree.map(
            lambda a: np.zeros(np.shape(a), np.float32),
            ported["batch_stats"]),
    }
    gport, report = port_torch_state_dict(grad_sd, tmpl)
    assert not report["unused"], report["unused"][:10]

    flat_ref = jax.tree_util.tree_flatten_with_path(gport["params"])[0]
    flat_ours = jax.tree_util.tree_flatten_with_path(g_ours)[0]
    assert len(flat_ref) == len(flat_ours)
    worst = (0.0, "")
    for (path_r, leaf_r), (path_o, leaf_o) in zip(flat_ref, flat_ours):
        name = jax.tree_util.keystr(path_o)
        assert path_r == path_o, (path_r, path_o)
        ref = np.asarray(leaf_r, np.float64)
        ours = np.asarray(leaf_o, np.float64)
        scale = max(float(np.abs(ref).max()), 1e-10)
        rel = float(np.max(np.abs(ours - ref))) / scale
        if rel > worst[0]:
            worst = (rel, name)
        _assert_grad_close(ours, ref, name, rtol=2e-2, atol_scale=2e-3)
    # keep the headline number visible in -rA output
    print(f"worst per-parameter gradient rel-err: {worst[0]:.2e} at {worst[1]}")


def test_yolox_sgd_trajectory_3steps(yolox_train_pair):
    """3 plain-SGD steps, fresh data each step: parameters AND BN running
    statistics agree afterwards — pins optimizer arithmetic, train-mode BN
    batch statistics, and the unbiased running-var update."""
    import torch

    from yolov7_d2_tpu.utils.weight_port import port_torch_state_dict

    tm, fm, ported, sd0 = yolox_train_pair
    lr, steps = 0.02, 3
    xs, labels, gts = _full_model_scene(37, steps)

    # start from the PRISTINE ported state: earlier train-mode forwards in
    # this module updated the torch BN running stats in place
    tm.load_state_dict(sd0)
    init = {k: v.numpy().copy() for k, v in sd0.items()}

    opt = torch.optim.SGD(tm.parameters(), lr=lr)
    for s in range(steps):
        opt.zero_grad()
        total = tm(_t(xs[s]), _t(labels[s]))[0]
        total.backward()
        opt.step()
    # .copy() is load-bearing: .numpy() aliases the live parameter
    # storage, which load_state_dict() below overwrites in place
    sd_final = {k: v.detach().numpy().copy()
                for k, v in tm.state_dict().items()}
    tm.load_state_dict(sd0)   # restore for other tests

    params = jax.tree.map(jnp.asarray, ported["params"])
    bstats = jax.tree.map(jnp.asarray, ported["batch_stats"])
    grad_fn = jax.jit(jax.value_and_grad(
        lambda p, b, x, gb, gc, gv: _our_yolox_loss(
            fm, p, b, x, (gb, gc, gv)),
        has_aux=True))
    for s in range(steps):
        (_, new_bs), g = grad_fn(
            params, bstats, jnp.asarray(xs[s].transpose(0, 2, 3, 1)),
            jnp.asarray(gts[s][0]), jnp.asarray(gts[s][1]),
            jnp.asarray(gts[s][2]))
        params = jax.tree.map(lambda p, gg: p - lr * gg, params, g)
        bstats = new_bs

    # port the torch endpoint and compare DELTAS (init is shared exactly,
    # so deltas isolate the training dynamics from the common starting point)
    tmpl = {
        "params": jax.tree.map(
            lambda a: np.zeros(np.shape(a), np.float32), ported["params"]),
        "batch_stats": jax.tree.map(
            lambda a: np.zeros(np.shape(a), np.float32),
            ported["batch_stats"]),
    }
    fport, _ = port_torch_state_dict(sd_final, tmpl)
    iport, _ = port_torch_state_dict(init, tmpl)

    for coll, ours_tree in (("params", params), ("batch_stats", bstats)):
        flat_f = jax.tree_util.tree_flatten_with_path(fport[coll])[0]
        flat_i = jax.tree_util.tree_flatten_with_path(iport[coll])[0]
        flat_o = jax.tree_util.tree_flatten_with_path(
            jax.tree.map(np.asarray, ours_tree))[0]
        # per-step gradient noise (the grad test's ~1e-4 relative floor)
        # couples ACROSS parameters over multiple steps: a tiny-gradient
        # leaf's trajectory inherits error at the scale of the largest
        # updates, not its own
        global_delta = max(
            float(np.abs(np.asarray(f, np.float64)
                         - np.asarray(i, np.float64)).max())
            for (_, f), (_, i) in zip(flat_f, flat_i)
        )
        for (path, ref_f), (_, ref_i), (_, ours_f) in zip(
                flat_f, flat_i, flat_o):
            name = f"{coll}{jax.tree_util.keystr(path)}"
            init = np.asarray(ref_i, np.float64)
            d_ref = np.asarray(ref_f, np.float64) - init
            d_ours = np.asarray(ours_f, np.float64) - init
            # floor the tolerance at fp32 rounding noise on the parameter
            # itself: BN biases directly upstream of another BN get
            # near-zero gradients (BN is invariant to input mean shifts),
            # so their deltas on BOTH sides are pure float noise
            scale = max(float(np.abs(d_ref).max()), 1e-10)
            noise = (4e-6 * max(float(np.abs(init).max()), 1e-3)
                     + 3e-4 * global_delta)
            np.testing.assert_allclose(
                d_ours, d_ref, rtol=3e-2, atol=scale * 5e-3 + noise,
                err_msg=f"trajectory delta mismatch: {name}")


# ---------------------------------------------------------------------------
# Full-model per-parameter gradients: SparseInst (backbone+encoder+decoder
# +criterion incl. the reference's no-grad scipy matcher boundary)
# ---------------------------------------------------------------------------

def _blob_masks(rng, n, h, w):
    """Smooth elliptical blobs — continuous extents so matcher scores never
    tie (same recipe as test_torch_parity_losses._soft_blob_masks)."""
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for _ in range(n):
        cy, cx = rng.uniform(0.2, 0.8) * h, rng.uniform(0.2, 0.8) * w
        ry, rx = rng.uniform(0.15, 0.4) * h, rng.uniform(0.15, 0.4) * w
        d = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2
        out.append((d < 1.0).astype(np.float32))
    return np.stack(out)


def test_sparseinst_full_model_param_grads():
    """torch loss.backward() through the reference's full SparseInst train
    path (plain R50 -> InstanceContextEncoder -> GroupIAMDecoder ->
    SparseInstCriterion with its no-grad SparseInstMatcher,
    /root/reference/yolov7/modeling/loss/sparseinst_loss.py:49-232) vs
    jax.grad through our weight-ported full model + sparseinst_losses:
    per-parameter agreement. Both sides run eval-mode BN (ported running
    stats) so the differential isolates gradient STRUCTURE — a misplaced
    stop_gradient or an undetached matcher input shows up immediately."""
    import types as _types

    import torch

    install_stubs()
    rv = ref_module("yolov7.modeling.backbone.resnetvd")
    enc_mod = ref_module("yolov7.modeling.transcoders.encoder_sparseinst")
    dec_mod = ref_module("yolov7.modeling.transcoders.decoder_sparseinst")
    ref_loss = ref_module("yolov7.modeling.loss.sparseinst_loss")

    import yolov7_d2_tpu.utils.weight_port as wp
    from yolov7_d2_tpu.models.meta_arch.sparseinst import (
        SparseInst, sparseinst_losses)

    H = W = 96
    B, C, N = 2, 7, 12
    gt_counts = (2, 3)

    ns = lambda **kw: _types.SimpleNamespace(**kw)  # noqa: E731
    cfg = ns(MODEL=ns(SPARSE_INST=ns(
        ENCODER=ns(NUM_CHANNELS=64, IN_FEATURES=["res3", "res4", "res5"]),
        DECODER=ns(INST=ns(DIM=256, CONVS=4), MASK=ns(DIM=256, CONVS=4),
                   NUM_MASKS=N, KERNEL_DIM=16, NUM_CLASSES=C, GROUPS=4,
                   SCALE_FACTOR=2.0, OUTPUT_IAM=False),
        LOSS=ns(ITEMS=("labels", "masks"), CLASS_WEIGHT=2.0,
                MASK_PIXEL_WEIGHT=5.0, MASK_DICE_WEIGHT=2.0,
                OBJECTNESS_WEIGHT=1.0, NAME="SparseInstCriterion"),
        MATCHER=ns(ALPHA=0.8, BETA=0.2, NAME="SparseInstMatcher"),
    )))

    def _rand(module, seed):
        g = torch.Generator().manual_seed(seed)
        with torch.no_grad():
            for p in module.parameters():
                p.copy_(torch.empty_like(p).uniform_(
                    -0.1, 0.1, generator=g))
            for m in module.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.uniform_(-0.5, 0.5, generator=g)
                    m.running_var.uniform_(0.5, 1.5, generator=g)

    backbone_t = rv.ResNet(["bottleneck"] * 4, [3, 4, 6, 3]).eval()
    _rand(backbone_t, 61)
    shapes = {
        "res3": SimpleNamespace(channels=512),
        "res4": SimpleNamespace(channels=1024),
        "res5": SimpleNamespace(channels=2048),
    }
    encoder_t = enc_mod.InstanceContextEncoder(cfg, shapes).eval()
    _rand(encoder_t, 62)
    decoder_t = dec_mod.GroupIAMDecoder(cfg).eval()
    _rand(decoder_t, 63)
    criterion = ref_loss.SparseInstCriterion(
        cfg, ref_loss.SparseInstMatcher(cfg))

    ours_model = SparseInst(
        num_classes=C, num_masks=N, kernel_dim=16, groups=4,
        encoder_channels=64, resnet_depth=50)
    rng = np.random.RandomState(7)
    img = rng.uniform(0, 255, (B, 3, H, W)).astype(np.float32)
    # scene seed chosen so BOTH matchers produce the same assignment
    # (asserted below): with random weights all proposals score nearly
    # alike, and the deep-stack fp32 forward noise (~2e-2 on mask logits)
    # can flip near-tied LSAP rows — a flipped match makes the gradient
    # comparison meaningless rather than wrong
    rng = np.random.RandomState(1700)
    variables = ours_model.init(
        jax.random.PRNGKey(0), jnp.asarray(img.transpose(0, 2, 3, 1)))
    ports = (
        (backbone_t, wp.map_resnetvd_plain_torch_name, "backbone"),
        (encoder_t, wp.map_sparseinst_encoder_torch_name, "encoder"),
        (decoder_t, wp.map_sparseinst_decoder_torch_name, "decoder"),
    )
    for tm, mapper, prefix in ports:
        sd_np = {k: v.detach().numpy().copy()
                 for k, v in tm.state_dict().items()}
        variables, report = wp.port_torch_state_dict(
            sd_np, variables,
            name_mapper=lambda n, m=mapper, p=prefix: (p,) + m(n))
        assert not report["unused"], (prefix, report["unused"][:5])

    # the scene
    class _Masks:  # targets[i]["masks"]: len() + .tensor (d2 BitMasks)
        def __init__(self, tensor):
            self.tensor = tensor

        def __len__(self):
            return self.tensor.shape[0]

    gt_masks = np.zeros((B, max(gt_counts), H, W), np.float32)
    gt_classes = np.zeros((B, max(gt_counts)), np.int32)
    gt_valid = np.zeros((B, max(gt_counts)), bool)
    targets = []
    for b, g in enumerate(gt_counts):
        m = _blob_masks(rng, g, H, W)
        cls = rng.randint(0, C, size=(g,))
        gt_masks[b, :g], gt_classes[b, :g], gt_valid[b, :g] = m, cls, True
        targets.append({
            "labels": _t(cls.astype(np.int64)),
            "masks": _Masks(_t(m)),
        })

    # reference train forward (grad ENABLED end-to-end; the matcher's
    # no-grad + scipy LSAP boundary is exactly what we are pinning)
    mean = np.array([103.53, 116.28, 123.675], np.float32)
    std = np.array([57.375, 57.12, 58.395], np.float32)
    x_norm = (img - mean[None, :, None, None]) / std[None, :, None, None]
    for tm, _, _ in ports:
        tm.zero_grad(set_to_none=False)
    feats = backbone_t(torch.from_numpy(x_norm))
    fused = encoder_t({k: feats[k] for k in ("res3", "res4", "res5")})
    output = decoder_t(fused)
    ref_losses = criterion(
        {"pred_logits": output["pred_logits"],
         "pred_masks": output["pred_masks"],
         "pred_scores": output["pred_scores"]},
        targets, input_shape=(H, W))
    ref_total = sum(ref_losses.values())
    ref_total.backward()

    # precondition: both matchers chose the SAME assignment (see the scene
    # seed note above — comparing gradients across different matches would
    # be vacuous)
    from yolov7_d2_tpu.models.meta_arch.sparseinst import sparseinst_match

    out_check = ours_model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(img.transpose(0, 2, 3, 1)))
    hm, wm = np.asarray(out_check["mask_logits"]).shape[2:]
    gt_small = jax.image.resize(
        jnp.asarray(gt_masks), (B, gt_masks.shape[1], hm, wm),
        "bilinear", antialias=False)
    pred_of_gt, match_ok = sparseinst_match(
        out_check, gt_small, jnp.asarray(gt_classes), jnp.asarray(gt_valid))
    with torch.no_grad():
        ref_idx = criterion.matcher(
            {"pred_logits": output["pred_logits"].detach(),
             "pred_masks": output["pred_masks"].detach(),
             "pred_scores": output["pred_scores"].detach()},
            targets, (H, W))
    for b, g in enumerate(gt_counts):
        src, tgt = ref_idx[b]
        ref_map = {int(t): int(s)
                   for s, t in zip(np.asarray(src), np.asarray(tgt))}
        our_map = {i: int(np.asarray(pred_of_gt)[b, i])
                   for i in range(g) if bool(np.asarray(match_ok)[b, i])}
        assert ref_map == our_map, (
            f"matcher assignment diverged on image {b} (near-tied scores "
            f"under fp32 forward noise — pick a different scene seed): "
            f"ref {ref_map} ours {our_map}")

    def loss_fn(params):
        out = ours_model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.asarray(img.transpose(0, 2, 3, 1)))
        l = sparseinst_losses(
            out, jnp.asarray(gt_masks), jnp.asarray(gt_classes),
            jnp.asarray(gt_valid), num_classes=C)
        return (l["loss_ce"] + l["loss_mask"] + l["loss_dice"]
                + l["loss_objectness"])

    ours_total, g_ours = jax.value_and_grad(loss_fn)(variables["params"])
    np.testing.assert_allclose(
        float(ours_total), float(ref_total.detach()), rtol=5e-4,
        err_msg="total loss diverged before comparing grads")

    # port the torch grads through the SAME name maps as the weights
    tmpl = {
        "params": jax.tree.map(
            lambda a: np.zeros(np.shape(a), np.float32),
            variables["params"]),
        "batch_stats": jax.tree.map(
            lambda a: np.zeros(np.shape(a), np.float32),
            variables["batch_stats"]),
    }
    gport = tmpl
    for tm, mapper, prefix in ports:
        grad_sd = {
            k: (p.grad if p.grad is not None else torch.zeros_like(p))
            .detach().numpy().copy()
            for k, p in tm.named_parameters()
        }
        gport, report = wp.port_torch_state_dict(
            grad_sd, gport,
            name_mapper=lambda n, m=mapper, p=prefix: (p,) + m(n))
        assert not report["unused"], (prefix, report["unused"][:5])

    flat_ref = jax.tree_util.tree_flatten_with_path(gport["params"])[0]
    flat_ours = jax.tree_util.tree_flatten_with_path(g_ours)[0]
    assert len(flat_ref) == len(flat_ours)
    worst = (0.0, "")
    for (path_r, leaf_r), (path_o, leaf_o) in zip(flat_ref, flat_ours):
        name = jax.tree_util.keystr(path_o)
        assert path_r == path_o, (path_r, path_o)
        ref_a = np.asarray(leaf_r, np.float64)
        ours_a = np.asarray(leaf_o, np.float64)
        scale = max(float(np.abs(ref_a).max()), 1e-10)
        rel = float(np.max(np.abs(ours_a - ref_a))) / scale
        if rel > worst[0]:
            worst = (rel, name)
        _assert_grad_close(ours_a, ref_a, name, rtol=2e-2, atol_scale=2e-3)
    print(f"sparseinst worst per-parameter gradient rel-err: "
          f"{worst[0]:.2e} at {worst[1]}")


# ---------------------------------------------------------------------------
# DETR: full-model per-parameter gradients with deep supervision
# ---------------------------------------------------------------------------

def test_detr_full_model_param_grads():
    """torch loss.backward() through the reference's full DETR train path
    (plain R50 -> input_proj -> sine PE -> 3+3 transformer -> class/box
    heads, assembled exactly as ``Detr.__init__`` does at
    /root/reference/yolov7/modeling/meta_arch/detr.py:62-81, +
    SetCriterion with deep supervision and its no-grad scipy Hungarian
    matcher) vs jax.grad through our weight-ported flax DETR +
    detr_losses: per-parameter agreement, including the aux-level
    gradients through every decoder layer. Completes the full-model
    gradient ladder (YOLOX r4, SparseInst r5) for the DETR family —
    the family where the STRIDE_IN_1X1 gradient bug hid."""
    import torch

    install_stubs()
    rv = ref_module("yolov7.modeling.backbone.resnetvd")
    db = ref_module("yolov7.modeling.backbone.detr_backbone")
    detr_mod = ref_module("yolov7.modeling.meta_arch.detr")
    misc = ref_module("yolov7.utils.misc")
    setcrit = ref_module("yolov7.modeling.loss.setcriterion")
    detr_utils = ref_module("yolov7.utils.detr_utils")

    import yolov7_d2_tpu.utils.weight_port as wp
    from yolov7_d2_tpu.models.meta_arch.detr import (
        DETR, detr_losses, detr_match)

    H = W = 96
    B, D, HEADS, LAYERS, FF, Q, C = 2, 64, 4, 3, 128, 12, 7
    gt_counts = (3, 2)

    class _MaskedR50(torch.nn.Module):
        num_channels = 2048

        def __init__(self):
            super().__init__()
            self.backbone = rv.ResNet(["bottleneck"] * 4, [3, 4, 6, 3])

        def forward(self, tensor_list):
            f = self.backbone(tensor_list.tensors)["res5"]
            mask = torch.zeros(
                (f.shape[0], f.shape[2], f.shape[3]), dtype=torch.bool)
            return {"res5": misc.NestedTensor(f, mask)}

    joiner = db.Joiner(
        _MaskedR50(), db.PositionEmbeddingSine(D // 2, normalize=True))
    joiner.num_channels = 2048
    transformer_t = db.Transformer(
        d_model=D, nhead=HEADS, num_encoder_layers=LAYERS,
        num_decoder_layers=LAYERS, dim_feedforward=FF, dropout=0.0,
        return_intermediate_dec=True)
    ref_detr = detr_mod.DETR(
        joiner, transformer_t, num_classes=C, num_queries=Q,
        aux_loss=True).eval()

    def _rand(module, seed):
        g = torch.Generator().manual_seed(seed)
        with torch.no_grad():
            for p in module.parameters():
                p.copy_(torch.empty_like(p).uniform_(
                    -0.1, 0.1, generator=g))
            for m in module.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.uniform_(-0.5, 0.5, generator=g)
                    m.running_var.uniform_(0.5, 1.5, generator=g)

    _rand(ref_detr, 71)

    ours_model = DETR(num_classes=C, hidden_dim=D, num_queries=Q,
                      nheads=HEADS, enc_layers=LAYERS, dec_layers=LAYERS,
                      dim_feedforward=FF, dropout=0.0, resnet_depth=50)
    rng = np.random.RandomState(72)
    img = rng.uniform(0, 255, (B, 3, H, W)).astype(np.float32)
    x_nhwc = jnp.asarray(img.transpose(0, 2, 3, 1))
    variables = ours_model.init(jax.random.PRNGKey(0), x_nhwc)

    sd = {k: v.detach().numpy().copy()
          for k, v in ref_detr.state_dict().items()}
    trunk_sd = {k[len("backbone.0.backbone."):]: v for k, v in sd.items()
                if k.startswith("backbone.0.backbone.")}
    rest_sd = {k: v for k, v in sd.items() if not k.startswith("backbone.")}
    variables, report = wp.port_torch_state_dict(
        trunk_sd, variables,
        name_mapper=lambda n: ("backbone",)
        + wp.map_resnetvd_plain_torch_name(n))
    assert not report["unused"], report["unused"][:5]
    variables, report = wp.port_detr_state_dict(
        rest_sd, variables, num_heads=HEADS)
    assert not report["unused"], report["unused"][:5]

    # scene: normalized cxcywh gt boxes, clearly separated so every
    # Hungarian matching (final + each aux level) is unique on both sides
    Gmax = max(gt_counts)
    gt_boxes_px = np.zeros((B, Gmax, 4), np.float32)   # xyxy pixels
    gt_classes = np.zeros((B, Gmax), np.int32)
    gt_valid = np.zeros((B, Gmax), bool)
    targets = []
    for b, g in enumerate(gt_counts):
        cxcy = rng.uniform(0.25, 0.75, size=(g, 2))
        wh = rng.uniform(0.1, 0.4, size=(g, 2))
        boxes = np.concatenate([cxcy, wh], -1).astype(np.float32)
        cls = rng.randint(0, C, size=(g,))
        x0 = (boxes[:, 0] - boxes[:, 2] / 2) * W
        y0 = (boxes[:, 1] - boxes[:, 3] / 2) * H
        x1 = (boxes[:, 0] + boxes[:, 2] / 2) * W
        y1 = (boxes[:, 1] + boxes[:, 3] / 2) * H
        gt_boxes_px[b, :g] = np.stack([x0, y0, x1, y1], -1)
        gt_classes[b, :g] = cls
        gt_valid[b, :g] = True
        targets.append({"labels": _t(cls.astype(np.int64)),
                        "boxes": _t(boxes)})

    matcher = detr_utils.HungarianMatcher(
        cost_class=1, cost_bbox=5, cost_giou=2)
    weight_dict = {"loss_ce": 1.0, "loss_bbox": 5.0, "loss_giou": 2.0}
    for i in range(LAYERS - 1):
        weight_dict.update(
            {f"{k}_{i}": v for k, v in
             {"loss_ce": 1.0, "loss_bbox": 5.0, "loss_giou": 2.0}.items()})
    criterion = setcrit.SetCriterion(
        num_classes=C, matcher=matcher, weight_dict=weight_dict,
        eos_coef=0.1, losses=["labels", "boxes", "cardinality"])

    mean = np.array([103.53, 116.28, 123.675], np.float32)
    std = np.array([57.375, 57.12, 58.395], np.float32)
    x_norm = (img - mean[None, :, None, None]) / std[None, :, None, None]
    ref_detr.zero_grad(set_to_none=False)
    samples = misc.NestedTensor(
        torch.from_numpy(x_norm), torch.zeros((B, H, W), dtype=torch.bool))
    output = ref_detr(samples)
    ref_losses = criterion(output, targets)
    ref_total = sum(ref_losses[k] * weight_dict[k]
                    for k in ref_losses if k in weight_dict)
    ref_total.backward()

    # precondition: the matching agrees at EVERY supervised level (a
    # near-tied LSAP row flipped by forward fp noise would make the
    # gradient comparison vacuous; pick another scene seed if this trips)
    gt_norm = np.zeros((B, Gmax, 4), np.float32)
    scale = np.asarray([W, H, W, H], np.float32)
    xyxy = gt_boxes_px / scale
    gt_norm[..., 0:2] = (xyxy[..., 0:2] + xyxy[..., 2:4]) * 0.5
    gt_norm[..., 2:4] = xyxy[..., 2:4] - xyxy[..., 0:2]
    out_check = ours_model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, x_nhwc)
    levels = [(np.asarray(out_check["pred_logits"]),
               np.asarray(out_check["pred_boxes"]),
               {"pred_logits": output["pred_logits"].detach(),
                "pred_boxes": output["pred_boxes"].detach()})]
    for i in range(LAYERS - 1):
        aux = output["aux_outputs"][i]
        levels.append((np.asarray(out_check["aux_logits"][i]),
                       np.asarray(out_check["aux_boxes"][i]),
                       {"pred_logits": aux["pred_logits"].detach(),
                        "pred_boxes": aux["pred_boxes"].detach()}))
    for li, (lg, pb, ref_out) in enumerate(levels):
        pred_of_gt, ok = detr_match(
            jnp.asarray(lg), jnp.asarray(pb), jnp.asarray(gt_norm),
            jnp.asarray(gt_classes), jnp.asarray(gt_valid))
        with torch.no_grad():
            ref_idx = matcher(ref_out, targets)
        for b, g in enumerate(gt_counts):
            src, tgt = ref_idx[b]
            ref_map = {int(t): int(s)
                       for s, t in zip(np.asarray(src), np.asarray(tgt))}
            our_map = {i: int(np.asarray(pred_of_gt)[b, i])
                       for i in range(g) if bool(np.asarray(ok)[b, i])}
            assert ref_map == our_map, (
                f"level {li} image {b}: ref {ref_map} ours {our_map}")

    batch = {"gt_boxes": jnp.asarray(gt_boxes_px),
             "gt_classes": jnp.asarray(gt_classes),
             "gt_valid": jnp.asarray(gt_valid)}

    def loss_fn(params):
        out = ours_model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x_nhwc)
        return detr_losses(out, batch, num_classes=C, input_hw=(H, W),
                           deep_supervision=True)["total_loss"]

    ours_total, g_ours = jax.value_and_grad(loss_fn)(variables["params"])
    np.testing.assert_allclose(
        float(ours_total), float(ref_total.detach()), rtol=5e-4,
        err_msg="total loss diverged before comparing grads")

    grad_sd = {
        k: (p.grad if p.grad is not None else torch.zeros_like(p))
        .detach().numpy().copy()
        for k, p in ref_detr.named_parameters()
    }
    gtrunk = {k[len("backbone.0.backbone."):]: v for k, v in grad_sd.items()
              if k.startswith("backbone.0.backbone.")}
    grest = {k: v for k, v in grad_sd.items()
             if not k.startswith("backbone.")}
    tmpl = {
        "params": jax.tree.map(
            lambda a: np.zeros(np.shape(a), np.float32),
            variables["params"]),
        "batch_stats": jax.tree.map(
            lambda a: np.zeros(np.shape(a), np.float32),
            variables["batch_stats"]),
    }
    gport, report = wp.port_torch_state_dict(
        gtrunk, tmpl,
        name_mapper=lambda n: ("backbone",)
        + wp.map_resnetvd_plain_torch_name(n))
    assert not report["unused"], report["unused"][:5]
    gport, report = wp.port_detr_state_dict(
        grest, gport, num_heads=HEADS)
    assert not report["unused"], report["unused"][:5]

    flat_ref = jax.tree_util.tree_flatten_with_path(gport["params"])[0]
    flat_ours = jax.tree_util.tree_flatten_with_path(g_ours)[0]
    assert len(flat_ref) == len(flat_ours)
    worst = (0.0, "")
    for (path_r, leaf_r), (path_o, leaf_o) in zip(flat_ref, flat_ours):
        name = jax.tree_util.keystr(path_o)
        assert path_r == path_o, (path_r, path_o)
        ref_a = np.asarray(leaf_r, np.float64)
        ours_a = np.asarray(leaf_o, np.float64)
        scale_ = max(float(np.abs(ref_a).max()), 1e-10)
        rel = float(np.max(np.abs(ours_a - ref_a))) / scale_
        if rel > worst[0]:
            worst = (rel, name)
        _assert_grad_close(ours_a, ref_a, name, rtol=2e-2, atol_scale=2e-3)
    print(f"detr worst per-parameter gradient rel-err: "
          f"{worst[0]:.2e} at {worst[1]}")

# ---------------------------------------------------------------------------
# YOLOF: full-model per-parameter gradients (R50 -> DilatedEncoder -> Decoder)
# ---------------------------------------------------------------------------

def test_yolof_full_model_param_grads():
    """torch loss.backward() through the reference's full YOLOF train path
    (R50 -> DilatedEncoder -> Decoder with the implicit-objectness fold,
    /root/reference/yolov7/modeling/head/{encoder,decoder}.py, + the
    YOLOF criterion with its no-grad UniformMatcher boundary,
    meta_arch/yolof.py:326-431) vs jax.grad through our weight-ported
    full YOLOF + yolof_losses: per-parameter agreement. Completes the
    full-model gradient ladder (YOLOX r4, SparseInst/DETR r5) for every
    family the round-4 review named. The criterion-input grad test above
    pins d(loss)/d(head outputs); this one additionally pins the fold's
    log(1+e^cls+e^obj) backward and the encoder/decoder BN boundaries."""
    import types as _types

    import torch

    install_stubs()
    rv = ref_module("yolov7.modeling.backbone.resnetvd")
    re_enc = ref_module("yolov7.modeling.head.encoder")
    re_dec = ref_module("yolov7.modeling.head.decoder")
    yolof_mod = ref_module("yolov7.modeling.meta_arch.yolof")
    um = ref_module("yolov7.modeling.head.uniform_matcher")
    br = ref_module("yolov7.modeling.head.box_regression")
    from detectron2.structures import Boxes

    import yolov7_d2_tpu.utils.weight_port as wp
    from yolov7_d2_tpu.models.meta_arch.yolof import (
        YOLOF, decode_deltas, uniform_match, yolof_anchors, yolof_losses)

    H = W = 96
    B, C, NA = 2, 7, 5
    gt_counts = (3, 2)

    ns = lambda **kw: _types.SimpleNamespace(**kw)  # noqa: E731
    cfg = ns(MODEL=ns(YOLOF=ns(
        ENCODER=ns(BACKBONE_LEVEL="res5", IN_CHANNELS=2048, NUM_CHANNELS=64,
                   BLOCK_MID_CHANNELS=16, NUM_RESIDUAL_BLOCKS=4,
                   BLOCK_DILATIONS=[2, 4, 6, 8], NORM="BN",
                   ACTIVATION="ReLU"),
        DECODER=ns(IN_CHANNELS=64, NUM_CLASSES=C, NUM_ANCHORS=NA,
                   CLS_NUM_CONVS=2, REG_NUM_CONVS=4, NORM="BN",
                   ACTIVATION="ReLU", PRIOR_PROB=0.01),
    )))

    def _rand(module, seed):
        g = torch.Generator().manual_seed(seed)
        with torch.no_grad():
            for p in module.parameters():
                p.copy_(torch.empty_like(p).uniform_(
                    -0.1, 0.1, generator=g))
            for m in module.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.uniform_(-0.5, 0.5, generator=g)
                    m.running_var.uniform_(0.5, 1.5, generator=g)

    class _Shape:
        channels = 2048

    backbone_t = rv.ResNet(["bottleneck"] * 4, [3, 4, 6, 3]).eval()
    _rand(backbone_t, 81)
    encoder_t = re_enc.DilatedEncoder(cfg, {"res5": _Shape()}).eval()
    _rand(encoder_t, 82)
    decoder_t = re_dec.Decoder(cfg).eval()
    _rand(decoder_t, 83)

    # resnetvd's plain bottleneck strides on the 3x3 (torchvision style),
    # so the flax side is built stride_in_1x1=False for this differential;
    # build_yolof's d2-default True path is covered by the stacks parity
    ours_model = YOLOF(num_classes=C, resnet_depth=50, encoder_channels=64,
                       num_anchors=NA, stride_in_1x1=False)
    rng = np.random.RandomState(84)
    img = rng.uniform(0, 255, (B, 3, H, W)).astype(np.float32)
    x_nhwc = jnp.asarray(img.transpose(0, 2, 3, 1))
    variables = ours_model.init(jax.random.PRNGKey(0), x_nhwc)

    ports = (
        (backbone_t, wp.map_resnetvd_plain_torch_name, "backbone"),
        (encoder_t, wp.map_yolof_encoder_torch_name, "encoder"),
        (decoder_t, wp.map_yolof_decoder_torch_name, "decoder"),
    )
    for tm, mapper, prefix in ports:
        sd_np = {k: v.detach().numpy().copy()
                 for k, v in tm.state_dict().items()}
        variables, report = wp.port_torch_state_dict(
            sd_np, variables,
            name_mapper=lambda n, m=mapper, p=prefix: (p,) + m(n))
        assert not report["unused"], (prefix, report["unused"][:5])

    # the scene: pixel-space gt on a 96x96 image (res5 3x3 -> 45 anchors)
    Gmax = max(gt_counts)
    gt_boxes = np.zeros((B, Gmax, 4), np.float32)
    gt_classes = np.zeros((B, Gmax), np.int32)
    gt_valid = np.zeros((B, Gmax), bool)
    targets = []
    for b, g in enumerate(gt_counts):
        cxcy = rng.uniform(24, W - 24, size=(g, 2))
        wh = rng.uniform(20, 60, size=(g, 2))
        boxes = np.concatenate(
            [cxcy - wh / 2, cxcy + wh / 2], -1).astype(np.float32)
        cls = rng.randint(0, C, size=(g,))
        gt_boxes[b, :g], gt_classes[b, :g], gt_valid[b, :g] = boxes, cls, True
        targets.append(SimpleNamespace(
            gt_boxes=Boxes(_t(boxes)),
            gt_classes=_t(cls.astype(np.int64))))

    anchors_np = yolof_anchors(H // 32, W // 32, stride=32)
    A = anchors_np.shape[0]
    anchors_t = _t(anchors_np)

    # reference train forward (grad ENABLED end-to-end; the matcher runs
    # no-grad exactly as get_ground_truth does, yolof.py:424-434)
    mean = np.array([103.53, 116.28, 123.675], np.float32)
    std = np.array([57.375, 57.12, 58.395], np.float32)
    x_norm = (img - mean[None, :, None, None]) / std[None, :, None, None]
    for tm, _, _ in ports:
        tm.zero_grad(set_to_none=False)
    feats = backbone_t(torch.from_numpy(x_norm))["res5"]
    enc = encoder_t(feats)
    cls_raw, reg_raw = decoder_t(enc)
    logits_t = yolof_mod.permute_to_N_HWA_K(cls_raw, C)
    deltas_t = yolof_mod.permute_to_N_HWA_K(reg_raw, 4)

    ref = object.__new__(yolof_mod.YOLOF)
    torch.nn.Module.__init__(ref)
    ref.num_classes = C
    ref.focal_loss_alpha = 0.25
    ref.focal_loss_gamma = 2.0
    ref.neg_ignore_thresh = 0.7
    ref.pos_ignore_thresh = 0.15
    ref.box2box_transform = br.YOLOFBox2BoxTransform(
        weights=(1.0, 1.0, 1.0, 1.0))
    ref.matcher = um.UniformMatcher(4)
    with torch.no_grad():
        pred_boxes_m = ref.box2box_transform.apply_deltas(
            deltas_t.detach().reshape(-1, 4),
            anchors_t[None].repeat(B, 1, 1).reshape(-1, 4),
        ).reshape(B, A, 4)
        indices = ref.matcher(
            pred_boxes_m, anchors_t[None].repeat(B, 1, 1), targets)
    ref_losses = ref.losses(
        indices, targets, [[Boxes(anchors_t)] for _ in range(B)],
        [logits_t], [deltas_t])
    ref_total = ref_losses["loss_cls"] + ref_losses["loss_box_reg"]
    ref_total.backward()

    # precondition: both matchers picked the same occurrence multiset (a
    # near-tied top-k row flipped by deep-stack fp32 forward noise would
    # make the gradient comparison vacuous — pick another scene seed)
    out_check = ours_model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, x_nhwc)
    pred_boxes_ours = decode_deltas(
        jnp.asarray(anchors_np)[None], out_check["deltas"])
    m_check = jax.vmap(
        lambda pb, gb, gv: uniform_match(
            pb, jnp.asarray(anchors_np), gb, gv, num_classes=C)
    )(pred_boxes_ours, jnp.asarray(gt_boxes), jnp.asarray(gt_valid))
    for b, g in enumerate(gt_counts):
        src, tgt = indices[b]
        ref_pairs = sorted(zip(np.asarray(src).tolist(),
                               np.asarray(tgt).tolist()))
        occ_a = np.asarray(m_check["occ_anchor"][b])
        occ_g = np.asarray(m_check["occ_gt"][b])
        occ_v = np.asarray(m_check["occ_valid"][b])
        our_pairs = sorted((int(a), int(t))
                           for a, t, v in zip(occ_a, occ_g, occ_v) if v)
        assert ref_pairs == our_pairs, (
            f"matcher occurrences diverged on image {b}: "
            f"ref {ref_pairs} ours {our_pairs}")

    batch = {"gt_boxes": jnp.asarray(gt_boxes),
             "gt_classes": jnp.asarray(gt_classes),
             "gt_valid": jnp.asarray(gt_valid)}

    def loss_fn(params):
        out = ours_model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x_nhwc)
        return yolof_losses(out, batch, num_classes=C)["total_loss"]

    ours_total, g_ours = jax.value_and_grad(loss_fn)(variables["params"])
    np.testing.assert_allclose(
        float(ours_total), float(ref_total.detach()), rtol=5e-4,
        err_msg="total loss diverged before comparing grads")

    tmpl = {
        "params": jax.tree.map(
            lambda a: np.zeros(np.shape(a), np.float32),
            variables["params"]),
        "batch_stats": jax.tree.map(
            lambda a: np.zeros(np.shape(a), np.float32),
            variables["batch_stats"]),
    }
    gport = tmpl
    for tm, mapper, prefix in ports:
        grad_sd = {
            k: (p.grad if p.grad is not None else torch.zeros_like(p))
            .detach().numpy().copy()
            for k, p in tm.named_parameters()
        }
        gport, report = wp.port_torch_state_dict(
            grad_sd, gport,
            name_mapper=lambda n, m=mapper, p=prefix: (p,) + m(n))
        assert not report["unused"], (prefix, report["unused"][:5])

    flat_ref = jax.tree_util.tree_flatten_with_path(gport["params"])[0]
    flat_ours = jax.tree_util.tree_flatten_with_path(g_ours)[0]
    assert len(flat_ref) == len(flat_ours)
    worst = (0.0, "")
    for (path_r, leaf_r), (path_o, leaf_o) in zip(flat_ref, flat_ours):
        name = jax.tree_util.keystr(path_o)
        assert path_r == path_o, (path_r, path_o)
        ref_a = np.asarray(leaf_r, np.float64)
        ours_a = np.asarray(leaf_o, np.float64)
        scale_ = max(float(np.abs(ref_a).max()), 1e-10)
        rel = float(np.max(np.abs(ours_a - ref_a))) / scale_
        if rel > worst[0]:
            worst = (rel, name)
        _assert_grad_close(ours_a, ref_a, name, rtol=2e-2, atol_scale=2e-3)
    print(f"yolof worst per-parameter gradient rel-err: "
          f"{worst[0]:.2e} at {worst[1]}")

# ---------------------------------------------------------------------------
# YOLOv6: criterion-input gradients + full-model per-parameter gradients
# ---------------------------------------------------------------------------

def _v6_scene(rng, B, C, img, level_hw, strides_l, gt_counts, Gmax):
    """Raw per-level outputs + normalized targets (the reference's format,
    yolov6_head.py:330 scales them back by feat*stride in-place) + our
    static-shape gt arrays, one scene for both sides."""
    A = sum(h * w for h, w in level_hw)
    raw = rng.randn(B, A, 5 + C).astype(np.float32) * 0.5
    grids, stride_v = [], []
    for (h, w), s in zip(level_hw, strides_l):
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        grids.append(np.stack([xs, ys], -1).reshape(-1, 2).astype(np.float32))
        stride_v.append(np.full((h * w,), s, np.float32))
    grids = np.concatenate(grids)
    stride_v = np.concatenate(stride_v)

    targets = np.zeros((B, Gmax, 5), np.float32)
    gt_boxes = np.zeros((B, Gmax, 4), np.float32)
    gt_classes = np.zeros((B, Gmax), np.int32)
    gt_valid = np.zeros((B, Gmax), bool)
    for b, g in enumerate(gt_counts):
        cxcy = rng.uniform(12, img - 12, size=(g, 2)).astype(np.float32)
        wh = rng.uniform(8, 30, size=(g, 2)).astype(np.float32)
        cls = rng.randint(0, C, size=(g,))
        targets[b, :g, 0] = cls
        targets[b, :g, 1:3] = cxcy / img
        targets[b, :g, 3:5] = wh / img
        gt_boxes[b, :g, 0:2] = cxcy - wh / 2
        gt_boxes[b, :g, 2:4] = cxcy + wh / 2
        gt_classes[b, :g] = cls
        gt_valid[b, :g] = True
    return raw, grids, stride_v, targets, (gt_boxes, gt_classes, gt_valid)


def test_yolov6_criterion_input_grads(capsys):
    """d(ComputeLoss total)/d(raw per-level outputs)
    (yolov6_head.py:315-530) vs jax.grad of yolov6_losses — pins the v6
    SimOTA no-grad boundary (get_assignments @torch.no_grad) and the
    5*ciou + l1 + obj + cls composition."""
    import torch

    install_stubs()
    ref_mod = ref_module("yolov7.modeling.head.yolov6_head")
    from yolov7_d2_tpu.models.meta_arch.yolov6 import yolov6_losses

    rng = np.random.RandomState(23)
    B, C, img = 2, 7, 64
    level_hw = [(8, 8), (4, 4), (2, 2)]
    strides_l = [8, 16, 32]
    raw, grids, stride_v, targets, gt = _v6_scene(
        rng, B, C, img, level_hw, strides_l, (3, 2), 4)

    ref_levels, leaves = [], []
    off = 0
    for (h, w), s in zip(level_hw, strides_l):
        leaf = _t(raw[:, off:off + h * w]
                  .reshape(B, 1, h, w, 5 + C).copy(), requires_grad=True)
        leaves.append(leaf)
        # the reference decodes IN-PLACE on its level tensors
        # (yolov6_head.py:551) — hand it a non-leaf clone so autograd
        # permits the mutation while grads still flow to the leaf
        ref_levels.append(leaf.clone())
        off += h * w

    cl = ref_mod.ComputeLoss(iou_type="ciou")
    ref_total, _ = cl(ref_levels, _t(targets))
    ref_total.backward()
    capsys.readouterr()   # the reference prints targets (debug residue)

    def f(r):
        l = yolov6_losses(
            {"outputs": r, "grids": jnp.asarray(grids),
             "strides": jnp.asarray(stride_v)},
            {"gt_boxes": jnp.asarray(gt[0]),
             "gt_classes": jnp.asarray(gt[1]),
             "gt_valid": jnp.asarray(gt[2])},
            num_classes=C)
        return l["total_loss"]

    g_raw = jax.grad(f)(jnp.asarray(raw))
    off = 0
    for li, ((h, w), leaf) in enumerate(zip(level_hw, leaves)):
        g_ref = leaf.grad.numpy().reshape(B, h * w, 5 + C)
        _assert_grad_close(
            np.asarray(g_raw[:, off:off + h * w]), g_ref,
            f"v6 d/d_raw level {li}")
        off += h * w


def test_yolov6_full_model_param_grads(capsys):
    """torch loss.backward() through the reference's full YOLOv6 train
    path — EfficientRep -> RepPANNeck -> EffiDeHead (training-mode output
    format, effidehead.py:74-86) -> ComputeLoss, with every BN re-inited
    to the assembled-model eps=1e-3/momentum=0.03 exactly as
    meta_arch/yolov6.py:107-111 does — vs jax.grad through our
    weight-ported YOLOV6 + yolov6_losses, per-parameter. Train-mode BN on
    both sides (batch statistics), like the YOLOX capstone."""
    import torch

    install_stubs()
    er = ref_module("yolov7.modeling.backbone.efficientrep")
    rp = ref_module("yolov7.modeling.neck.reppan")
    eh = ref_module("yolov7.modeling.head.effidehead")
    ref_mod = ref_module("yolov7.modeling.head.yolov6_head")

    import yolov7_d2_tpu.utils.weight_port as wp
    from yolov7_d2_tpu.models.backbones.efficientrep import make_divisible
    from yolov7_d2_tpu.models.meta_arch.yolov6 import YOLOV6, yolov6_losses

    width, depth = 0.25, 0.33
    B, C, img = 2, 7, 64
    backbone_plan = [64, 128, 256, 512, 1024]
    neck_plan = [256, 128, 128, 256, 256, 512]
    reps_plan = [1, 6, 12, 18, 6] + [12, 12, 12, 12]
    channels = [make_divisible(c * width) for c in backbone_plan + neck_plan]
    repeats = [max(round(r * depth), 1) if r > 1 else r for r in reps_plan]

    backbone_t = er.EfficientRep(
        channels_list=channels, num_repeats=repeats,
        out_features=["stride8", "stride16", "stride32"])
    neck_t = rp.RepPANNeck(
        channels_list=channels, num_repeats=repeats,
        in_features=["stride8", "stride16", "stride32"])
    layers = eh.build_effidehead_layer(channels, 1, C)
    head_t = eh.EffiDeHead(C, anchors=1, num_layers=3, head_layers=layers)

    def _rand(module, seed):
        g = torch.Generator().manual_seed(seed)
        with torch.no_grad():
            for p in module.parameters():
                p.copy_(torch.empty_like(p).uniform_(
                    -0.1, 0.1, generator=g))
        # assembled-model BN semantics (yolov6.py:107-111 _init_model)
        for m in module.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.eps = 1e-3
                m.momentum = 0.03

    for tm, seed in ((backbone_t, 91), (neck_t, 92), (head_t, 93)):
        _rand(tm, seed)
        tm.train()

    ours_model = YOLOV6(num_classes=C, width_mul=width, depth_mul=depth)
    rng = np.random.RandomState(94)
    x = rng.uniform(0, 255, (B, 3, img, img)).astype(np.float32)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = ours_model.init(jax.random.PRNGKey(0), x_nhwc)

    ports = (
        (backbone_t, "backbone",
         lambda sd, v: wp.port_torch_state_dict(
             sd, v, name_mapper=lambda n:
             ("backbone",) + wp.map_efficientrep_torch_name(n))),
        (neck_t, "neck",
         lambda sd, v: wp.port_reppan_state_dict(
             sd, v, prefix=("neck",))),
        (head_t, "head",
         lambda sd, v: wp.port_torch_state_dict(
             sd, v, name_mapper=lambda n:
             ("head",) + wp.map_effidehead_torch_name(n))),
    )
    for tm, prefix, port in ports:
        sd_np = {k: v.detach().numpy().copy()
                 for k, v in tm.state_dict().items()
                 if "num_batches_tracked" not in k}
        variables, report = port(sd_np, variables)
        assert not report["unused"], (prefix, report["unused"][:5])

    raw_, grids, stride_v, targets, gt = _v6_scene(
        np.random.RandomState(95), B, C, img,
        [(8, 8), (4, 4), (2, 2)], [8, 16, 32], (3, 2), 4)
    del raw_  # the raw outputs come from the real forward here

    for tm, _, _ in ports:
        tm.zero_grad(set_to_none=False)
    feats = backbone_t(torch.from_numpy(x))
    pan = list(neck_t(feats))
    out_levels = head_t(pan)            # training format [B,1,H,W,5+C]
    cl = ref_mod.ComputeLoss(iou_type="ciou")
    ref_total, _ = cl(out_levels, _t(targets))
    ref_total.backward()
    capsys.readouterr()   # the reference prints targets (debug residue)

    def loss_fn(params):
        out, _ = ours_model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x_nhwc, train=True, mutable=["batch_stats"])
        l = yolov6_losses(
            out,
            {"gt_boxes": jnp.asarray(gt[0]),
             "gt_classes": jnp.asarray(gt[1]),
             "gt_valid": jnp.asarray(gt[2])},
            num_classes=C)
        return l["total_loss"]

    ours_total, g_ours = jax.value_and_grad(loss_fn)(variables["params"])
    np.testing.assert_allclose(
        float(ours_total), float(ref_total.detach()), rtol=5e-4,
        err_msg="total loss diverged before comparing grads")

    tmpl = {
        "params": jax.tree.map(
            lambda a: np.zeros(np.shape(a), np.float32),
            variables["params"]),
        "batch_stats": jax.tree.map(
            lambda a: np.zeros(np.shape(a), np.float32),
            variables["batch_stats"]),
    }
    gport = tmpl
    for tm, prefix, port in ports:
        grad_sd = {
            k: (p.grad if p.grad is not None else torch.zeros_like(p))
            .detach().numpy().copy()
            for k, p in tm.named_parameters()
        }
        gport, report = port(grad_sd, gport)
        assert not report["unused"], (prefix, report["unused"][:5])

    flat_ref = jax.tree_util.tree_flatten_with_path(gport["params"])[0]
    flat_ours = jax.tree_util.tree_flatten_with_path(g_ours)[0]
    assert len(flat_ref) == len(flat_ours)
    worst = (0.0, "")
    for (path_r, leaf_r), (path_o, leaf_o) in zip(flat_ref, flat_ours):
        name = jax.tree_util.keystr(path_o)
        assert path_r == path_o, (path_r, path_o)
        ref_a = np.asarray(leaf_r, np.float64)
        ours_a = np.asarray(leaf_o, np.float64)
        scale_ = max(float(np.abs(ref_a).max()), 1e-10)
        rel = float(np.max(np.abs(ours_a - ref_a))) / scale_
        if rel > worst[0]:
            worst = (rel, name)
        _assert_grad_close(ours_a, ref_a, name, rtol=2e-2, atol_scale=2e-3)
    print(f"yolov6 worst per-parameter gradient rel-err: "
          f"{worst[0]:.2e} at {worst[1]}")
