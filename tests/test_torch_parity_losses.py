"""Differential TRAINING-LOSS parity against the reference's own torch
criteria (VERDICT round-3 item 1).

Forward activations are covered by test_torch_parity_stacks.py; this file
closes the other half: for random scenes, the reference's loss modules —
imported read-only from /root/reference and run on CPU torch — must produce
the same per-term loss VALUES as our jax criteria:

  * SparseInstCriterion + SparseInstMatcher
      /root/reference/yolov7/modeling/loss/sparseinst_loss.py:49-365
  * DETR SetCriterion (softmax CE + eos_coef) and FocalLossSetCriterion
      /root/reference/yolov7/modeling/loss/setcriterion.py:23,295
      + HungarianMatcher /root/reference/yolov7/utils/detr_utils.py:12
  * YOLOX get_losses end-to-end (SimOTA inside)
      /root/reference/yolov7/modeling/head/yolox_head.py:274-449
  * YOLOF criterion + UniformMatcher
      /root/reference/yolov7/modeling/meta_arch/yolof.py:326
      /root/reference/yolov7/modeling/head/uniform_matcher.py:13

Scenes are generated to avoid measure-zero assignment ties (continuous
random logits/boxes) so the hungarian/SimOTA matchings are unique and the
loss comparison is exact to fp32 tolerance.
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

RTOL = 2e-4
ATOL = 2e-5


def _t(x):
    import torch

    return torch.as_tensor(np.asarray(x))


# ---------------------------------------------------------------------------
# SparseInst
# ---------------------------------------------------------------------------

class _MasksShim:
    """targets[i]["masks"] in the reference criterion: len() + .tensor."""

    def __init__(self, tensor):
        self.tensor = tensor

    def __len__(self):
        return self.tensor.shape[0]


def _sparseinst_cfg(num_classes=6):
    loss = SimpleNamespace(
        ITEMS=("labels", "masks"),
        CLASS_WEIGHT=2.0,
        MASK_PIXEL_WEIGHT=5.0,
        MASK_DICE_WEIGHT=2.0,
        OBJECTNESS_WEIGHT=1.0,
        NAME="SparseInstCriterion",
    )
    matcher = SimpleNamespace(ALPHA=0.8, BETA=0.2, NAME="SparseInstMatcher")
    si = SimpleNamespace(
        LOSS=loss, MATCHER=matcher,
        DECODER=SimpleNamespace(NUM_CLASSES=num_classes),
    )
    return SimpleNamespace(MODEL=SimpleNamespace(SPARSE_INST=si))


def _soft_blob_masks(rng, n, h, w):
    """Random smooth blobs with real [0,1] support — continuous enough that
    matcher scores never tie, binary enough to exercise the 0.4/0.5
    thresholds."""
    yy, xx = np.mgrid[0:h, 0:w]
    masks = []
    for _ in range(n):
        cy, cx = rng.uniform(0.2, 0.8) * h, rng.uniform(0.2, 0.8) * w
        ry, rx = rng.uniform(0.15, 0.4) * h, rng.uniform(0.15, 0.4) * w
        d = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2
        masks.append((d < 1.0).astype(np.float32))
    return np.stack(masks)


# NOTE: an all-empty batch ((0, 0)) crashes inside the REFERENCE itself:
# SparseInstMatcher returns float empty index tensors and loss_labels indexes
# with them (sparseinst_loss.py:316,94) -> IndexError. Our criterion handles
# it (focal over all-background + zero mask terms), so only mixed/empty-image
# cases are differentially comparable.
@pytest.mark.parametrize("gt_counts", [(3, 2), (4, 0), (1, 5)])
def test_sparseinst_criterion_loss_parity(gt_counts):
    import torch

    install_stubs()
    ref = ref_module("yolov7.modeling.loss.sparseinst_loss")
    from yolov7_d2_tpu.models.meta_arch.sparseinst import sparseinst_losses

    rng = np.random.RandomState(0)
    B, N, C = len(gt_counts), 16, 6
    H, W = 64, 96          # input resolution
    Hm, Wm = 16, 24        # mask-logit resolution
    Gmax = max(max(gt_counts), 1)

    cls_logits = rng.randn(B, N, C).astype(np.float32)
    mask_logits = rng.randn(B, N, Hm, Wm).astype(np.float32) * 2.0
    obj_logits = rng.randn(B, N).astype(np.float32)

    gt_masks = np.zeros((B, Gmax, H, W), np.float32)
    gt_classes = np.zeros((B, Gmax), np.int32)
    gt_valid = np.zeros((B, Gmax), bool)
    targets = []
    for b, g in enumerate(gt_counts):
        if g > 0:
            m = _soft_blob_masks(rng, g, H, W)
            cls = rng.randint(0, C, size=(g,))
            gt_masks[b, :g] = m
            gt_classes[b, :g] = cls
            gt_valid[b, :g] = True
        else:
            m = np.zeros((0, H, W), np.float32)
            cls = np.zeros((0,), np.int64)
        targets.append({
            "labels": _t(cls.astype(np.int64)),
            "masks": _MasksShim(_t(m)),
        })

    cfg = _sparseinst_cfg(C)
    criterion = ref.SparseInstCriterion(cfg, ref.SparseInstMatcher(cfg))
    with torch.no_grad():
        ref_losses = criterion(
            {
                "pred_logits": _t(cls_logits),
                "pred_masks": _t(mask_logits),
                "pred_scores": _t(obj_logits[..., None]),
            },
            targets,
            input_shape=(H, W),
        )

    ours = sparseinst_losses(
        {
            "cls_logits": jnp.asarray(cls_logits),
            "mask_logits": jnp.asarray(mask_logits),
            "obj_logits": jnp.asarray(obj_logits),
        },
        jnp.asarray(gt_masks),
        jnp.asarray(gt_classes),
        jnp.asarray(gt_valid),
        num_classes=C,
    )

    for key in ("loss_ce", "loss_mask", "loss_dice", "loss_objectness"):
        np.testing.assert_allclose(
            float(ours[key]), float(ref_losses[key]),
            rtol=RTOL, atol=ATOL, err_msg=f"sparseinst {key}",
        )


# ---------------------------------------------------------------------------
# DETR SetCriterion (softmax) + FocalLossSetCriterion
# ---------------------------------------------------------------------------

def _random_detr_scene(rng, B, Q, C, gt_counts):
    """Random logits + normalized cxcywh boxes with nonempty extent."""
    logits = rng.randn(B, Q, C + 1).astype(np.float32)
    # sigmoid keeps pred boxes in (0,1) like the reference's bbox_embed
    pred = 1.0 / (1.0 + np.exp(-rng.randn(B, Q, 4).astype(np.float32)))
    Gmax = max(max(gt_counts), 1)
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
        targets.append({
            "labels": _t(cls.astype(np.int64)),
            "boxes": _t(boxes),
        })
    return logits, pred, gt_boxes, gt_classes, gt_valid, targets


@pytest.mark.parametrize("use_focal", [False, True])
def test_detr_set_criterion_loss_parity(use_focal):
    import torch

    install_stubs()
    setcrit = ref_module("yolov7.modeling.loss.setcriterion")
    detr_utils = ref_module("yolov7.utils.detr_utils")
    from yolov7_d2_tpu.models.meta_arch.detr import detr_set_criterion

    rng = np.random.RandomState(7 if use_focal else 3)
    B, Q, C = 2, 24, 7
    gt_counts = (4, 2)
    logits, pred, gt_boxes, gt_classes, gt_valid, targets = (
        _random_detr_scene(rng, B, Q, C, gt_counts))

    if use_focal:
        matcher = detr_utils.HungarianMatcherAnchorDETR(
            cost_class=1, cost_bbox=5, cost_giou=2)
        criterion = setcrit.FocalLossSetCriterion(
            num_classes=C, matcher=matcher, weight_dict={},
            losses=["labels", "boxes"], focal_alpha=0.25)
        ref_logits = logits[..., :C]    # focal archs predict C channels
    else:
        matcher = detr_utils.HungarianMatcher(
            cost_class=1, cost_bbox=5, cost_giou=2)
        criterion = setcrit.SetCriterion(
            num_classes=C, matcher=matcher, weight_dict={},
            eos_coef=0.1, losses=["labels", "boxes", "cardinality"])
        ref_logits = logits

    with torch.no_grad():
        ref_losses = criterion(
            {"pred_logits": _t(ref_logits), "pred_boxes": _t(pred)},
            targets,
        )

    ours = detr_set_criterion(
        jnp.asarray(logits), jnp.asarray(pred),
        jnp.asarray(gt_boxes), jnp.asarray(gt_classes),
        jnp.asarray(gt_valid),
        num_classes=C, eos_coef=0.1, use_focal=use_focal,
    )

    # ours bakes the reference meta-arch weight_dict (bbox 5, giou 2) in
    np.testing.assert_allclose(
        float(ours["loss_ce"]), float(ref_losses["loss_ce"]),
        rtol=RTOL, atol=ATOL, err_msg="detr loss_ce")
    np.testing.assert_allclose(
        float(ours["loss_bbox"]), 5.0 * float(ref_losses["loss_bbox"]),
        rtol=RTOL, atol=ATOL, err_msg="detr loss_bbox")
    np.testing.assert_allclose(
        float(ours["loss_giou"]), 2.0 * float(ref_losses["loss_giou"]),
        rtol=RTOL, atol=ATOL, err_msg="detr loss_giou")
    if not use_focal:
        np.testing.assert_allclose(
            float(ours["cardinality_error"]),
            float(ref_losses["cardinality_error"]),
            rtol=RTOL, atol=ATOL, err_msg="detr cardinality")


def test_detr_aux_losses_parity():
    """Deep-supervision levels go through the same criterion per level."""
    import torch

    install_stubs()
    setcrit = ref_module("yolov7.modeling.loss.setcriterion")
    detr_utils = ref_module("yolov7.utils.detr_utils")
    from yolov7_d2_tpu.models.meta_arch.detr import detr_set_criterion

    rng = np.random.RandomState(11)
    B, Q, C, L = 2, 16, 5, 2
    gt_counts = (3, 1)
    scenes = [_random_detr_scene(rng, B, Q, C, gt_counts) for _ in range(L + 1)]
    logits, pred, gt_boxes, gt_classes, gt_valid, targets = scenes[0]

    matcher = detr_utils.HungarianMatcher(cost_class=1, cost_bbox=5,
                                          cost_giou=2)
    criterion = setcrit.SetCriterion(
        num_classes=C, matcher=matcher, weight_dict={}, eos_coef=0.1,
        losses=["labels", "boxes"])
    outputs = {
        "pred_logits": _t(logits), "pred_boxes": _t(pred),
        "aux_outputs": [
            {"pred_logits": _t(s[0]), "pred_boxes": _t(s[1])}
            for s in scenes[1:]
        ],
    }
    with torch.no_grad():
        ref_losses = criterion(outputs, targets)

    for i, s in enumerate(scenes[1:]):
        ours = detr_set_criterion(
            jnp.asarray(s[0]), jnp.asarray(s[1]),
            jnp.asarray(gt_boxes), jnp.asarray(gt_classes),
            jnp.asarray(gt_valid), num_classes=C, eos_coef=0.1,
        )
        np.testing.assert_allclose(
            float(ours["loss_ce"]), float(ref_losses[f"loss_ce_{i}"]),
            rtol=RTOL, atol=ATOL, err_msg=f"aux{i} loss_ce")
        np.testing.assert_allclose(
            float(ours["loss_bbox"]), 5.0 * float(ref_losses[f"loss_bbox_{i}"]),
            rtol=RTOL, atol=ATOL, err_msg=f"aux{i} loss_bbox")
        np.testing.assert_allclose(
            float(ours["loss_giou"]), 2.0 * float(ref_losses[f"loss_giou_{i}"]),
            rtol=RTOL, atol=ATOL, err_msg=f"aux{i} loss_giou")


# ---------------------------------------------------------------------------
# YOLOX get_losses (SimOTA inside) — end-to-end loss values
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("use_l1", [False, True])
def test_yolox_get_losses_parity(use_l1):
    import torch

    install_stubs()
    ref_head_mod = ref_module("yolov7.modeling.head.yolox_head")
    from yolov7_d2_tpu.models.heads.yolox_head import yolox_losses

    rng = np.random.RandomState(5)
    B, C = 2, 7
    img = 64
    level_hw = [(8, 8), (4, 4), (2, 2)]
    strides_l = [8, 16, 32]
    A = sum(h * w for h, w in level_hw)
    gt_counts = (3, 2)
    Gmax = 4

    # raw head outputs per level (reg 4 | obj 1 | cls C), flattened raster
    raw = rng.randn(B, A, 5 + C).astype(np.float32) * 0.5

    # grids / strides in our flat layout
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

    # reference consumes DECODED outputs (get_output_and_grid semantics)
    decoded = raw.copy()
    decoded[..., 0:2] = (raw[..., 0:2] + grids) * stride_v[:, None]
    decoded[..., 2:4] = np.exp(raw[..., 2:4]) * stride_v[:, None]

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

    head = ref_head_mod.YOLOXHead(
        num_classes=C, width=0.25, strides=strides_l,
        in_channels=[64, 128, 256])
    head.use_l1 = use_l1
    origin_preds = [
        _t(raw[:, o:o + h * w, :4].copy())
        for o, (h, w) in zip(
            np.cumsum([0] + [h * w for h, w in level_hw[:-1]]), level_hw)
    ]
    with torch.no_grad():
        (ref_total, ref_iou, ref_obj, ref_cls, ref_l1, _fg_ratio) = (
            head.get_losses(
                None,
                x_shifts, y_shifts, exp_strides,
                _t(labels), _t(decoded), origin_preds,
                dtype=torch.float32,
            ))

    ours = yolox_losses(
        {
            "outputs": jnp.asarray(raw),
            "grids": jnp.asarray(grids),
            "strides": jnp.asarray(stride_v),
        },
        jnp.asarray(gt_boxes), jnp.asarray(gt_classes),
        jnp.asarray(gt_valid),
        num_classes=C, use_l1=use_l1, prefilter_topk=None,
    )

    np.testing.assert_allclose(
        float(ours["loss_iou"]), float(ref_iou), rtol=RTOL, atol=ATOL,
        err_msg="yolox loss_iou (x5)")
    np.testing.assert_allclose(
        float(ours["loss_obj"]), float(ref_obj), rtol=RTOL, atol=ATOL,
        err_msg="yolox loss_obj")
    np.testing.assert_allclose(
        float(ours["loss_cls"]), float(ref_cls), rtol=RTOL, atol=ATOL,
        err_msg="yolox loss_cls")
    if use_l1:
        np.testing.assert_allclose(
            float(ours["loss_l1"]), float(ref_l1), rtol=RTOL, atol=ATOL,
            err_msg="yolox loss_l1")
    np.testing.assert_allclose(
        float(ours["total_loss"]), float(ref_total),
        rtol=RTOL, atol=ATOL, err_msg="yolox total")


# ---------------------------------------------------------------------------
# YOLOF criterion + UniformMatcher
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("gt_counts", [(3, 2), (2, 0)])
def test_yolof_criterion_loss_parity(gt_counts):
    import torch
    import torch.nn as nn

    install_stubs()
    yolof_mod = ref_module("yolov7.modeling.meta_arch.yolof")
    um = ref_module("yolov7.modeling.head.uniform_matcher")
    br = ref_module("yolov7.modeling.head.box_regression")
    from detectron2.structures import Boxes

    from yolov7_d2_tpu.models.meta_arch.yolof import (
        decode_deltas, yolof_anchors, yolof_losses)

    rng = np.random.RandomState(13)
    B, C = len(gt_counts), 6
    H = W = 4
    stride, img = 32, 128
    anchors_np = yolof_anchors(H, W, stride=stride)          # [A, 4]
    A = anchors_np.shape[0]
    Gmax = max(max(gt_counts), 1)

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
            gt_classes=_t(cls.astype(np.int64)),
        ))

    # reference YOLOF: only the attributes its matcher+losses touch
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

    anchors_t = _t(anchors_np)
    pred_boxes_t = ref.box2box_transform.apply_deltas(
        _t(deltas).reshape(-1, 4),
        anchors_t[None].repeat(B, 1, 1).reshape(-1, 4),
    ).reshape(B, A, 4)
    with torch.no_grad():
        indices = ref.matcher(
            pred_boxes_t, anchors_t[None].repeat(B, 1, 1), targets)
        ref_losses = ref.losses(
            indices, targets,
            [[Boxes(anchors_t)] for _ in range(B)],
            [_t(logits)], [_t(deltas)],
        )

    ours = yolof_losses(
        {
            "logits": jnp.asarray(logits),
            "deltas": jnp.asarray(deltas),
            "anchors": jnp.asarray(anchors_np),
        },
        {
            "gt_boxes": jnp.asarray(gt_boxes),
            "gt_classes": jnp.asarray(gt_classes),
            "gt_valid": jnp.asarray(gt_valid),
        },
        num_classes=C,
    )

    # decode itself is parity-proven in test_torch_parity_stacks; here the
    # loss values close the loop
    ours_pred = decode_deltas(jnp.asarray(anchors_np)[None],
                              jnp.asarray(deltas))
    np.testing.assert_allclose(
        np.asarray(ours_pred), pred_boxes_t.numpy(), rtol=1e-4, atol=1e-3)

    np.testing.assert_allclose(
        float(ours["loss_cls"]), float(ref_losses["loss_cls"]),
        rtol=RTOL, atol=ATOL, err_msg="yolof loss_cls")
    np.testing.assert_allclose(
        float(ours["loss_box"]), float(ref_losses["loss_box_reg"]),
        rtol=RTOL, atol=ATOL, err_msg="yolof loss_box_reg")


# ---------------------------------------------------------------------------
# YOLOX-KPTS get_losses (kpt OKS + visibility terms)
# ---------------------------------------------------------------------------

def test_yolox_kpts_get_losses_parity():
    import torch

    install_stubs()
    ref_mod = ref_module("yolov7.modeling.head.yolox_kpts_head")
    from yolov7_d2_tpu.models.meta_arch.yolox_kpts import yolox_kpts_losses

    rng = np.random.RandomState(17)
    B, C, P = 2, 1, 17
    img = 64
    level_hw = [(8, 8), (4, 4), (2, 2)]
    strides_l = [8, 16, 32]
    A = sum(h * w for h, w in level_hw)
    gt_counts = (3, 2)
    Gmax = 4

    raw = rng.randn(B, A, 5 + C).astype(np.float32) * 0.5
    raw_kpts = rng.randn(B, A, P, 3).astype(np.float32) * 0.5

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

    # decoded outputs the reference way: boxes + the full kpt slice *stride
    decoded_main = raw.copy()
    decoded_main[..., 0:2] = (raw[..., 0:2] + grids) * stride_v[:, None]
    decoded_main[..., 2:4] = np.exp(raw[..., 2:4]) * stride_v[:, None]
    dk = raw_kpts.copy()
    dk[..., 0:2] = dk[..., 0:2] + grids[None, :, None, :]
    dk = dk * stride_v[None, :, None, None]   # conf channel scaled too
    decoded = np.concatenate([decoded_main, dk.reshape(B, A, 3 * P)], -1)

    labels = np.zeros((B, Gmax, 5 + 2 * P), np.float32)
    gt_boxes = np.zeros((B, Gmax, 4), np.float32)
    gt_classes = np.zeros((B, Gmax), np.int32)
    gt_valid = np.zeros((B, Gmax), bool)
    gt_kpts = np.zeros((B, Gmax, P, 3), np.float32)
    for b, g in enumerate(gt_counts):
        cxcy = rng.uniform(12, img - 12, size=(g, 2)).astype(np.float32)
        wh = rng.uniform(8, 30, size=(g, 2)).astype(np.float32)
        labels[b, :g, 0] = 0
        labels[b, :g, 1:3] = cxcy
        labels[b, :g, 3:5] = wh
        gt_boxes[b, :g, 0:2] = cxcy - wh / 2
        gt_boxes[b, :g, 2:4] = cxcy + wh / 2
        gt_valid[b, :g] = True
        kxy = (cxcy[:, None, :]
               + rng.uniform(-0.5, 0.5, size=(g, P, 2)) * wh[:, None, :])
        # a few invisible keypoints: the reference's mask proxy is x == 0
        invis = rng.rand(g, P) < 0.25
        kxy[invis] = 0.0
        labels[b, :g, 5:] = kxy.reshape(g, 2 * P)
        gt_kpts[b, :g, :, 0:2] = kxy
        gt_kpts[b, :g, :, 2] = (~invis).astype(np.float32)

    head = ref_mod.YOLOXHeadKPTS(
        num_classes=C, width=0.25, strides=strides_l,
        in_channels=[64, 128, 256], num_kpts=P)
    head.use_l1 = False
    with torch.no_grad():
        (ref_total, ref_iou, ref_obj, ref_cls, _l1, ref_kpt, ref_kptv,
         _ratio) = head.get_losses(
            None, x_shifts, y_shifts, exp_strides,
            _t(labels), _t(decoded), None, dtype=torch.float32)

    ours = yolox_kpts_losses(
        {
            "outputs": jnp.asarray(raw),
            "kpts": jnp.asarray(raw_kpts),
            "grids": jnp.asarray(grids),
            "strides": jnp.asarray(stride_v),
        },
        {
            "gt_boxes": jnp.asarray(gt_boxes),
            "gt_classes": jnp.asarray(gt_classes),
            "gt_valid": jnp.asarray(gt_valid),
            "gt_keypoints": jnp.asarray(gt_kpts),
        },
        num_classes=C, num_keypoints=P,
    )

    np.testing.assert_allclose(
        float(ours["loss_iou"]), float(ref_iou), rtol=RTOL, atol=ATOL,
        err_msg="kpts loss_iou")
    np.testing.assert_allclose(
        float(ours["loss_obj"]), float(ref_obj), rtol=RTOL, atol=ATOL,
        err_msg="kpts loss_obj")
    np.testing.assert_allclose(
        float(ours["loss_cls"]), float(ref_cls), rtol=RTOL, atol=ATOL,
        err_msg="kpts loss_cls")
    np.testing.assert_allclose(
        float(ours["loss_kpt"]), float(ref_kpt), rtol=RTOL, atol=ATOL,
        err_msg="kpts loss_kpt (x5)")
    np.testing.assert_allclose(
        float(ours["loss_kpt_vis"]), float(ref_kptv), rtol=RTOL, atol=ATOL,
        err_msg="kpts loss_kpt_vis")
    np.testing.assert_allclose(
        float(ours["total_loss"]), float(ref_total), rtol=RTOL, atol=ATOL,
        err_msg="kpts total")

# ---------------------------------------------------------------------------
# YOLOv6 ComputeLoss (v6-SimOTA + IOUlossV6 ciou + always-on l1)
# ---------------------------------------------------------------------------

def test_yolov6_compute_loss_parity(capsys):
    """ComputeLoss (yolov6_head.py:315): raw per-level [B, 1, H, W, 5+C]
    outputs, normalized cxcywh targets scaled in-place by the last level's
    (feat*stride) — the raw-pixel quirk. detached vector = [5*iou, l1,
    obj, cls] (:530)."""
    import torch

    install_stubs()
    ref_mod = ref_module("yolov7.modeling.head.yolov6_head")
    from yolov7_d2_tpu.models.meta_arch.yolov6 import yolov6_losses

    rng = np.random.RandomState(23)
    B, C = 2, 7
    img = 64
    level_hw = [(8, 8), (4, 4), (2, 2)]
    strides_l = [8, 16, 32]
    A = sum(h * w for h, w in level_hw)
    gt_counts = (3, 2)
    Gmax = 4

    raw = rng.randn(B, A, 5 + C).astype(np.float32) * 0.5

    grids, stride_v, ref_levels = [], [], []
    off = 0
    for (h, w), s in zip(level_hw, strides_l):
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        grids.append(np.stack([xs, ys], -1).reshape(-1, 2).astype(np.float32))
        stride_v.append(np.full((h * w,), s, np.float32))
        ref_levels.append(
            _t(raw[:, off:off + h * w].reshape(B, 1, h, w, 5 + C).copy()))
        off += h * w
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
        targets[b, :g, 1:3] = cxcy / img      # normalized, the ref scales back
        targets[b, :g, 3:5] = wh / img
        gt_boxes[b, :g, 0:2] = cxcy - wh / 2
        gt_boxes[b, :g, 2:4] = cxcy + wh / 2
        gt_classes[b, :g] = cls
        gt_valid[b, :g] = True

    cl = ref_mod.ComputeLoss(iou_type="ciou")
    with torch.no_grad():
        ref_total, ref_detached = cl(ref_levels, _t(targets))
    capsys.readouterr()   # the reference prints targets (debug residue)
    ref_iou, ref_l1, ref_obj, ref_cls = [float(v) for v in ref_detached]

    ours = yolov6_losses(
        {"outputs": jnp.asarray(raw), "grids": jnp.asarray(grids),
         "strides": jnp.asarray(stride_v)},
        {"gt_boxes": jnp.asarray(gt_boxes),
         "gt_classes": jnp.asarray(gt_classes),
         "gt_valid": jnp.asarray(gt_valid)},
        num_classes=C,
    )

    np.testing.assert_allclose(
        float(ours["loss_iou"]), ref_iou, rtol=RTOL, atol=ATOL,
        err_msg="v6 loss_iou (x5)")
    np.testing.assert_allclose(
        float(ours["loss_l1"]), ref_l1, rtol=RTOL, atol=ATOL,
        err_msg="v6 loss_l1")
    np.testing.assert_allclose(
        float(ours["loss_obj"]), ref_obj, rtol=RTOL, atol=ATOL,
        err_msg="v6 loss_obj")
    np.testing.assert_allclose(
        float(ours["loss_cls"]), ref_cls, rtol=RTOL, atol=ATOL,
        err_msg="v6 loss_cls")
    np.testing.assert_allclose(
        float(ours["total_loss"]), float(ref_total), rtol=RTOL, atol=ATOL,
        err_msg="v6 total")

# ---------------------------------------------------------------------------
# SOLOv2: GT grid assignment (mass centers) + dice/focal losses
# ---------------------------------------------------------------------------

def test_solov2_loss_parity():
    """get_ground_truth (solov2.py:225, mass centers + sigma center regions
    + the cv2-uint8 mask rescale quirk) -> loss (:342, dice pair-mean *3 +
    focal sum / (num_ins + 1)) against the reference's own torch code."""
    import torch
    import torch.nn as nn

    install_stubs()
    solov2_mod = ref_module("yolov7.modeling.meta_arch.solov2")
    from detectron2.structures import Boxes

    from yolov7_d2_tpu.models.meta_arch.solov2 import solov2_losses

    rng = np.random.RandomState(31)
    gt_counts = (3, 2)
    B, C, E = len(gt_counts), 5, 8
    H = W = 128
    Hm, Wm = 32, 32
    num_grids = (40, 36, 24, 16, 12)
    Gmax = max(gt_counts)

    gt_masks = np.zeros((B, Gmax, H, W), np.float32)
    gt_boxes = np.zeros((B, Gmax, 4), np.float32)
    gt_classes = np.zeros((B, Gmax), np.int32)
    gt_valid = np.zeros((B, Gmax), bool)
    gt_instances = []
    for b, g in enumerate(gt_counts):
        m = _soft_blob_masks(rng, g, H, W)
        cls = rng.randint(0, C, size=(g,))
        boxes = np.zeros((g, 4), np.float32)
        for i in range(g):
            ys, xs = np.nonzero(m[i])
            boxes[i] = (xs.min(), ys.min(), xs.max() + 1, ys.max() + 1)
        gt_masks[b, :g] = m
        gt_boxes[b, :g] = boxes
        gt_classes[b, :g] = cls
        gt_valid[b, :g] = True
        gt_instances.append(SimpleNamespace(
            gt_boxes=Boxes(_t(boxes)),
            gt_classes=_t(cls.astype(np.int64)),
            gt_masks=SimpleNamespace(
                tensor=_t(m.astype(np.uint8))),
        ))

    cate_preds = [rng.randn(B, C, s, s).astype(np.float32)
                  for s in num_grids]
    kernel_preds = [rng.randn(B, E, s, s).astype(np.float32) * 0.2
                    for s in num_grids]
    ins_pred = rng.randn(B, E, Hm, Wm).astype(np.float32)

    ref = object.__new__(solov2_mod.SOLOv2)
    nn.Module.__init__(ref)
    ref.scale_ranges = ((1, 96), (48, 192), (96, 384), (192, 768),
                        (384, 2048))
    ref.strides = [8, 8, 16, 32, 32]
    ref.num_grids = list(num_grids)
    ref.sigma = 0.2
    ref.num_classes = C
    ref.ins_loss_weight = 3.0
    ref.focal_loss_weight = 1.0
    ref.focal_loss_gamma = 2.0
    ref.focal_loss_alpha = 0.25

    with torch.no_grad():
        targets = ref.get_ground_truth(gt_instances, mask_feat_size=(Hm, Wm))
        ref_losses = ref.loss(
            [_t(c) for c in cate_preds],
            [_t(k) for k in kernel_preds],
            _t(ins_pred), targets)

    ours = solov2_losses(
        {
            "mask_feats": jnp.asarray(ins_pred.transpose(0, 2, 3, 1)),
            "cate_preds": [jnp.asarray(c.transpose(0, 2, 3, 1))
                           for c in cate_preds],
            "kernel_preds": [jnp.asarray(k.transpose(0, 2, 3, 1))
                             for k in kernel_preds],
        },
        jnp.asarray(gt_masks), jnp.asarray(gt_boxes),
        jnp.asarray(gt_classes), jnp.asarray(gt_valid),
        input_hw=(H, W), num_classes=C, num_grids=num_grids,
    )

    np.testing.assert_allclose(
        float(ours["loss_mask"]), float(ref_losses["loss_ins"]),
        rtol=RTOL, atol=ATOL, err_msg="solov2 loss_ins (dice x3)")
    np.testing.assert_allclose(
        float(ours["loss_cate"]), float(ref_losses["loss_cate"]),
        rtol=RTOL, atol=ATOL, err_msg="solov2 loss_cate")

# ---------------------------------------------------------------------------
# Per-arch DETR criterion COPIES (SMCA / DAB / AnchorDETR) + HungarianMatcherD2go
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("arch", ["smca", "dab", "anchor"])
def test_detr_per_arch_criterion_copy_parity(arch):
    """The reference carries near-identical SetCriterion copies inside
    smca_detr.py:520 (focal labels, sum/num_boxes, HungarianMatcherSMCA),
    dab_detr.py:535 (softmax CE + eos_coef, base HungarianMatcher) and
    anchor_detr.py:547 (deformable-style focal x num_queries). Our single
    unified criterion must reproduce each copy, driven here with each
    arch's own matcher."""
    import torch

    install_stubs()
    detr_utils = ref_module("yolov7.utils.detr_utils")
    from yolov7_d2_tpu.models.meta_arch.detr import detr_set_criterion

    rng = np.random.RandomState({"smca": 41, "dab": 43, "anchor": 47}[arch])
    B, Q, C = 2, 20, 6
    gt_counts = (3, 2)
    logits, pred, gt_boxes, gt_classes, gt_valid, targets = (
        _random_detr_scene(rng, B, Q, C, gt_counts))

    if arch == "smca":
        mod = ref_module("yolov7.modeling.meta_arch.smca_detr")
        # smca_detr.py:125 builds its matcher with cost_class=1; the
        # loss_ce weight of 2 lives in weight_dict, outside the criterion
        matcher = detr_utils.HungarianMatcherSMCA(
            cost_class=1, cost_bbox=5, cost_giou=2)
        criterion = mod.SetCriterion(
            num_classes=C, matcher=matcher, weight_dict={}, eos_coef=0.1,
            losses=["labels", "boxes"])
        ref_logits, use_focal = logits[..., :C], True
    elif arch == "anchor":
        mod = ref_module("yolov7.modeling.meta_arch.anchor_detr")
        matcher = detr_utils.HungarianMatcherAnchorDETR(
            cost_class=2, cost_bbox=5, cost_giou=2)
        criterion = mod.SetCriterion(
            num_classes=C, matcher=matcher, weight_dict={},
            losses=["labels", "boxes"], focal_alpha=0.25)
        ref_logits, use_focal = logits[..., :C], True
    else:
        mod = ref_module("yolov7.modeling.meta_arch.dab_detr")
        matcher = detr_utils.HungarianMatcher(
            cost_class=1, cost_bbox=5, cost_giou=2)
        criterion = mod.SetCriterion(
            num_classes=C, matcher=matcher, weight_dict={}, eos_coef=0.1,
            losses=["labels", "boxes"])
        ref_logits, use_focal = logits, False

    with torch.no_grad():
        ref_losses = criterion(
            {"pred_logits": _t(ref_logits), "pred_boxes": _t(pred)},
            targets)

    # HungarianMatcherSMCA's focal cost formula is identical to
    # HungarianMatcherAnchorDETR's, so our single focal path covers both
    ours = detr_set_criterion(
        jnp.asarray(logits), jnp.asarray(pred),
        jnp.asarray(gt_boxes), jnp.asarray(gt_classes),
        jnp.asarray(gt_valid),
        num_classes=C, eos_coef=0.1, use_focal=use_focal,
    )

    np.testing.assert_allclose(
        float(ours["loss_ce"]), float(ref_losses["loss_ce"]),
        rtol=RTOL, atol=ATOL, err_msg=f"{arch} copy loss_ce")
    np.testing.assert_allclose(
        float(ours["loss_bbox"]), 5.0 * float(ref_losses["loss_bbox"]),
        rtol=RTOL, atol=ATOL, err_msg=f"{arch} copy loss_bbox")
    np.testing.assert_allclose(
        float(ours["loss_giou"]), 2.0 * float(ref_losses["loss_giou"]),
        rtol=RTOL, atol=ATOL, err_msg=f"{arch} copy loss_giou")


def test_hungarian_matcher_d2go_both_modes():
    """HungarianMatcherD2go (detr_utils.py:265) is the base matcher with a
    use_focal_loss switch — its indices must equal HungarianMatcher
    (softmax mode) and HungarianMatcherAnchorDETR (focal mode), both of
    which our unified criterion is proven against."""
    import torch

    install_stubs()
    detr_utils = ref_module("yolov7.utils.detr_utils")

    rng = np.random.RandomState(53)
    B, Q, C = 2, 18, 6
    gt_counts = (4, 2)
    logits, pred, _, _, _, targets = _random_detr_scene(
        rng, B, Q, C, gt_counts)

    base = detr_utils.HungarianMatcher(cost_class=1, cost_bbox=5,
                                       cost_giou=2)
    focal = detr_utils.HungarianMatcherAnchorDETR(cost_class=1, cost_bbox=5,
                                                  cost_giou=2)
    with torch.no_grad():
        for use_focal, twin in ((False, base), (True, focal)):
            d2go = detr_utils.HungarianMatcherD2go(
                cost_class=1, cost_bbox=5, cost_giou=2,
                use_focal_loss=use_focal)
            lg = logits[..., :C] if use_focal else logits
            out = {"pred_logits": _t(lg), "pred_boxes": _t(pred)}
            got = d2go(out, targets)
            want = twin(out, targets)
            for (gi, gj), (wi, wj) in zip(got, want):
                np.testing.assert_array_equal(gi.numpy(), wi.numpy())
                np.testing.assert_array_equal(gj.numpy(), wj.numpy())

# ---------------------------------------------------------------------------
# YOLOMask OrienMaskYOLOLoss (detection + orientation-field terms)
# ---------------------------------------------------------------------------

def test_yolomask_orien_loss_parity():
    """OrienMaskYOLOLoss (yolomask.py:431-851) per scale, summed the way
    the meta-arch sums it (:263-271): offset-space ciou box term, split
    pos/neg objectness, class BCE, and the smooth-l1 orientation terms
    with their count/overwrite target semantics. The alfred ``ciou`` is
    unavailable (package not installed) — the stub transcribes the
    standard CIoU formula on both sides, so loss_box is formula-pinned
    while the other five terms are true differentials."""
    import torch

    install_stubs()
    ym = ref_module("yolov7.modeling.meta_arch.yolomask")
    from yolov7_d2_tpu.models.meta_arch.yolomask import yolomask_losses

    rng = np.random.RandomState(61)
    gt_counts = (3, 2)
    B, C, NA = len(gt_counts), 5, 3
    IMG = 128
    level_hw = [(16, 16), (8, 8), (4, 4)]       # strides 8, 16, 32
    anchors = np.array(
        [[[10, 13], [16, 30], [33, 23]],
         [[30, 61], [62, 45], [59, 119]],
         [[116, 90], [90, 60], [100, 110]]], np.float32)
    Gmax = max(gt_counts)
    Hq = Wq = IMG // 4

    # raw head maps per level [B, na, h, w, 5+C]; orien [B,Hq,Wq,L,na,2]
    raw_lvl = [rng.randn(B, NA, h, w, 5 + C).astype(np.float32) * 0.5
               for h, w in level_hw]
    orien = (rng.randn(B, Hq, Wq, 3, NA, 2) * 2.0).astype(np.float32)

    gt_masks = np.zeros((B, Gmax, IMG, IMG), np.float32)
    gt_boxes = np.zeros((B, Gmax, 4), np.float32)   # xyxy px
    gt_classes = np.zeros((B, Gmax), np.int32)
    gt_valid = np.zeros((B, Gmax), bool)
    gt_instances = []
    for b, g in enumerate(gt_counts):
        m = _soft_blob_masks(rng, g, IMG, IMG)
        cls = rng.randint(0, C, size=(g,))
        boxes = np.zeros((g, 4), np.float32)
        for i in range(g):
            ys, xs = np.nonzero(m[i])
            boxes[i] = (xs.min(), ys.min(), xs.max() + 1, ys.max() + 1)
        gt_masks[b, :g] = m
        gt_boxes[b, :g] = boxes
        gt_classes[b, :g] = cls
        gt_valid[b, :g] = True
        # the reference converts gt to CENTER-xywh before the loss
        # (yolomask.py:210-212, BoxModeMy.XYWH_ABS is (cx, cy, w, h))
        cxcywh = np.concatenate(
            [(boxes[:, 0:2] + boxes[:, 2:4]) / 2,
             boxes[:, 2:4] - boxes[:, 0:2]], -1)
        gt_instances.append(SimpleNamespace(
            gt_boxes=SimpleNamespace(tensor=_t(cxcywh)),
            gt_classes=_t(cls.astype(np.int64)),
            gt_masks=SimpleNamespace(tensor=_t(m.astype(np.uint8))),
        ))

    # reference: one loss evaluator per scale, same anchor grouping as ours
    ref_totals = {}
    with torch.no_grad():
        for lvl, (h, w) in enumerate(level_hw):
            ev = ym.OrienMaskYOLOLoss(
                grid_size=(h, w), image_size=None,
                anchors=anchors.reshape(-1, 2).tolist(),
                anchor_mask=[lvl * NA + k for k in range(NA)],
                num_classes=C, center_region=0.6, valid_region=0.6,
                label_smooth=False, obj_ignore_threshold=0.5)
            pred_bbox = _t(np.ascontiguousarray(
                raw_lvl[lvl].transpose(0, 1, 4, 2, 3).reshape(
                    B, NA * (5 + C), h, w)))
            pred_orien = _t(np.ascontiguousarray(
                orien[:, :, :, lvl].transpose(0, 3, 4, 1, 2).reshape(
                    B, NA * 2, Hq, Wq)))
            out = ev((pred_bbox, pred_orien), gt_instances, (IMG, IMG))
            for k, v in out.items():
                ref_totals[k] = ref_totals.get(k, 0.0) + float(v)

    # ours: flat packing (cell-major, anchor-fastest per level)
    flat_out = np.concatenate([
        r.transpose(0, 2, 3, 1, 4).reshape(B, -1, 5 + C) for r in raw_lvl
    ], axis=1)
    ours = yolomask_losses(
        {"outputs": jnp.asarray(flat_out), "level_hw": tuple(level_hw),
         "orien": jnp.asarray(orien)},
        {"gt_boxes": jnp.asarray(gt_boxes),
         "gt_classes": jnp.asarray(gt_classes),
         "gt_valid": jnp.asarray(gt_valid),
         "gt_masks": jnp.asarray(gt_masks)},
        num_classes=C, anchors=anchors, image_hw=(IMG, IMG),
    )

    for key in ("loss_obj_pos", "loss_obj_neg", "loss_cls",
                "loss_orien_pos", "loss_orien_neg", "loss_box"):
        np.testing.assert_allclose(
            float(ours[key]), ref_totals[key], rtol=2e-3, atol=1e-4,
            err_msg=f"yolomask {key}")
