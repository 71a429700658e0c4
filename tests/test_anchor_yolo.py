import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov7_d2_tpu.models.backbones.darknet import Darknet53
from yolov7_d2_tpu.models.heads.anchor_yolo_head import (
    build_targets_max_iou,
    build_targets_ratio,
    decode_anchor_outputs,
    flatten_anchor_outputs,
)
from yolov7_d2_tpu.models.meta_arch.yolov7 import (
    AnchorYOLO,
    anchor_yolo_loss_fn,
    anchor_yolo_postprocess,
)

ANCHORS = np.array(
    [
        [[10, 13], [16, 30], [33, 23]],
        [[30, 61], [62, 45], [42, 119]],
        [[116, 90], [156, 198], [373, 326]],
    ],
    np.float32,
)
LEVEL_HW = [(8, 8), (4, 4), (2, 2)]
STRIDES = [8, 16, 32]


def test_darknet53_shapes():
    bb = Darknet53()
    x = jnp.zeros((1, 64, 64, 3))
    v = bb.init(jax.random.PRNGKey(0), x)
    feats = bb.apply(v, x)
    assert feats["dark3"].shape == (1, 8, 8, 256)
    assert feats["dark4"].shape == (1, 4, 4, 512)
    assert feats["dark5"].shape == (1, 2, 2, 1024)


def test_flatten_anchor_outputs_layout():
    outs = [
        jnp.zeros((1, 8, 8, 3 * 85)),
        jnp.zeros((1, 4, 4, 3 * 85)),
        jnp.zeros((1, 2, 2, 3 * 85)),
    ]
    flat = flatten_anchor_outputs(outs, ANCHORS, STRIDES)
    A = (64 + 16 + 4) * 3
    assert flat["outputs"].shape == (1, A, 85)
    assert flat["grids"].shape == (A, 2)
    # anchor 0 of cell 0 at level 0 has anchor wh (10, 13)
    np.testing.assert_allclose(np.asarray(flat["anchors"][0]), [10, 13])
    # last anchors belong to stride 32
    assert float(flat["strides"][-1]) == 32.0


def test_decode_variants():
    outs = [
        jnp.zeros((1, 8, 8, 3 * 85)),
        jnp.zeros((1, 4, 4, 3 * 85)),
        jnp.zeros((1, 2, 2, 3 * 85)),
    ]
    flat = flatten_anchor_outputs(outs, ANCHORS, STRIDES)
    # v3: zero logits -> xy = (0.5 + grid)*stride, wh = anchor
    b3, _, _ = decode_anchor_outputs(flat, "yolov3")
    np.testing.assert_allclose(np.asarray(b3[0, 0]), [4, 4, 10, 13], atol=1e-5)
    # v7: zero logits -> xy = (0.5 + grid)*stride, wh = anchor (2*0.5)^2=1
    b7, _, _ = decode_anchor_outputs(flat, "yolov7")
    np.testing.assert_allclose(np.asarray(b7[0, 0]), [4, 4, 10, 13], atol=1e-5)


def test_build_targets_max_iou_assigns_best_shape():
    G = 4
    gt_boxes = jnp.zeros((G, 4)).at[0].set(
        jnp.array([20.0, 20.0, 52.0, 44.0])  # wh (32, 24) ≈ anchor (33, 23)
    )
    gt_classes = jnp.zeros((G,), jnp.int32)
    gt_valid = jnp.zeros((G,), bool).at[0].set(True)
    t = build_targets_max_iou(
        gt_boxes, gt_classes, gt_valid, ANCHORS, LEVEL_HW, STRIDES
    )
    fg = np.asarray(t["fg_mask"])
    assert fg.sum() == 1
    idx = int(np.argmax(fg))
    # center (36, 32) -> cell (4, 4) on stride 8, anchor 2 of level 0
    assert idx == ((4 * 8 + 4) * 3 + 2)
    assert int(t["matched_gt"][idx]) == 0


def test_build_targets_ratio_multiple_positives():
    G = 4
    gt_boxes = jnp.zeros((G, 4)).at[0].set(
        jnp.array([20.0, 20.0, 52.0, 44.0])
    )
    gt_classes = jnp.zeros((G,), jnp.int32)
    gt_valid = jnp.zeros((G,), bool).at[0].set(True)
    t = build_targets_ratio(
        gt_boxes, gt_classes, gt_valid, ANCHORS, LEVEL_HW, STRIDES
    )
    fg = np.asarray(t["fg_mask"])
    # ratio matching with neighbor cells yields more positives than max-IoU
    assert fg.sum() >= 3
    assert np.all(np.asarray(t["matched_gt"])[fg] == 0)


def test_no_valid_gt_no_positives():
    G = 4
    t = build_targets_ratio(
        jnp.zeros((G, 4)), jnp.zeros((G,), jnp.int32), jnp.zeros((G,), bool),
        ANCHORS, LEVEL_HW, STRIDES,
    )
    assert np.asarray(t["fg_mask"]).sum() == 0


@pytest.mark.parametrize("btype", ["default", "yolov5"])
def test_anchor_yolo_train_loss_and_grads(btype):
    model = AnchorYOLO(num_classes=4, backbone_type="darknet53")
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3)) * 255
    variables = model.init(jax.random.PRNGKey(0), imgs, train=False)
    batch = {
        "gt_boxes": jnp.tile(
            jnp.array([[[8.0, 8.0, 40.0, 40.0]]]), (1, 4, 1)
        ),
        "gt_classes": jnp.ones((1, 4), jnp.int32),
        "gt_valid": jnp.zeros((1, 4), bool).at[:, 0].set(True),
    }

    def loss(params):
        flat, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            imgs, train=True, mutable=["batch_stats"],
        )
        out = anchor_yolo_loss_fn(
            flat, batch, np.asarray(model.anchors, np.float32), 4,
            build_target_type=btype,
        )
        return out["total_loss"], out

    (total, aux), grads = jax.value_and_grad(loss, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(total))
    assert float(aux["num_fg"]) >= 1
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)


def test_anchor_yolo_postprocess_contract():
    model = AnchorYOLO(num_classes=4, backbone_type="darknet53")
    imgs = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), imgs, train=False)
    flat = model.apply(variables, imgs, train=False)
    dets = anchor_yolo_postprocess(
        flat, conf_threshold=0.0, max_detections=10, pre_nms_topk=64
    )
    assert dets.boxes.shape == (2, 10, 4)
    assert dets.valid.shape == (2, 10)


def test_v4_loss_branch():
    """v4 decomposed xy/wh loss: finite, differentiable, and zero box loss
    for a perfect raw prediction."""
    from yolov7_d2_tpu.models.heads.anchor_yolo_head import anchor_yolo_losses

    model = AnchorYOLO(num_classes=4, backbone_type="darknet53")
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3)) * 255
    variables = model.init(jax.random.PRNGKey(0), imgs, train=False)
    batch_gt = {
        "gt_boxes": jnp.tile(jnp.array([[[8.0, 8.0, 40.0, 40.0]]]), (1, 4, 1)),
        "gt_classes": jnp.ones((1, 4), jnp.int32),
        "gt_valid": jnp.zeros((1, 4), bool).at[:, 0].set(True),
    }

    def loss(params):
        flat, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            imgs, train=True, mutable=["batch_stats"],
        )
        out = anchor_yolo_losses(
            flat, batch_gt["gt_boxes"], batch_gt["gt_classes"],
            batch_gt["gt_valid"],
            anchors=np.asarray(model.anchors, np.float32),
            level_hw=flat["level_hw"], level_strides=(8, 16, 32),
            num_classes=4, loss_type="v4",
        )
        return out["total_loss"], out

    (total, aux), grads = jax.value_and_grad(loss, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(total))
    assert float(aux["num_fg"]) >= 1
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)


def test_max_iou_targets_match_oracle():
    """Differential: vectorized v3 max-IoU target builder vs a literal
    NumPy loop (reference yolo.py get_target:403 semantics)."""
    rng = np.random.default_rng(11)
    G = 6
    gt_boxes = np.zeros((G, 4), np.float32)
    gt_valid = np.zeros(G, bool)
    for g in range(4):
        x, y = rng.uniform(0, 40, 2)
        w, h = rng.uniform(8, 120, 2)
        gt_boxes[g] = [x, y, min(x + w, 64), min(y + h, 64)]
        gt_valid[g] = True
    gt_classes = rng.integers(0, 3, G).astype(np.int32)

    t = build_targets_max_iou(
        jnp.asarray(gt_boxes), jnp.asarray(gt_classes), jnp.asarray(gt_valid),
        ANCHORS, LEVEL_HW, STRIDES,
    )

    # oracle
    offsets, A = [], 0
    for h, w in LEVEL_HW:
        offsets.append(A)
        A += h * w * 3
    fg_o = np.zeros(A, bool)
    matched_o = np.zeros(A, np.int64)
    flat_anchors = ANCHORS.reshape(-1, 2)
    for g in range(G):
        if not gt_valid[g]:
            continue
        gw = gt_boxes[g, 2] - gt_boxes[g, 0]
        gh = gt_boxes[g, 3] - gt_boxes[g, 1]
        best, best_iou = -1, -1.0
        for ai, (aw, ah) in enumerate(flat_anchors):
            inter = min(gw, aw) * min(gh, ah)
            union = gw * gh + aw * ah - inter
            v = inter / (union + 1e-9)
            if v > best_iou:
                best_iou, best = v, ai
        lvl, k = best // 3, best % 3
        stride = STRIDES[lvl]
        h_l, w_l = LEVEL_HW[lvl]
        cx = int(np.clip((gt_boxes[g, 0] + gt_boxes[g, 2]) / 2 / stride, 0,
                         w_l - 1))
        cy = int(np.clip((gt_boxes[g, 1] + gt_boxes[g, 3]) / 2 / stride, 0,
                         h_l - 1))
        idx = offsets[lvl] + (cy * w_l + cx) * 3 + k
        fg_o[idx] = True
        matched_o[idx] = g

    fg_v = np.asarray(t["fg_mask"])
    np.testing.assert_array_equal(fg_v, fg_o)
    np.testing.assert_array_equal(
        np.asarray(t["matched_gt"])[fg_v], matched_o[fg_o]
    )
