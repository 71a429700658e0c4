import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov7_d2_tpu.models.backbones.darknetx import CSPDarknetX
from yolov7_d2_tpu.models.heads.yolox_head import (
    YOLOXHead,
    decode_outputs,
    simota_assign,
)
from yolov7_d2_tpu.models.meta_arch.yolox import (
    YOLOX,
    yolox_loss_fn,
    yolox_postprocess,
)
from yolov7_d2_tpu.models.necks.yolo_pafpn import YOLOPAFPN, upsample2x_nearest


SIZE = 64  # tiny static input for tests


def _tiny_model():
    return YOLOX(num_classes=4, depth_mul=0.33, width_mul=0.25)


def _init(model, bs=1):
    imgs = jnp.zeros((bs, SIZE, SIZE, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs, train=False)
    return variables, imgs


def test_backbone_feature_pyramid_shapes():
    bb = CSPDarknetX(dep_mul=0.33, wid_mul=0.25)
    x = jnp.zeros((1, SIZE, SIZE, 3))
    vars_ = bb.init(jax.random.PRNGKey(0), x)
    feats = bb.apply(vars_, x)
    assert set(feats) == {"dark3", "dark4", "dark5"}
    assert feats["dark3"].shape == (1, SIZE // 8, SIZE // 8, 64)
    assert feats["dark4"].shape == (1, SIZE // 16, SIZE // 16, 128)
    assert feats["dark5"].shape == (1, SIZE // 32, SIZE // 32, 256)


def test_upsample2x_nearest():
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    y = upsample2x_nearest(x)
    assert y.shape == (1, 4, 4, 1)
    np.testing.assert_allclose(np.asarray(y[0, :2, :2, 0]), [[0, 0], [0, 0]])
    np.testing.assert_allclose(np.asarray(y[0, 2:, 2:, 0]), [[3, 3], [3, 3]])
    np.testing.assert_allclose(np.asarray(y[0, 0, 2:, 0]), [1, 1])


def test_pafpn_output_strides_and_channels():
    w, d = 0.25, 0.33
    neck = YOLOPAFPN(depth=d, width=w)
    feats = [
        jnp.zeros((1, 8, 8, 64)),
        jnp.zeros((1, 4, 4, 128)),
        jnp.zeros((1, 2, 2, 256)),
    ]
    vars_ = neck.init(jax.random.PRNGKey(0), feats)
    outs = neck.apply(vars_, feats)
    assert outs[0].shape == (1, 8, 8, 64)
    assert outs[1].shape == (1, 4, 4, 128)
    assert outs[2].shape == (1, 2, 2, 256)


def test_head_anchor_count_and_decode():
    head = YOLOXHead(num_classes=4, width=0.25)
    feats = [
        jnp.zeros((1, 8, 8, 64)),
        jnp.zeros((1, 4, 4, 128)),
        jnp.zeros((1, 2, 2, 256)),
    ]
    vars_ = head.init(jax.random.PRNGKey(0), feats)
    out = head.apply(vars_, feats)
    A = 8 * 8 + 4 * 4 + 2 * 2
    assert out["outputs"].shape == (1, A, 5 + 4)
    assert out["grids"].shape == (A, 2)
    assert out["strides"].shape == (A,)
    # first anchor of each level decodes at its stride
    boxes, obj, cls = decode_outputs(out["outputs"], out["grids"], out["strides"])
    assert boxes.shape == (1, A, 4)
    # zero raw output at grid cell (1,0) of stride 8 -> center (8, 0), wh (8, 8)
    raw = jnp.zeros_like(out["outputs"])
    b, _, _ = decode_outputs(raw, out["grids"], out["strides"])
    np.testing.assert_allclose(np.asarray(b[0, 1]), [8.0, 0.0, 8.0, 8.0])


def _grid_setup():
    # a 4x4 stride-8 grid (A=16) with simple geometry
    ys, xs = np.meshgrid(np.arange(4), np.arange(4), indexing="ij")
    grids = jnp.array(
        np.stack([xs, ys], -1).reshape(-1, 2), jnp.float32
    )
    strides = jnp.full((16,), 8.0)
    return grids, strides


def test_simota_assigns_anchor_inside_gt():
    grids, strides = _grid_setup()
    A, C, G = 16, 3, 5
    # predictions: every anchor predicts its own cell box exactly
    centers = (grids + 0.5) * 8.0
    pred = jnp.concatenate([centers, jnp.full((A, 2), 8.0)], axis=-1)
    obj = jnp.full((A,), 3.0)
    cls = jnp.full((A, C), -3.0)
    cls = cls.at[:, 1].set(3.0)
    gt_boxes = jnp.zeros((G, 4)).at[0].set(jnp.array([0.0, 0.0, 8.0, 8.0]))
    gt_classes = jnp.zeros((G,), jnp.int32).at[0].set(1)
    gt_valid = jnp.zeros((G,), bool).at[0].set(True)

    out = simota_assign(pred, obj, cls, grids, strides, gt_boxes, gt_classes, gt_valid)
    fg = np.asarray(out["fg_mask"])
    assert fg[0]  # anchor 0 sits exactly on the gt
    assert out["num_fg"] >= 1
    assert np.asarray(out["matched_gt"])[0] == 0
    assert float(out["matched_iou"][0]) > 0.9


def test_simota_no_gt_no_fg():
    grids, strides = _grid_setup()
    A, C, G = 16, 3, 5
    pred = jnp.concatenate(
        [(grids + 0.5) * 8.0, jnp.full((A, 2), 8.0)], axis=-1
    )
    out = simota_assign(
        pred, jnp.zeros((A,)), jnp.zeros((A, C)),
        grids, strides,
        jnp.zeros((G, 4)), jnp.zeros((G,), jnp.int32), jnp.zeros((G,), bool),
    )
    assert float(out["num_fg"]) == 0.0


def test_loss_finite_and_differentiable():
    model = _tiny_model()
    variables, _ = _init(model, bs=2)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, SIZE, SIZE, 3)) * 255
    batch = {
        "image": imgs,
        "gt_boxes": jnp.tile(
            jnp.array([[[8.0, 8.0, 40.0, 40.0]]]), (2, 8, 1)
        ),
        "gt_classes": jnp.ones((2, 8), jnp.int32),
        "gt_valid": jnp.zeros((2, 8), bool).at[:, 0].set(True),
    }

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch["image"], train=True, mutable=["batch_stats"],
        )
        losses = yolox_loss_fn(out, batch, num_classes=4, use_l1=True)
        return losses["total_loss"], losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(total))
    for k in ["loss_iou", "loss_obj", "loss_cls", "loss_l1"]:
        assert np.isfinite(float(losses[k])), k
    # gradients flow and are finite
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    gnorm = sum(float(jnp.sum(g * g)) for g in leaves) ** 0.5
    assert gnorm > 0


def test_eval_postprocess_contract():
    model = _tiny_model()
    variables, imgs = _init(model, bs=2)
    out = model.apply(variables, imgs, train=False)
    dets = yolox_postprocess(
        out, conf_threshold=0.0, max_detections=10, pre_nms_topk=32
    )
    assert dets.boxes.shape == (2, 10, 4)
    assert dets.scores.shape == (2, 10)
    assert dets.classes.shape == (2, 10)
    assert dets.valid.shape == (2, 10)


def test_postprocess_restructure_matches_reference_formulation():
    """The round-4 TPU restructuring of yolox_postprocess (max-then-sigmoid,
    decode-after-gather, index-sorted gathers) must reproduce the reference
    formulation (decode-all -> sigmoid-all -> score-ordered top-k) exactly.
    The oracle below is the literal pre-restructure implementation."""
    from yolov7_d2_tpu.ops.nms import batched_nms_batched
    from yolov7_d2_tpu.structures.boxes import cxcywh_to_xyxy

    def oracle(head_out, conf_threshold, nms_threshold, max_detections,
               pre_nms_topk):
        boxes_cxcywh, obj_logits, cls_logits = decode_outputs(
            head_out["outputs"], head_out["grids"], head_out["strides"]
        )
        boxes = cxcywh_to_xyxy(boxes_cxcywh)
        obj = jax.nn.sigmoid(obj_logits)
        cls_prob = jax.nn.sigmoid(cls_logits)
        best_cls = jnp.argmax(cls_prob, axis=-1)
        best_prob = jnp.max(cls_prob, axis=-1)
        scores = jnp.where(
            obj * best_prob >= conf_threshold, obj * best_prob, 0.0
        )
        pre_nms_topk = min(pre_nms_topk, scores.shape[-1])
        top_scores, top_idx = jax.lax.top_k(scores, pre_nms_topk)
        top_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
        top_cls = jnp.take_along_axis(best_cls, top_idx, axis=1)
        keep_idx, keep_valid = batched_nms_batched(
            top_boxes, top_scores, top_cls, nms_threshold, max_detections
        )
        sel = jnp.clip(keep_idx, 0)
        return (
            jnp.take_along_axis(top_boxes, sel[..., None], axis=1),
            jnp.where(
                keep_valid, jnp.take_along_axis(top_scores, sel, axis=1), 0.0
            ),
            jnp.take_along_axis(top_cls, sel, axis=1).astype(jnp.int32),
            keep_valid,
        )

    model = _tiny_model()
    variables, _ = _init(model, bs=2)
    imgs = jax.random.uniform(
        jax.random.PRNGKey(3), (2, SIZE, SIZE, 3), minval=0.0, maxval=255.0
    )
    out = model.apply(variables, imgs, train=False)
    kw = dict(conf_threshold=0.0, nms_threshold=0.5, max_detections=16,
              pre_nms_topk=24)
    dets = yolox_postprocess(out, **kw)
    ob, os_, oc, ov = oracle(out, **kw)
    np.testing.assert_array_equal(np.asarray(dets.valid), np.asarray(ov))
    np.testing.assert_allclose(
        np.asarray(dets.scores), np.asarray(os_), rtol=0, atol=1e-6
    )
    valid = np.asarray(dets.valid)
    np.testing.assert_array_equal(
        np.asarray(dets.classes)[valid], np.asarray(oc)[valid]
    )
    np.testing.assert_allclose(
        np.asarray(dets.boxes)[valid], np.asarray(ob)[valid],
        rtol=1e-6, atol=1e-4,
    )


def test_model_jit_compiles():
    model = _tiny_model()
    variables, imgs = _init(model)
    fn = jax.jit(lambda v, x: model.apply(v, x, train=False))
    out = fn(variables, imgs)
    assert np.all(np.isfinite(np.asarray(out["outputs"])))


def test_simota_prefilter_matches_full():
    """prefilter_topk result == full computation when K covers candidates.

    Uses an 8x8 grid so the two small GTs' geometric prior covers < K
    anchors (asserted below) — on a grid where every anchor is a
    candidate the premise would be vacuous and truncation real."""
    ys, xs = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    grids = jnp.array(np.stack([xs, ys], -1).reshape(-1, 2), jnp.float32)
    A, C, G = 64, 3, 5
    strides = jnp.full((A,), 8.0)
    rng = jax.random.PRNGKey(0)
    pred = jnp.concatenate(
        [(grids + 0.5) * 8.0 + jax.random.normal(rng, (A, 2)),
         jnp.full((A, 2), 8.0) + jax.random.uniform(rng, (A, 2)) * 4],
        axis=-1,
    )
    obj = jax.random.normal(jax.random.PRNGKey(1), (A,))
    cls = jax.random.normal(jax.random.PRNGKey(2), (A, C))
    gt_boxes = jnp.zeros((G, 4)).at[0].set(
        jnp.array([0.0, 0.0, 8.0, 8.0])
    ).at[1].set(jnp.array([12.0, 12.0, 30.0, 30.0]))
    gt_classes = jnp.zeros((G,), jnp.int32).at[1].set(2)
    gt_valid = jnp.zeros((G,), bool).at[0].set(True).at[1].set(True)

    from yolov7_d2_tpu.models.heads.yolox_head import _geometry_prior

    in_box, in_center = _geometry_prior(grids, strides, gt_boxes)
    n_cand = int(jnp.any((in_box | in_center) & gt_valid[:, None], 0).sum())
    K = 40
    assert n_cand <= K < A, (n_cand, K, A)  # premise: K covers candidates

    full = simota_assign(pred, obj, cls, grids, strides,
                         gt_boxes, gt_classes, gt_valid)
    pre = simota_assign(pred, obj, cls, grids, strides,
                        gt_boxes, gt_classes, gt_valid, prefilter_topk=K)
    np.testing.assert_array_equal(
        np.asarray(full["fg_mask"]), np.asarray(pre["fg_mask"])
    )
    fg = np.asarray(full["fg_mask"])
    np.testing.assert_array_equal(
        np.asarray(full["matched_gt"])[fg], np.asarray(pre["matched_gt"])[fg]
    )
    np.testing.assert_allclose(
        np.asarray(full["matched_iou"]), np.asarray(pre["matched_iou"]),
        rtol=1e-6,
    )
    assert float(full["num_fg"]) == float(pre["num_fg"])


def test_yolox_losses_prefilter_matches_full():
    """Batch-level prefilter losses == full-anchor losses (and their grads)
    when K covers all candidates."""
    from yolov7_d2_tpu.models.heads.yolox_head import yolox_losses

    # 12x12 grid @ stride 8 (96px input): the 2.5-stride center radius
    # yields ~5x5 candidates per gt, well under K=64.
    n = 12
    yy, xx = jnp.meshgrid(jnp.arange(n), jnp.arange(n), indexing="ij")
    grids = jnp.stack([xx, yy], axis=-1).reshape(-1, 2).astype(jnp.float32)
    strides = jnp.full((n * n,), 8.0)
    A, C, G, B = n * n, 3, 4, 2
    rng = jax.random.PRNGKey(3)
    outputs = jax.random.normal(rng, (B, A, 5 + C)) * 0.5
    head_out = {"outputs": outputs, "grids": grids, "strides": strides}
    gt_boxes = jnp.tile(
        jnp.array([[0.0, 0.0, 10.0, 10.0], [6.0, 6.0, 30.0, 30.0],
                   [0.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 0.0]])[None],
        (B, 1, 1),
    )
    gt_classes = jnp.zeros((B, G), jnp.int32).at[:, 1].set(2)
    gt_valid = jnp.zeros((B, G), bool).at[:, 0].set(True).at[:, 1].set(True)

    def run(k):
        def f(out):
            losses = yolox_losses(
                {"outputs": out, "grids": grids, "strides": strides},
                gt_boxes, gt_classes, gt_valid, C,
                use_l1=True, prefilter_topk=k,
            )
            return losses["total_loss"], losses
        (total, losses), grad = jax.value_and_grad(f, has_aux=True)(outputs)
        return losses, grad

    full, g_full = run(None)
    pre, g_pre = run(64)
    for key in ("loss_iou", "loss_obj", "loss_cls", "loss_l1", "num_fg"):
        np.testing.assert_allclose(
            float(full[key]), float(pre[key]), rtol=1e-5, err_msg=key
        )
    np.testing.assert_allclose(
        np.asarray(g_full), np.asarray(g_pre), rtol=1e-4, atol=1e-6
    )


def _whole_image_setup(n=20, img=160.0):
    """Anchors on an n x n stride-8 grid; ONE GT spanning the full image,
    so in_box covers every anchor and any prefilter K < A truncates the
    candidate set (the ADVICE large-object case)."""
    ys, xs = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    grids = jnp.array(np.stack([xs, ys], -1).reshape(-1, 2), jnp.float32)
    A = n * n
    strides = jnp.full((A,), 8.0)
    centers = (np.asarray(grids) + 0.5) * 8.0
    # box size monotone-decreasing in distance from the GT center, so IoU
    # rank == centerness rank: the top-K-by-IoU kept set then contains
    # every center-prior ("both") anchor the full pipeline can select,
    # which is the exactness condition the first test exercises. A tiny
    # per-anchor jitter breaks the 4-fold symmetry ties.
    d = np.linalg.norm(centers - img / 2.0, axis=-1)
    side = np.clip(img - d, 24.0, img) + 0.01 * np.arange(A)
    wh = np.stack([side, side], -1).astype(np.float32)
    pred = jnp.asarray(np.concatenate([centers, wh], -1))  # cxcywh
    # IoU of each pred with the whole-image GT, for ranking
    x1 = np.clip(centers[:, 0] - wh[:, 0] / 2, 0, img)
    x2 = np.clip(centers[:, 0] + wh[:, 0] / 2, 0, img)
    y1 = np.clip(centers[:, 1] - wh[:, 1] / 2, 0, img)
    y2 = np.clip(centers[:, 1] + wh[:, 1] / 2, 0, img)
    inter = (x2 - x1) * (y2 - y1)
    union = img * img + wh[:, 0] * wh[:, 1] - inter
    iou = inter / union
    gt_boxes = jnp.zeros((3, 4)).at[0].set(jnp.array([0.0, 0.0, img, img]))
    gt_classes = jnp.zeros((3,), jnp.int32)
    gt_valid = jnp.zeros((3,), bool).at[0].set(True)
    return pred, grids, strides, iou, gt_boxes, gt_classes, gt_valid


def test_prefilter_whole_image_gt_exact_when_obj_tracks_iou():
    """Image-spanning GT with candidates >> K: when objectness ranks like
    IoU (the trained regime) and cls logits are flat, the kept top-K
    contain every anchor the full pipeline could select, so the
    truncated assignment is exact."""
    pred, grids, strides, iou, gtb, gtc, gtv = _whole_image_setup()
    A = grids.shape[0]
    obj = jnp.asarray(10.0 * iou)          # obj rank == IoU rank
    cls = jnp.zeros((A, 3))                # flat: cost rank == iou rank
    full = simota_assign(pred, obj, cls, grids, strides, gtb, gtc, gtv)
    pre = simota_assign(pred, obj, cls, grids, strides, gtb, gtc, gtv,
                        prefilter_topk=64)
    assert 64 < A
    np.testing.assert_array_equal(np.asarray(full["fg_mask"]),
                                  np.asarray(pre["fg_mask"]))
    fg = np.asarray(full["fg_mask"])
    assert fg.sum() >= 1
    np.testing.assert_array_equal(np.asarray(full["matched_gt"])[fg],
                                  np.asarray(pre["matched_gt"])[fg])
    np.testing.assert_allclose(float(full["num_fg"]), float(pre["num_fg"]))


def test_prefilter_whole_image_gt_truncation_deviates_when_obj_noisy():
    """The documented failure mode (yolox_head.yolox_losses docstring):
    same scene, objectness ANTI-correlated with IoU (early training
    noise) — the prefilter drops the low-obj/high-IoU anchors the full
    pipeline selects, so the assignments genuinely differ. This pins the
    deviation as real, not hypothetical, and motivates the
    MODEL.YOLO.SIMOTA_PREFILTER_TOPK escape hatches (0 auto / <0 off)."""
    pred, grids, strides, iou, gtb, gtc, gtv = _whole_image_setup()
    A = grids.shape[0]
    obj = jnp.asarray(-10.0 * iou)
    cls = jnp.zeros((A, 3))
    full = simota_assign(pred, obj, cls, grids, strides, gtb, gtc, gtv)
    pre = simota_assign(pred, obj, cls, grids, strides, gtb, gtc, gtv,
                        prefilter_topk=64)
    assert not np.array_equal(np.asarray(full["fg_mask"]),
                              np.asarray(pre["fg_mask"]))
    # disabling via prefilter_topk=None (cfg < 0) restores exactness
    off = simota_assign(pred, obj, cls, grids, strides, gtb, gtc, gtv,
                        prefilter_topk=None)
    np.testing.assert_array_equal(np.asarray(full["fg_mask"]),
                                  np.asarray(off["fg_mask"]))


def test_resolve_simota_prefilter_cfg():
    from yolov7_d2_tpu.config import get_cfg
    from yolov7_d2_tpu.engine import resolve_simota_prefilter

    cfg = get_cfg()
    cfg.defrost()
    cfg.INPUT.INPUT_SIZE = (640, 640)
    cfg.MODEL.YOLO.SIMOTA_PREFILTER_TOPK = 0   # auto
    a = sum((640 // s) * (640 // s) for s in (8, 16, 32))
    assert resolve_simota_prefilter(cfg) == max(1024, a // 4)
    cfg.MODEL.YOLO.SIMOTA_PREFILTER_TOPK = 512
    assert resolve_simota_prefilter(cfg) == 512
    cfg.MODEL.YOLO.SIMOTA_PREFILTER_TOPK = -1
    assert resolve_simota_prefilter(cfg) is None
