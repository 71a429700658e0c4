import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov7_d2_tpu.models.meta_arch.yolof import (
    YOLOF,
    decode_deltas,
    uniform_match,
    yolof_anchors,
    yolof_losses,
)
from yolov7_d2_tpu.models.meta_arch.yolov6 import YOLOV6, yolov6_losses
from yolov7_d2_tpu.models.meta_arch.yolox_kpts import (
    YOLOXKPTS,
    decode_kpts,
    yolox_kpts_losses,
)

S = 64


def _det_batch(b=1, g=4):
    return {
        "gt_boxes": jnp.tile(jnp.array([[[8.0, 8.0, 40.0, 40.0]]]), (b, g, 1)),
        "gt_classes": jnp.zeros((b, g), jnp.int32),
        "gt_valid": jnp.zeros((b, g), bool).at[:, 0].set(True),
    }


def test_yolov6_forward_and_loss():
    model = YOLOV6(num_classes=4, width_mul=0.25, depth_mul=0.33)
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (1, S, S, 3)) * 255
    v = model.init(jax.random.PRNGKey(1), imgs, train=False)
    batch = _det_batch()

    def loss(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            imgs, train=True, mutable=["batch_stats"],
        )
        l = yolov6_losses(out, batch, 4)
        return l["total_loss"], l

    (total, aux), grads = jax.value_and_grad(loss, has_aux=True)(v["params"])
    assert np.isfinite(float(total))
    assert float(aux["num_fg"]) >= 1
    assert all(
        np.all(np.isfinite(np.asarray(g)))
        for g in jax.tree_util.tree_leaves(grads)
    )


def test_yolof_anchors_and_decode():
    a = yolof_anchors(2, 2, 32)
    assert a.shape == (2 * 2 * 5, 4)
    # first anchor: 32x32 centered at (16, 16)
    np.testing.assert_allclose(a[0], [0, 0, 32, 32])
    # zero deltas decode to the anchors themselves
    d = decode_deltas(jnp.asarray(a)[None], jnp.zeros((1, 20, 4)))
    np.testing.assert_allclose(np.asarray(d[0]), a, atol=1e-4)


def test_uniform_match_assigns_nearest():
    anchors = jnp.asarray(yolof_anchors(2, 2, 32))
    pred = anchors  # predictions identical to anchors
    G = 3
    gt = jnp.zeros((G, 4)).at[0].set(jnp.array([0.0, 0.0, 32.0, 32.0]))
    gv = jnp.zeros((G,), bool).at[0].set(True)
    m = uniform_match(pred, anchors, gt, gv, match_topk=2)
    occ = {k: np.asarray(v) for k, v in m.items()}
    live = occ["occ_valid"] & ~occ["occ_pos_ignore"]
    assert live.sum() >= 1
    # every valid occurrence points at gt 0 (the only valid gt)
    assert np.all(occ["occ_gt"][occ["occ_valid"]] == 0)
    # the exact-overlap anchor (cell 0's scales) is among the winners
    fg_anchors = occ["occ_anchor"][live & occ["winner"]]
    assert (fg_anchors < 5).any()


def test_yolof_forward_and_loss():
    model = YOLOF(num_classes=4, resnet_depth=18, encoder_channels=64)
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (1, S, S, 3)) * 255
    v = model.init(jax.random.PRNGKey(1), imgs, train=False)
    batch = _det_batch()

    def loss(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            imgs, train=True, mutable=["batch_stats"],
        )
        l = yolof_losses(out, batch, 4)
        return l["total_loss"], l

    (total, aux), grads = jax.value_and_grad(loss, has_aux=True)(v["params"])
    assert np.isfinite(float(total))
    assert all(
        np.all(np.isfinite(np.asarray(g)))
        for g in jax.tree_util.tree_leaves(grads)
    )


def test_kpt_decode():
    raw = jnp.zeros((1, 4, 17, 3))
    grids = jnp.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    strides = jnp.full((4,), 8.0)
    k = decode_kpts(raw, grids, strides)
    assert k.shape == (1, 4, 17, 3)
    np.testing.assert_allclose(np.asarray(k[0, 1, 0, :2]), [8.0, 0.0])


def test_yolox_kpts_forward_and_loss():
    model = YOLOXKPTS(num_keypoints=17, width_mul=0.25, depth_mul=0.33)
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (1, S, S, 3)) * 255
    v = model.init(jax.random.PRNGKey(1), imgs, train=False)
    g = 4
    kpts = np.zeros((1, g, 17, 3), np.float32)
    kpts[0, 0, :, 0] = 20.0
    kpts[0, 0, :, 1] = 20.0
    kpts[0, 0, :5, 2] = 2.0  # first 5 visible
    batch = {
        **_det_batch(g=g),
        "gt_keypoints": jnp.asarray(kpts),
    }

    def loss(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            imgs, train=True, mutable=["batch_stats"],
        )
        l = yolox_kpts_losses(out, batch, num_classes=1, num_keypoints=17)
        return l["total_loss"], l

    (total, aux), grads = jax.value_and_grad(loss, has_aux=True)(v["params"])
    assert np.isfinite(float(total))
    for k in ["loss_kpt", "loss_kpt_vis"]:
        assert np.isfinite(float(aux[k])), k
    assert all(
        np.all(np.isfinite(np.asarray(g)))
        for g in jax.tree_util.tree_leaves(grads)
    )


def test_registry_has_all_meta_archs():
    import yolov7_d2_tpu.models  # noqa: F401
    from yolov7_d2_tpu.core.registry import META_ARCH_REGISTRY

    for name in [
        "YOLOX", "YOLO", "YOLOV5", "YOLOV6", "YOLOV7", "YOLOV7P",
        "YOLOF", "YOLOX_KPTS", "SparseInst", "Detr",
    ]:
        assert name in META_ARCH_REGISTRY, name


def test_yolox_kpts_postprocess_contract():
    from yolov7_d2_tpu.models.meta_arch.yolox_kpts import (
        yolox_kpts_postprocess,
    )

    model = YOLOXKPTS(num_keypoints=17, width_mul=0.25, depth_mul=0.33)
    imgs = jnp.zeros((2, S, S, 3))
    v = model.init(jax.random.PRNGKey(0), imgs, train=False)
    out = model.apply(v, imgs, train=False)
    dets = yolox_kpts_postprocess(
        out, conf_threshold=0.0, max_detections=5, pre_nms_topk=32
    )
    assert dets.boxes.shape == (2, 5, 4)
    assert dets.keypoints.shape == (2, 5, 17, 3)
    # visibility scores squashed to [0, 1]
    k = np.asarray(dets.keypoints[..., 2])
    assert (k >= 0).all() and (k <= 1).all()
