import jax
import jax.numpy as jnp
import numpy as np

from yolov7_d2_tpu.models.meta_arch.solov2 import (
    SOLOv2,
    _level_targets,
    solov2_losses,
    solov2_postprocess,
)

S = 64
GRIDS = (8, 6, 4, 4, 2)


def _tiny():
    return SOLOv2(
        num_classes=3, num_grids=GRIDS, num_kernels=16,
        instance_channels=32, mask_channels=16, resnet_depth=18,
    )


def test_level_targets_center_region():
    G = 4
    gt_boxes = jnp.zeros((G, 4)).at[0].set(
        jnp.array([16.0, 16.0, 48.0, 48.0])  # center (32, 32), scale 32
    )
    gt_classes = jnp.zeros((G,), jnp.int32).at[0].set(2)
    gt_valid = jnp.zeros((G,), bool).at[0].set(True)
    centers = jnp.zeros((G, 2)).at[0].set(jnp.array([32.0, 32.0]))
    mask_valid = gt_valid
    t = _level_targets(8, (1, 96), (S, S), gt_boxes, gt_classes,
                       gt_valid, centers, mask_valid)
    cate = np.asarray(t["cate_target"])
    # center cell (4, 4) on the 8x8 grid is positive with class 2 (+1)
    assert cate[4, 4] == 3
    assert (cate > 0).sum() >= 1
    ok = np.asarray(t["pos_ok"])
    assert ok.sum() >= 1
    # all positive pairs reference gt 0
    assert np.all(np.asarray(t["pos_gt"])[ok] == 0)


def test_level_targets_scale_filtering():
    G = 2
    gt_boxes = jnp.zeros((G, 4)).at[0].set(jnp.array([0.0, 0.0, 60.0, 60.0]))
    gt_classes = jnp.zeros((G,), jnp.int32)
    gt_valid = jnp.zeros((G,), bool).at[0].set(True)
    # scale=60 outside range (96, 384) -> no positives
    centers = jnp.zeros((G, 2)).at[0].set(jnp.array([30.0, 30.0]))
    t = _level_targets(4, (96, 384), (S, S), gt_boxes, gt_classes,
                       gt_valid, centers, gt_valid)
    assert np.asarray(t["pos_ok"]).sum() == 0


def _gt(b=1, g=4):
    masks = np.zeros((b, g, S, S), np.float32)
    masks[:, 0, 16:48, 16:48] = 1.0
    return {
        "gt_masks": jnp.asarray(masks),
        "gt_boxes": jnp.zeros((b, g, 4)).at[:, 0].set(
            jnp.array([16.0, 16.0, 48.0, 48.0])
        ),
        "gt_classes": jnp.zeros((b, g), jnp.int32),
        "gt_valid": jnp.zeros((b, g), bool).at[:, 0].set(True),
    }


def test_solov2_forward_contract():
    model = _tiny()
    imgs = jnp.zeros((1, S, S, 3))
    v = model.init(jax.random.PRNGKey(0), imgs, train=False)
    out = model.apply(v, imgs, train=False)
    assert len(out["cate_preds"]) == 5
    assert out["cate_preds"][0].shape == (1, 8, 8, 3)
    assert out["kernel_preds"][0].shape == (1, 8, 8, 16)
    assert out["mask_feats"].shape == (1, S // 4, S // 4, 16)


def test_solov2_loss_and_grads():
    model = _tiny()
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (1, S, S, 3)) * 255
    v = model.init(jax.random.PRNGKey(1), imgs, train=False)
    batch = _gt()

    def loss(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            imgs, train=True, mutable=["batch_stats"],
        )
        l = solov2_losses(
            out, batch["gt_masks"], batch["gt_boxes"], batch["gt_classes"],
            batch["gt_valid"], (S, S), num_classes=3, num_grids=GRIDS,
        )
        return l["total_loss"], l

    (total, aux), grads = jax.value_and_grad(loss, has_aux=True)(v["params"])
    assert np.isfinite(float(total))
    assert float(aux["num_pos"]) >= 1
    assert all(
        np.all(np.isfinite(np.asarray(g)))
        for g in jax.tree_util.tree_leaves(grads)
    )


def test_solov2_postprocess_contract():
    model = _tiny()
    imgs = jnp.zeros((1, S, S, 3))
    v = model.init(jax.random.PRNGKey(0), imgs, train=False)
    out = model.apply(v, imgs, train=False)
    dets = solov2_postprocess(out, score_thr=0.0, update_thr=0.0,
                              max_per_img=10, nms_pre=32)
    assert dets.masks.shape[:2] == (1, 10)
    assert dets.boxes.shape == (1, 10, 4)


def test_solov2_dcn_tower():
    model = SOLOv2(
        num_classes=3, num_grids=GRIDS, num_kernels=16,
        instance_channels=32, mask_channels=16, resnet_depth=18,
        use_dcn_in_instance=True,
    )
    imgs = jnp.zeros((1, S, S, 3))
    v = model.init(jax.random.PRNGKey(0), imgs, train=False)
    # DCN modules present in the tower
    names = str(jax.tree_util.tree_structure(v["params"]))
    assert "cate_dcn_3" in names and "kernel_dcn_3" in names
    out = model.apply(v, imgs, train=False)
    assert np.all(np.isfinite(np.asarray(out["mask_feats"])))
