import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov7_d2_tpu.models.backbones.resnet import ResNet
from yolov7_d2_tpu.models.meta_arch.sparseinst import (
    IAMDecoder,
    InstanceContextEncoder,
    SparseInst,
    sparseinst_losses,
    sparseinst_match,
    sparseinst_postprocess,
)

SIZE = 64


def test_resnet50_shapes():
    bb = ResNet(depth=50)
    x = jnp.zeros((1, SIZE, SIZE, 3))
    v = bb.init(jax.random.PRNGKey(0), x)
    feats = bb.apply(v, x)
    assert feats["res3"].shape == (1, 8, 8, 512)
    assert feats["res4"].shape == (1, 4, 4, 1024)
    assert feats["res5"].shape == (1, 2, 2, 2048)


def test_resnet_vd_shapes_match_plain():
    bb = ResNet(depth=50, vd=True)
    x = jnp.zeros((1, SIZE, SIZE, 3))
    v = bb.init(jax.random.PRNGKey(0), x)
    feats = bb.apply(v, x)
    assert feats["res5"].shape == (1, 2, 2, 2048)


def test_encoder_single_scale_output():
    enc = InstanceContextEncoder(channels=64)
    feats = [
        jnp.zeros((1, 8, 8, 128)),
        jnp.zeros((1, 4, 4, 256)),
        jnp.zeros((1, 2, 2, 512)),
    ]
    v = enc.init(jax.random.PRNGKey(0), feats)
    out = enc.apply(v, feats)
    assert out.shape == (1, 8, 8, 64)  # fused at 1/8 of the input


@pytest.mark.parametrize("groups", [1, 4])
def test_iam_decoder_contract(groups):
    dec = IAMDecoder(num_masks=16, num_classes=5, kernel_dim=32, groups=groups,
                     inst_convs=2, mask_convs=2)
    feat = jnp.zeros((2, 8, 8, 64))
    v = dec.init(jax.random.PRNGKey(0), feat)
    out = dec.apply(v, feat)
    assert out["cls_logits"].shape == (2, 16, 5)
    assert out["obj_logits"].shape == (2, 16)
    assert out["mask_logits"].shape == (2, 16, 16, 16)  # 2x upsampled


def _tiny_sparseinst():
    return SparseInst(
        num_classes=4, num_masks=16, kernel_dim=32, groups=4,
        encoder_channels=64, resnet_depth=18,
    )


def _gt(b=1, g=4, h=SIZE, w=SIZE):
    masks = np.zeros((b, g, h, w), np.float32)
    masks[:, 0, 8:32, 8:32] = 1.0
    return {
        "gt_masks": jnp.asarray(masks),
        "gt_classes": jnp.ones((b, g), jnp.int32),
        "gt_valid": jnp.zeros((b, g), bool).at[:, 0].set(True),
    }


def test_sparseinst_match_picks_best_dice():
    # synthetic decoder output where proposal 3 exactly matches the gt mask
    n, hm, wm = 8, 16, 16
    mask_logits = jnp.full((1, n, hm, wm), -10.0)
    mask_logits = mask_logits.at[0, 3, 2:8, 2:8].set(10.0)
    out = {
        "mask_logits": mask_logits,
        "cls_logits": jnp.zeros((1, n, 4)),
        "obj_logits": jnp.zeros((1, n)),
    }
    gt_masks = jnp.zeros((1, 2, hm, wm)).at[0, 0, 2:8, 2:8].set(1.0)
    pred_of_gt, ok = sparseinst_match(
        out, gt_masks, jnp.zeros((1, 2), jnp.int32),
        jnp.array([[True, False]]),
    )
    assert int(pred_of_gt[0, 0]) == 3
    assert bool(ok[0, 0]) and not bool(ok[0, 1])


def test_sparseinst_forward_and_loss_grads():
    model = _tiny_sparseinst()
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (1, SIZE, SIZE, 3)) * 255
    variables = model.init(jax.random.PRNGKey(1), imgs, train=False)
    batch = _gt()

    def loss(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables.get("batch_stats", {})},
            imgs, train=True, mutable=["batch_stats"],
        )
        losses = sparseinst_losses(
            out, batch["gt_masks"], batch["gt_classes"], batch["gt_valid"],
            num_classes=4,
        )
        return losses["total_loss"], losses

    (total, aux), grads = jax.value_and_grad(loss, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(total))
    for k in ["loss_ce", "loss_dice", "loss_mask", "loss_objectness"]:
        assert np.isfinite(float(aux[k])), k
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)


def test_sparseinst_postprocess_contract():
    model = _tiny_sparseinst()
    imgs = jnp.zeros((2, SIZE, SIZE, 3))
    variables = model.init(jax.random.PRNGKey(0), imgs, train=False)
    out = model.apply(variables, imgs, train=False)
    dets = sparseinst_postprocess(out, cls_threshold=0.0, max_detections=8)
    assert dets.masks.shape[:2] == (2, 8)
    assert dets.boxes.shape == (2, 8, 4)
    assert dets.scores.shape == (2, 8)


def test_sparseinst_loss_decreases_on_overfit():
    """25 repeated steps on one synthetic batch reduce the total loss."""
    from yolov7_d2_tpu.config import get_cfg
    from yolov7_d2_tpu.engine import build_system

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "SparseInst"
    cfg.INPUT.INPUT_SIZE = [SIZE, SIZE]
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.NORM = "BN"
    cfg.MODEL.SPARSE_INST.DECODER.NUM_CLASSES = 4
    cfg.MODEL.SPARSE_INST.DECODER.NUM_MASKS = 8
    cfg.MODEL.SPARSE_INST.DECODER.KERNEL_DIM = 16
    cfg.MODEL.SPARSE_INST.ENCODER.NUM_CHANNELS = 32
    cfg.MODEL.YOLO.MAX_BOXES_NUM = 4
    cfg.SOLVER.OPTIMIZER = "adamw"
    cfg.SOLVER.BASE_LR = 5e-4
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.LR_SCHEDULER_NAME = "WarmupCosineLR"
    cfg.SOLVER.MAX_ITER = 100
    cfg.SOLVER.AMP.ENABLED = False

    model, state, train_step, fields = build_system(cfg, batch_size=2)
    masks = np.zeros((2, 4, SIZE, SIZE), np.float32)
    masks[:, 0, 10:40, 10:40] = 1.0
    batch = {
        "image": jnp.full((2, SIZE, SIZE, 3), 100.0),
        "gt_masks": jnp.asarray(masks),
        "gt_classes": jnp.ones((2, 4), jnp.int32),
        "gt_valid": jnp.zeros((2, 4), bool).at[:, 0].set(True),
    }
    step = jax.jit(train_step)
    first = None
    for i in range(25):
        state, metrics = step(state, batch)
        if i == 0:
            first = float(metrics["total_loss"])
    last = float(metrics["total_loss"])
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first, (first, last)
