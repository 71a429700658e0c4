import jax
import jax.numpy as jnp
import numpy as np

from yolov7_d2_tpu.models.heads.sem_seg_head import SemSegFPNHead
from yolov7_d2_tpu.models.meta_arch.detr_seg import (
    DETRsegm,
    MHAttentionMap,
    postprocess_panoptic,
    postprocess_segm,
)
from yolov7_d2_tpu.models.meta_arch.yolomask import (
    YOLOMask,
    orien_loss,
    yolomask_recover_masks,
)
from yolov7_d2_tpu.structures.instances import Detections

S = 64


def test_mh_attention_map_normalized():
    m = MHAttentionMap(hidden_dim=32, num_heads=4)
    q = jnp.ones((1, 5, 32))
    mem = jnp.ones((1, 4, 4, 32))
    v = m.init(jax.random.PRNGKey(0), q, mem)
    attn = m.apply(v, q, mem)
    assert attn.shape == (1, 5, 4, 4, 4)
    np.testing.assert_allclose(
        np.asarray(attn.reshape(1, 5, 4, -1).sum(-1)), 1.0, rtol=1e-5
    )


def test_detr_segm_forward():
    model = DETRsegm(num_classes=4, hidden_dim=32, num_queries=6, nheads=4,
                     enc_layers=1, dec_layers=1, resnet_depth=18)
    imgs = jnp.zeros((1, S, S, 3))
    v = model.init(jax.random.PRNGKey(0), imgs, train=False)
    out = model.apply(v, imgs, train=False)
    assert out["pred_logits"].shape == (1, 6, 5)
    assert out["pred_masks"].shape[0:2] == (1, 6)
    # mask head upsamples 2x twice from the s32 feature
    assert out["pred_masks"].shape[2] == (S // 32) * 4
    seg = postprocess_segm(out)
    assert seg.dtype == bool
    pano, keep = postprocess_panoptic(out, num_classes=4)
    assert pano.shape == out["pred_masks"].shape[0:1] + out["pred_masks"].shape[2:]
    assert keep.shape == (1, 6)


def test_yolomask_forward_and_orien():
    model = YOLOMask(num_classes=4, up_channels=16)
    imgs = jnp.zeros((1, S, S, 3))
    v = model.init(jax.random.PRNGKey(0), imgs, train=False)
    out = model.apply(v, imgs, train=False)
    # per-scale, per-anchor offset fields (reference orien_dim = L*na*2)
    assert out["orien"].shape == (1, S // 4, S // 4, 3, 3, 2)
    assert "outputs" in out  # detector flat outputs present


def test_orien_loss_zero_for_perfect_field():
    b, g, hq, wq = 1, 2, 8, 8
    gt_boxes = jnp.zeros((b, g, 4)).at[0, 0].set(
        jnp.array([0.0, 0.0, 32.0, 32.0])
    )
    gt_valid = jnp.zeros((b, g), bool).at[0, 0].set(True)
    masks = jnp.zeros((b, g, 32, 32)).at[0, 0, 0:32, 0:32].set(1.0)
    # perfect field: every pixel points at the box center (4, 4) grid units
    ys = jnp.arange(hq) + 0.5
    xs = jnp.arange(wq) + 0.5
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    field = jnp.stack([4.0 - gx, 4.0 - gy], -1)[None]
    loss = orien_loss(field, masks, gt_boxes, gt_valid)
    assert float(loss) < 1e-5
    # a zero field has positive loss
    assert float(orien_loss(jnp.zeros_like(field), masks, gt_boxes, gt_valid)) > 0.5


def test_mask_recovery_geometry():
    # one detection covering the left half; zero offsets -> mask = box region
    dets = Detections(
        boxes=jnp.array([[[0.0, 0.0, 32.0, 64.0]]]),
        scores=jnp.array([[0.9]]),
        classes=jnp.array([[0]], jnp.int32),
        valid=jnp.array([[True]]),
    )
    orien = jnp.zeros((1, 16, 16, 2))
    masks = yolomask_recover_masks(dets, orien)
    assert masks.shape == (1, 1, 16, 16)
    np.testing.assert_allclose(np.asarray(masks[0, 0, :, :8]), 1.0)
    np.testing.assert_allclose(np.asarray(masks[0, 0, :, 8:]), 0.0)


def test_sem_seg_fpn_head():
    head = SemSegFPNHead(num_classes=7, conv_dims=16)
    feats = [
        jnp.zeros((1, 16, 16, 32)),   # s4
        jnp.zeros((1, 8, 8, 64)),     # s8
        jnp.zeros((1, 4, 4, 128)),    # s16
        jnp.zeros((1, 2, 2, 256)),    # s32
    ]
    strides = [4, 8, 16, 32]
    v = head.init(jax.random.PRNGKey(0), feats, strides)
    out = head.apply(v, feats, strides)
    assert out.shape == (1, 16, 16, 7)
    assert np.all(np.isfinite(np.asarray(out)))
