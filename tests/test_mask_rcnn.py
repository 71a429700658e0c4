"""Mask R-CNN / Panoptic FPN family (the d2-substrate model zoo of the
reference's LazyConfig universe, rebuilt TPU-native — SURVEY.md L0)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov7_d2_tpu.ops.roi_align import bilinear_sample, roi_align


def test_bilinear_sample_exact_on_ramp():
    """f(y, x) = 2x + 3y is reproduced exactly by bilinear interpolation."""
    h, w = 10, 12
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    feat = jnp.asarray((2 * xs + 3 * ys)[..., None], jnp.float32)
    qy = jnp.asarray([[1.5, 3.25], [0.0, 7.9]])
    qx = jnp.asarray([[2.5, 0.75], [4.0, 10.1]])
    out = bilinear_sample(feat, qy, qx)[..., 0]
    np.testing.assert_allclose(
        np.asarray(out), 2 * np.asarray(qx) + 3 * np.asarray(qy), rtol=1e-5
    )


def test_roi_align_constant_region():
    feat = jnp.ones((16, 16, 4)) * 7.0
    boxes = jnp.asarray([[2.0, 2.0, 10.0, 10.0], [0.0, 0.0, 16.0, 16.0]])
    out = roi_align(feat, boxes, out_size=7)
    assert out.shape == (2, 7, 7, 4)
    np.testing.assert_allclose(np.asarray(out), 7.0, rtol=1e-6)


def test_roi_align_ramp_center_value():
    """Pooling the ramp f(x) = x over [4, 12] must average to the box
    center in every row (aligned=True semantics, scale 1)."""
    h = w = 16
    xs = np.arange(w, dtype=np.float32)
    feat = jnp.asarray(np.tile(xs[None, :, None], (h, 1, 1)))
    out = roi_align(feat, jnp.asarray([[4.0, 4.0, 12.0, 12.0]]), out_size=4)
    # bin centers along x: 4-12 box, 4 bins of width 2 -> centers 5,7,9,11
    # minus the half-pixel alignment offset
    got = np.asarray(out)[0, 0, :, 0]
    np.testing.assert_allclose(got, [4.5, 6.5, 8.5, 10.5], atol=1e-5)


def test_delta_encode_decode_roundtrip():
    from yolov7_d2_tpu.models.meta_arch.mask_rcnn import (
        decode_deltas,
        encode_deltas,
    )

    rng = np.random.default_rng(0)
    anchors = jnp.asarray(
        np.stack(
            [
                rng.uniform(0, 50, 20), rng.uniform(0, 50, 20),
                rng.uniform(60, 120, 20), rng.uniform(60, 120, 20),
            ],
            -1,
        ),
        jnp.float32,
    )
    boxes = anchors + jnp.asarray(rng.uniform(-5, 5, (20, 4)), jnp.float32)
    deltas = encode_deltas(anchors, boxes, (10.0, 10.0, 5.0, 5.0))
    back = decode_deltas(anchors, deltas, (10.0, 10.0, 5.0, 5.0))
    np.testing.assert_allclose(np.asarray(back), np.asarray(boxes), atol=1e-3)


def _mini_cfg(mask_on=True, arch="MaskRCNN"):
    from yolov7_d2_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = arch
    cfg.MODEL.MASK_ON = mask_on
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 5
    cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 6
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RPN.PRE_NMS_TOPK = 32
    cfg.MODEL.RPN.POST_NMS_TOPK = 16
    cfg.MODEL.YOLO.MAX_BOXES_NUM = 4
    cfg.INPUT.INPUT_SIZE = [64, 64]
    cfg.SOLVER.AMP.ENABLED = False
    cfg.SOLVER.EMA.ENABLED = False
    return cfg


def _mini_batch(b=2, g=4, with_sem=False):
    batch = {
        "image": jnp.full((b, 64, 64, 3), 114.0),
        "gt_boxes": jnp.tile(
            jnp.asarray([[8.0, 8.0, 40.0, 40.0]]), (b, g, 1)
        ),
        "gt_classes": jnp.zeros((b, g), jnp.int32),
        "gt_valid": jnp.zeros((b, g), bool).at[:, 0].set(True),
        "gt_masks": jnp.zeros((b, g, 64, 64), jnp.uint8)
        .at[:, 0, 8:40, 8:40].set(1),
    }
    if with_sem:
        batch["gt_sem_seg"] = jnp.zeros((b, 64, 64), jnp.int32).at[
            :, 32:, :
        ].set(2)
    return batch


def test_mask_rcnn_train_step_and_grads():
    from yolov7_d2_tpu.engine import build_system

    cfg = _mini_cfg()
    model, state, train_step, fields = build_system(cfg, batch_size=2)
    assert "gt_masks" in fields
    new_state, metrics = jax.jit(train_step)(state, _mini_batch())
    for k in ("loss_rpn_cls", "loss_rpn_loc", "loss_cls", "loss_box_reg",
              "loss_mask", "total_loss"):
        assert np.isfinite(float(metrics[k])), (k, metrics[k])
    assert float(metrics["grad_norm"]) > 0


def test_mask_rcnn_postprocess_contract():
    from yolov7_d2_tpu.engine import build_system
    from yolov7_d2_tpu.models.meta_arch.mask_rcnn import mask_rcnn_postprocess

    cfg = _mini_cfg()
    model, state, _, _ = build_system(cfg, batch_size=1)
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.full((1, 64, 64, 3), 114.0), train=False,
    )
    assert out["proposals"].shape == (1, 16, 4)
    assert out["mask_logits"].shape == (1, 16, 28, 28, 5)
    dets = mask_rcnn_postprocess(out, max_detections=10)
    assert dets.boxes.shape == (1, 10, 4)
    assert np.isfinite(np.asarray(dets.scores)).all()


def test_panoptic_fpn_train_and_fusion():
    from yolov7_d2_tpu.engine import build_system
    from yolov7_d2_tpu.models.meta_arch.panoptic_fpn import (
        combine_semantic_and_instance,
    )
    from yolov7_d2_tpu.structures.instances import Detections

    cfg = _mini_cfg(arch="PanopticFPN")
    model, state, train_step, fields = build_system(cfg, batch_size=2)
    assert "gt_sem_seg" in fields
    _, metrics = jax.jit(train_step)(state, _mini_batch(with_sem=True))
    assert np.isfinite(float(metrics["total_loss"]))
    assert "loss_sem_seg" in metrics

    # host fusion: one confident instance + one big stuff region
    sem = np.zeros((32, 32, 3), np.float32)
    sem[:, :, 1] = 1.0  # stuff class 1 everywhere
    masks = np.zeros((2, 32, 32), np.float32)
    masks[0, 2:12, 2:12] = 1.0
    dets = Detections(
        boxes=np.zeros((2, 4), np.float32),
        scores=np.asarray([0.9, 0.1], np.float32),
        classes=np.zeros((2,), np.int32),
        valid=np.asarray([True, False]),
        masks=masks,
    )
    pan = combine_semantic_and_instance(
        sem, dets, stuff_area_limit=100
    )
    assert (pan[2:12, 2:12] == 1).all()     # instance id 1
    assert (pan == 2).sum() > 500           # stuff got its own id


def test_random_subset_mask_semantics():
    """_random_subset_mask == d2 subsample_labels' draw: exactly
    min(n_take, eligible) Trues, all within the eligible set, varying with
    the key."""
    from yolov7_d2_tpu.models.meta_arch.mask_rcnn import _random_subset_mask

    elig = jnp.zeros((100,), bool).at[10:50].set(True)  # 40 eligible
    m1 = _random_subset_mask(elig, jnp.int32(16), jax.random.PRNGKey(0))
    m2 = _random_subset_mask(elig, jnp.int32(16), jax.random.PRNGKey(1))
    assert int(m1.sum()) == 16 and int(m2.sum()) == 16
    assert bool(jnp.all(~m1 | elig))  # subset of eligible
    assert not np.array_equal(np.asarray(m1), np.asarray(m2))  # random
    # fewer eligible than requested -> take all of them
    m3 = _random_subset_mask(elig, jnp.int32(64), jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(m3), np.asarray(elig))


@pytest.mark.slow
def test_sample_mode_ab_synthetic_overfit():
    """AB experiment (VERDICT r2 item 6): d2-style random fixed-size ROI
    subsampling ("sampled", reference mask_rcnn_fpn.py:46-55) vs the
    expectation-weighted dense matching substitute, trained on the same
    synthetic scene. Both must overfit (loss halves); their final losses
    must agree within 2x — measuring, not asserting, that the
    expectation-weighted path tracks d2's sampled training."""
    from yolov7_d2_tpu.engine import build_system

    batch = _mini_batch()
    finals = {}
    for mode in ("sampled", "expectation"):
        cfg = _mini_cfg()
        cfg.MODEL.ROI_HEADS.SAMPLE_MODE = mode
        cfg.SOLVER.BASE_LR = 0.01
        model, state, train_step, _ = build_system(cfg, batch_size=2)
        step = jax.jit(train_step)
        first = None
        for _ in range(40):
            state, metrics = step(state, batch)
            if first is None:
                first = float(metrics["total_loss"])
        final = float(metrics["total_loss"])
        assert np.isfinite(final), mode
        assert final < 0.6 * first, (mode, first, final)
        finals[mode] = final
    ratio = finals["sampled"] / max(finals["expectation"], 1e-9)
    assert 0.5 < ratio < 2.0, finals
