"""Full-model EVAL-path parity for SparseInst and DETR (VERDICT round-3
item 3): the reference meta-arch's whole eval forward — preprocess ->
backbone/encoder/decoder -> score fusion/rescoring/thresholding ->
two-stage mask upsample -> final Instances — against our jax pipeline,
ending at Instances-level agreement.

  * SparseInst: /root/reference/yolov7/modeling/meta_arch/sparseinst.py:127-235
    (reference torch ResNet-50 + InstanceContextEncoder + GroupIAMDecoder
    random-initialized, weights ported into our full SparseInst flax model;
    the reference's own ``SparseInst.inference`` runs on its outputs)
  * DETR: /root/reference/yolov7/modeling/meta_arch/detr.py:219-266
    (softmax no-object drop, ignore_thresh filter, cxcywh->xyxy scale) —
    both postprocess-only on shared head outputs AND the full
    image->R50->transformer->Instances chain with ported weights
    (test_detr_full_model_eval_e2e_parity).
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from _torchref import install_stubs, ref_module  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from yolov7_d2_tpu.utils import weight_port as wp  # noqa: E402


def _nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def _state_np(tm):
    return {k: v.detach().numpy() for k, v in tm.state_dict().items()}


def _randomize(tm, seed):
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in tm.parameters():
            p.normal_(0.0, 0.05, generator=g)
        for b in tm.buffers():
            if b.dtype.is_floating_point:
                b.normal_(0.0, 0.05, generator=g).abs_()


def test_sparseinst_eval_e2e_parity():
    """image -> normalize -> R50 -> encoder -> decoder -> inference():
    final (scores, classes, original-resolution binary masks) agree."""
    import torch

    install_stubs()
    rv = ref_module("yolov7.modeling.backbone.resnetvd")
    enc_mod = ref_module("yolov7.modeling.transcoders.encoder_sparseinst")
    dec_mod = ref_module("yolov7.modeling.transcoders.decoder_sparseinst")
    si_mod = ref_module("yolov7.modeling.meta_arch.sparseinst")

    from yolov7_d2_tpu.models.meta_arch.sparseinst import (
        SparseInst, sparseinst_postprocess, upsample_masks_two_stage)

    H = W = 96          # model input (divisible by 32 -> no padding)
    ORI = (83, 71)      # original image size exercises stage-2 resize
    C, N = 7, 12

    ns = lambda **kw: types.SimpleNamespace(**kw)  # noqa: E731
    cfg = ns(MODEL=ns(SPARSE_INST=ns(
        ENCODER=ns(NUM_CHANNELS=64,
                   IN_FEATURES=["res3", "res4", "res5"]),
        DECODER=ns(
            INST=ns(DIM=256, CONVS=4),
            MASK=ns(DIM=256, CONVS=4),
            NUM_MASKS=N, KERNEL_DIM=16, NUM_CLASSES=C, GROUPS=4,
            SCALE_FACTOR=2.0, OUTPUT_IAM=False,
        ),
    )))

    backbone_t = rv.ResNet(["bottleneck"] * 4, [3, 4, 6, 3]).eval()
    _randomize(backbone_t, 41)
    shapes = {
        "res3": types.SimpleNamespace(channels=512),
        "res4": types.SimpleNamespace(channels=1024),
        "res5": types.SimpleNamespace(channels=2048),
    }
    encoder_t = enc_mod.InstanceContextEncoder(cfg, shapes).eval()
    _randomize(encoder_t, 42)
    decoder_t = dec_mod.GroupIAMDecoder(cfg).eval()
    _randomize(decoder_t, 43)

    # ours: ONE flax model with the three component trees ported in
    ours_model = SparseInst(
        num_classes=C, num_masks=N, kernel_dim=16, groups=4,
        encoder_channels=64, resnet_depth=50)
    rng = np.random.default_rng(44)
    img = rng.uniform(0, 255, (1, 3, H, W)).astype(np.float32)
    variables = ours_model.init(jax.random.PRNGKey(0), _nhwc(img))
    for tm, mapper, prefix in (
        (backbone_t, wp.map_resnetvd_plain_torch_name, "backbone"),
        (encoder_t, wp.map_sparseinst_encoder_torch_name, "encoder"),
        (decoder_t, wp.map_sparseinst_decoder_torch_name, "decoder"),
    ):
        variables, report = wp.port_torch_state_dict(
            _state_np(tm), variables,
            name_mapper=lambda n, m=mapper, p=prefix: (p,) + m(n))
        assert not report["unused"], (prefix, report["unused"][:5])

    # reference eval forward, exactly as SparseInst.forward does it: the
    # meta-arch normalizer and our in-model normalization use the same
    # (BGR-order) constants, so both sides see the same tensor
    mean_ours = np.array([103.53, 116.28, 123.675], np.float32)
    std_ours = np.array([57.375, 57.12, 58.395], np.float32)
    x_norm = (img - mean_ours[None, :, None, None]) / (
        std_ours[None, :, None, None])
    with torch.no_grad():
        feats = backbone_t(torch.from_numpy(x_norm))
        fused = encoder_t({k: feats[k] for k in ("res3", "res4", "res5")})
        output = decoder_t(fused)

    ref = object.__new__(si_mod.SparseInst)
    torch.nn.Module.__init__(ref)
    ref.cls_threshold = 0.005
    ref.mask_threshold = 0.45
    with torch.no_grad():
        results = ref.inference(
            output, [{"height": ORI[0], "width": ORI[1]}],
            max_shape=(H, W), image_sizes=[(H, W)])
    inst = results[0]
    ref_scores = inst.scores.numpy()
    ref_classes = inst.pred_classes.numpy()
    ref_masks = inst.pred_masks.numpy()

    # ours: full model apply + postprocess + two-stage upsample
    out = ours_model.apply(variables, _nhwc(img))
    det = sparseinst_postprocess(out, max_detections=N)
    our_scores = np.asarray(det.scores[0])
    our_classes = np.asarray(det.classes[0])
    our_masks = np.asarray(det.masks[0])
    # ours keeps all N sorted by score; the reference filters at
    # cls_threshold (0.005) pre-rescoring. With random weights every
    # proposal passes — assert that so the comparison is total.
    assert len(ref_scores) == N, len(ref_scores)

    order_ref = np.argsort(-ref_scores)
    order_ours = np.argsort(-our_scores)
    # rescoring binarizes masks at 0.45: pixels whose sigmoid sits within
    # the accumulated full-stack fp drift of the threshold flip sides,
    # shifting maskness by O(flips/support). The rescoring FORMULA itself
    # is oracle-tested exactly in test_mask_fidelity; here the e2e chain
    # tolerance covers the flips. Round 5 tightened this from rtol=1.5e-2:
    # the loose value had been absorbing the STRIDE_IN_1X1 mis-wiring
    # (~2e-3 backbone drift) that the gradient differential later caught —
    # with the backbone now bit-tight (6e-8), honest drift is ~1e-4.
    np.testing.assert_allclose(
        our_scores[order_ours], ref_scores[order_ref], rtol=1.5e-3,
        atol=1e-4, err_msg="final rescored scores diverge")
    np.testing.assert_array_equal(
        our_classes[order_ours], ref_classes[order_ref],
        err_msg="final classes diverge")

    up = np.asarray(upsample_masks_two_stage(
        jnp.asarray(our_masks[order_ours]), (H, W), (H, W), ORI))
    ref_bin = ref_masks[order_ref]
    # binary masks: identical up to <0.5% threshold-boundary pixels
    mismatch = np.mean(up != ref_bin)
    assert mismatch < 5e-3, f"mask mismatch fraction {mismatch}"


def test_detr_eval_e2e_parity():
    """Reference Detr.inference (softmax no-object drop + ignore_thresh +
    box scale) vs our detr_postprocess on identical head outputs."""
    import torch

    install_stubs()
    detr_mod = ref_module("yolov7.modeling.meta_arch.detr")
    from yolov7_d2_tpu.models.meta_arch.detr import detr_postprocess

    rng = np.random.default_rng(55)
    B, Q, C = 2, 24, 7
    H, W = 128, 160
    logits = rng.normal(size=(B, Q, C + 1)).astype(np.float32)
    boxes = 1.0 / (1.0 + np.exp(-rng.normal(size=(B, Q, 4)))).astype(
        np.float32)

    ref = object.__new__(detr_mod.Detr)
    torch.nn.Module.__init__(ref)
    ref.ignore_thresh = 0.05
    ref.mask_on = False
    with torch.no_grad():
        results = ref.inference(
            torch.from_numpy(logits), torch.from_numpy(boxes), None,
            [(H, W), (H, W)])

    det = detr_postprocess(
        {"pred_logits": jnp.asarray(logits), "pred_boxes": jnp.asarray(boxes)},
        (H, W), max_detections=Q)

    for b in range(B):
        inst = results[b]
        ref_scores = inst.scores.numpy()
        ref_classes = inst.pred_classes.numpy()
        ref_boxes = inst.pred_boxes.tensor.numpy()
        sc = np.asarray(det.scores[b])
        cl = np.asarray(det.classes[b])
        bx = np.asarray(det.boxes[b])
        keep = sc > ref.ignore_thresh  # ours keeps all Q; apply same filter
        o_ours = np.argsort(-sc[keep])
        o_ref = np.argsort(-ref_scores)
        assert keep.sum() == len(ref_scores)
        np.testing.assert_allclose(
            sc[keep][o_ours], ref_scores[o_ref], rtol=1e-5, atol=1e-6,
            err_msg="detr final scores")
        np.testing.assert_array_equal(cl[keep][o_ours], ref_classes[o_ref])
        np.testing.assert_allclose(
            bx[keep][o_ours], ref_boxes[o_ref], rtol=1e-4, atol=1e-3,
            err_msg="detr final boxes")


def test_detr_full_model_eval_e2e_parity():
    """image -> normalize -> R50 -> input_proj -> sine PE -> transformer
    -> class/box heads -> ``Detr.inference``: final Instances agree.

    Extends ``test_detr_eval_e2e_parity`` (postprocess on shared head
    outputs) through the FULL reference eval forward
    (meta_arch/detr.py:406-465 ``DETR.forward`` assembled exactly as
    ``Detr.__init__`` does at detr.py:62-81: Joiner(MaskedBackbone,
    PositionEmbeddingSine) + transformer + heads) vs our one flax DETR
    with every weight ported. This is the rung whose absence let the
    STRIDE_IN_1X1 mis-wiring hide for two rounds: the old DETR chain was
    proven backbone / transformer / postprocess separately, never as one
    image->Instances differential."""
    import torch

    install_stubs()
    rv = ref_module("yolov7.modeling.backbone.resnetvd")
    db = ref_module("yolov7.modeling.backbone.detr_backbone")
    detr_mod = ref_module("yolov7.modeling.meta_arch.detr")
    misc = ref_module("yolov7.utils.misc")

    from yolov7_d2_tpu.models.meta_arch.detr import DETR, detr_postprocess

    H = W = 96          # divisible by 32 -> zero padding, all-valid mask
    D, HEADS, LAYERS, FF, Q, C = 64, 4, 3, 128, 10, 7

    # reference: the d2 backbone stood in by resnetvd's plain ResNet —
    # torchvision semantics (stride on the 3x3), which is exactly what
    # every reference DETR config's STRIDE_IN_1X1 False selects.
    class _MaskedR50(torch.nn.Module):
        """MaskedBackbone (detr.py:297) for an unpadded batch."""

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
        aux_loss=False).eval()
    _randomize(ref_detr, 61)

    ours_model = DETR(num_classes=C, hidden_dim=D, num_queries=Q,
                      nheads=HEADS, enc_layers=LAYERS, dec_layers=LAYERS,
                      dim_feedforward=FF, dropout=0.0, resnet_depth=50)
    rng = np.random.default_rng(62)
    img = rng.uniform(0, 255, (1, 3, H, W)).astype(np.float32)
    variables = ours_model.init(jax.random.PRNGKey(0), _nhwc(img))

    sd = _state_np(ref_detr)
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

    mean = np.array([103.53, 116.28, 123.675], np.float32)
    std = np.array([57.375, 57.12, 58.395], np.float32)
    x_norm = (img - mean[None, :, None, None]) / std[None, :, None, None]
    with torch.no_grad():
        samples = misc.NestedTensor(
            torch.from_numpy(x_norm), torch.zeros((1, H, W), dtype=torch.bool))
        output = ref_detr(samples)

    ref = object.__new__(detr_mod.Detr)
    torch.nn.Module.__init__(ref)
    ref.ignore_thresh = 0.05
    ref.mask_on = False
    with torch.no_grad():
        results = ref.inference(
            output["pred_logits"], output["pred_boxes"], None, [(H, W)])

    out = ours_model.apply(variables, _nhwc(img))
    np.testing.assert_allclose(
        np.asarray(out["pred_logits"]), output["pred_logits"].numpy(),
        rtol=1e-3, atol=1e-4, err_msg="full-model pred_logits diverge")
    np.testing.assert_allclose(
        np.asarray(out["pred_boxes"]), output["pred_boxes"].numpy(),
        rtol=1e-3, atol=1e-5, err_msg="full-model pred_boxes diverge")

    det = detr_postprocess(out, (H, W), max_detections=Q)
    inst = results[0]
    ref_scores = inst.scores.numpy()
    ref_classes = inst.pred_classes.numpy()
    ref_boxes = inst.pred_boxes.tensor.numpy()
    sc = np.asarray(det.scores[0])
    cl = np.asarray(det.classes[0])
    bx = np.asarray(det.boxes[0])
    keep = sc > ref.ignore_thresh
    assert keep.sum() == len(ref_scores)
    o_ours = np.argsort(-sc[keep])
    o_ref = np.argsort(-ref_scores)
    np.testing.assert_allclose(
        sc[keep][o_ours], ref_scores[o_ref], rtol=1e-4, atol=1e-5,
        err_msg="detr full-model final scores")
    np.testing.assert_array_equal(cl[keep][o_ours], ref_classes[o_ref])
    np.testing.assert_allclose(
        bx[keep][o_ours], ref_boxes[o_ref], rtol=1e-4, atol=1e-3,
        err_msg="detr full-model final boxes")


def test_solov2_eval_e2e_parity():
    """Reference SOLOv2 eval chain — point_nms -> per-(cell,class)
    candidates -> dynamic-conv masks -> area>stride filter -> maskness
    rescoring -> matrix NMS -> update_thr -> top-k -> two-stage mask
    upsample + mask-derived boxes (solov2.py:180-197, 432-647) — against
    ours, to final-Instances agreement. Head/neck forwards are
    parity-proven in test_torch_parity_stacks; this drives the whole
    postprocess on shared head outputs."""
    import torch

    install_stubs()
    solov2_mod = ref_module("yolov7.modeling.meta_arch.solov2")
    utils_mod = ref_module("yolov7.utils.solov2_utils")

    from yolov7_d2_tpu.models.meta_arch.solov2 import (
        solov2_postprocess, solov2_upsample_masks)

    rng = np.random.default_rng(71)
    B, C, E = 1, 4, 8
    num_grids = (8, 6, 4)
    strides = (8, 16, 32)
    H = W = 64          # network input
    ORI = (57, 49)      # original image size
    Hm = Wm = 16        # mask features at stride 4
    NMS_PRE, MAX_PER_IMG = 64, 16
    SCORE_THR, UPDATE_THR, MASK_THR = 0.3, 0.05, 0.5

    cate_logits = [
        (rng.standard_normal((B, C, s, s)) * 1.5 - 3.0).astype(np.float32)
        for s in num_grids
    ]
    kernel_preds = [
        (rng.standard_normal((B, E, s, s)) * 0.3).astype(np.float32)
        for s in num_grids
    ]
    mask_feats = rng.standard_normal((B, E, Hm, Wm)).astype(np.float32)

    ref = object.__new__(solov2_mod.SOLOv2)
    torch.nn.Module.__init__(ref)
    ref.num_classes = C
    ref.num_kernels = E
    ref.num_grids = list(num_grids)
    ref.instance_strides = list(strides)
    ref.max_before_nms = NMS_PRE
    ref.score_threshold = SCORE_THR
    ref.update_threshold = UPDATE_THR
    ref.mask_threshold = MASK_THR
    ref.max_per_img = MAX_PER_IMG
    ref.nms_kernel = "gaussian"
    ref.nms_sigma = 2.0
    ref.nms_type = "matrix"

    with torch.no_grad():
        # the forward's point_nms on sigmoided maps, then inference
        pred_cates = [
            utils_mod.point_nms(
                torch.from_numpy(c).sigmoid(), kernel=2
            ).permute(0, 2, 3, 1)
            for c in cate_logits
        ]
        results = ref.inference(
            pred_cates,
            [torch.from_numpy(k) for k in kernel_preds],
            torch.from_numpy(mask_feats),
            [(H, W)], [{"height": ORI[0], "width": ORI[1]}],
        )
    inst = results[0]["instances"]
    ref_scores = inst.scores.numpy()
    ref_classes = inst.pred_classes.numpy()
    ref_masks = inst.pred_masks.numpy()
    ref_boxes = inst.pred_boxes.tensor.numpy()
    assert len(ref_scores) >= 3, "scene too sparse to be meaningful"

    ours = solov2_postprocess(
        {
            "mask_feats": jnp.asarray(mask_feats.transpose(0, 2, 3, 1)),
            "cate_preds": [jnp.asarray(c.transpose(0, 2, 3, 1))
                           for c in cate_logits],
            "kernel_preds": [jnp.asarray(k.transpose(0, 2, 3, 1))
                             for k in kernel_preds],
        },
        score_thr=SCORE_THR, mask_thr=MASK_THR, update_thr=UPDATE_THR,
        max_per_img=MAX_PER_IMG, nms_pre=NMS_PRE,
        instance_strides=strides,
    )
    valid = np.asarray(ours.valid[0])
    n = int(valid.sum())
    assert n == len(ref_scores), (n, len(ref_scores))
    our_scores = np.asarray(ours.scores[0])[:n]
    our_classes = np.asarray(ours.classes[0])[:n]

    np.testing.assert_allclose(
        our_scores, ref_scores, rtol=2e-4, atol=1e-5,
        err_msg="solov2 final scores diverge")
    np.testing.assert_array_equal(
        our_classes, ref_classes, err_msg="solov2 final classes diverge")

    bin_masks, boxes = solov2_upsample_masks(
        jnp.asarray(ours.masks[0][:n]), (H, W), ORI, mask_thr=MASK_THR)
    mismatch = np.mean(np.asarray(bin_masks) != ref_masks)
    assert mismatch < 5e-3, f"solov2 mask mismatch fraction {mismatch}"
    np.testing.assert_allclose(
        np.asarray(boxes), ref_boxes, atol=1.0,
        err_msg="solov2 mask-derived boxes diverge")


def test_yolof_eval_e2e_parity():
    """Reference YOLOF.inference (yolof.py:436-540): flattened
    (anchor, class) sigmoid candidates -> score threshold -> top-k ->
    delta decode -> detectron2 batched_nms -> max_detections, against
    our yolof_postprocess at final-Instances agreement. The
    encoder/decoder forward is parity-proven in
    test_torch_parity_stacks::test_yolof_encoder_decoder_parity; this
    drives the whole eval postprocess on shared head outputs."""
    import torch
    import torch.nn as nn

    install_stubs()
    yolof_mod = ref_module("yolov7.modeling.meta_arch.yolof")
    br = ref_module("yolov7.modeling.head.box_regression")
    from detectron2.structures import Boxes

    from yolov7_d2_tpu.models.meta_arch.yolof import (
        yolof_anchors, yolof_postprocess)

    rng = np.random.default_rng(79)
    B, C = 1, 6
    H = W = 8
    stride = 32
    anchors_np = np.asarray(yolof_anchors(H, W, stride=stride))
    A = anchors_np.shape[0]

    # logits biased down so a moderate candidate count clears the 0.05
    # threshold; continuous values keep NMS orderings unique
    logits = (rng.standard_normal((B, A, C)) * 1.2 - 2.2).astype(np.float32)
    deltas = (rng.standard_normal((B, A, 4)) * 0.4).astype(np.float32)

    ref = object.__new__(yolof_mod.YOLOF)
    nn.Module.__init__(ref)
    ref.num_classes = C
    ref.test_score_thresh = 0.05
    ref.test_topk_candidates = 200
    ref.test_nms_thresh = 0.6
    ref.max_detections_per_image = 50
    ref.box2box_transform = br.YOLOFBox2BoxTransform(
        weights=(1.0, 1.0, 1.0, 1.0))

    with torch.no_grad():
        # .copy(): the reference's sigmoid_() is IN-PLACE on a view and
        # would mutate the numpy array our side reads
        results = ref.inference(
            [Boxes(torch.from_numpy(anchors_np))],
            [torch.from_numpy(logits.copy())],
            [torch.from_numpy(deltas.copy())],
            [(H * stride, W * stride)],
        )
    inst = results[0]
    ref_scores = inst.scores.numpy()
    ref_classes = inst.pred_classes.numpy()
    ref_boxes = inst.pred_boxes.tensor.numpy()
    assert len(ref_scores) >= 5, "scene too sparse"

    ours = yolof_postprocess(
        {"logits": jnp.asarray(logits), "deltas": jnp.asarray(deltas),
         "anchors": jnp.asarray(anchors_np)},
        score_thresh=0.05, nms_thresh=0.6, topk_candidates=200,
        max_detections=50,
    )
    valid = np.asarray(ours.valid[0])
    n = int(valid.sum())
    assert n == len(ref_scores), (n, len(ref_scores))
    np.testing.assert_allclose(
        np.asarray(ours.scores[0])[:n], ref_scores, rtol=1e-5, atol=1e-6,
        err_msg="yolof final scores diverge")
    np.testing.assert_array_equal(
        np.asarray(ours.classes[0])[:n], ref_classes,
        err_msg="yolof final classes diverge")
    np.testing.assert_allclose(
        np.asarray(ours.boxes[0])[:n], ref_boxes, rtol=1e-4, atol=1e-3,
        err_msg="yolof final boxes diverge")


@pytest.mark.parametrize("v5", [False, True])
def test_yolo_postprocess_v5_v7_parity(v5):
    """Reference postprocess / postprocessv5 (utils/boxes.py:171-306) on
    decoded predictions vs our yolo_nms_postprocess: same gate (obj*cls
    for v7-family, obj-only for v5), same obj*cls NMS ranking, same
    final (boxes, scores, classes). Decode itself is parity-proven in
    test_anchor_yolo / test_torch_parity."""
    import torch

    install_stubs()
    boxes_mod = ref_module("yolov7.utils.boxes")
    from yolov7_d2_tpu.models.meta_arch.yolov7 import yolo_nms_postprocess

    rng = np.random.default_rng(101 if v5 else 97)
    B, A, C = 2, 300, 6
    cxcy = rng.uniform(40, 600, (B, A, 2))
    wh = np.exp(rng.uniform(np.log(12), np.log(120), (B, A, 2)))
    obj = rng.uniform(0, 1, (B, A)).astype(np.float32)
    cls_prob = rng.uniform(0, 1, (B, A, C)).astype(np.float32)
    pred = np.concatenate(
        [cxcy, wh, obj[..., None], cls_prob], -1).astype(np.float32)

    fn = boxes_mod.postprocessv5 if v5 else boxes_mod.postprocess
    with torch.no_grad():
        # .copy(): the reference mutates prediction[:, :, :4] in place
        ref_out = fn(torch.from_numpy(pred.copy()), C,
                     conf_thre=0.4, nms_thre=0.5)

    boxes = np.concatenate(
        [cxcy - wh / 2, cxcy + wh / 2], -1).astype(np.float32)
    # the reference chain has NO detection cap — run ours uncapped so the
    # survivor sets are comparable (max_detections is our d2-style cap)
    ours = yolo_nms_postprocess(
        jnp.asarray(boxes), jnp.asarray(obj), jnp.asarray(cls_prob),
        conf_threshold=0.4, nms_threshold=0.5, max_detections=A,
        pre_nms_topk=A, v5_gate=v5,
    )
    for b in range(B):
        det = ref_out[b]
        assert det is not None and det.shape[0] >= 3, "scene too sparse"
        ref_boxes = det[:, :4].numpy()
        ref_scores = (det[:, 4] * det[:, 5]).numpy()
        ref_classes = det[:, 6].numpy().astype(np.int64)
        valid = np.asarray(ours.valid[b])
        n = int(valid.sum())
        assert n == len(ref_scores), (v5, b, n, len(ref_scores))
        np.testing.assert_allclose(
            np.asarray(ours.scores[b])[:n], ref_scores, rtol=1e-5,
            atol=1e-6, err_msg=f"v5={v5} scores diverge")
        np.testing.assert_array_equal(
            np.asarray(ours.classes[b])[:n], ref_classes,
            err_msg=f"v5={v5} classes diverge")
        np.testing.assert_allclose(
            np.asarray(ours.boxes[b])[:n], ref_boxes, rtol=1e-5, atol=1e-4,
            err_msg=f"v5={v5} boxes diverge")


def test_anchor_detr_eval_e2e_parity():
    """Reference focal-variant inference — sigmoid + top-100 over all
    (query, class) pairs + gather + cxcywh->xyxy scale — shared verbatim
    by AnchorDetr (anchor_detr.py:250), SMCA (smca_detr.py:216) and
    DetrD2go's use_focal_loss branch (detr_d2go.py:465) — vs our
    anchor_detr_postprocess on identical head outputs."""
    import torch

    install_stubs()
    ad_mod = ref_module("yolov7.modeling.meta_arch.anchor_detr")
    from yolov7_d2_tpu.models.meta_arch.detr_variants import (
        anchor_detr_postprocess)

    rng = np.random.default_rng(91)
    B, Q, C = 2, 24, 7          # Q*C = 168 >= the hardcoded top-100
    H, W = 128, 160
    logits = rng.normal(size=(B, Q, C)).astype(np.float32)
    boxes = 1.0 / (1.0 + np.exp(-rng.normal(size=(B, Q, 4)))).astype(
        np.float32)

    ref = object.__new__(ad_mod.AnchorDetr)
    torch.nn.Module.__init__(ref)
    ref.mask_on = False
    with torch.no_grad():
        results = ref.inference(
            torch.from_numpy(logits), torch.from_numpy(boxes), None,
            [(H, W), (H, W)])

    det = anchor_detr_postprocess(
        {"pred_logits": jnp.asarray(logits), "pred_boxes": jnp.asarray(boxes)},
        (H, W), max_detections=100)

    for b in range(B):
        inst = results[b]
        np.testing.assert_allclose(
            np.asarray(det.scores[b]), inst.scores.numpy(),
            rtol=1e-6, atol=1e-7, err_msg="anchor-detr top-100 scores")
        np.testing.assert_array_equal(
            np.asarray(det.classes[b]), inst.pred_classes.numpy())
        np.testing.assert_allclose(
            np.asarray(det.boxes[b]), inst.pred_boxes.tensor.numpy(),
            rtol=1e-5, atol=1e-4, err_msg="anchor-detr top-100 boxes")
