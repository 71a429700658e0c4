"""DIFFERENTIAL NUMERICAL PARITY vs the reference's own PyTorch code.

BASELINE.md's ground truth is "mAP delta <= 0.3 through the weight shim".
With no COCO data or reference checkpoints in-container, the strongest
available evidence is exact numerical agreement of the forward computation:
random-initialize the reference torch modules (imported from
/root/reference via tests/_torchref.py stubs), port their state dicts
through yolov7_d2_tpu.utils.weight_port, and assert per-layer activations
and final decoded boxes match to fp32 tolerance.

Covers: CSPDarknet-X backbone (darknetx.py), YOLOPAFPN neck
(yolo_pafpn.py:13), YOLOXHead raw outputs + decode (yolox_head.py:151-272),
and the DETR sine position embedding (detr_backbone.py:309) — the classic
mismatch source.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from _torchref import ref_module  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from yolov7_d2_tpu.utils.weight_port import port_torch_state_dict  # noqa: E402


def _randomize(module: "torch.nn.Module", seed: int = 0) -> None:
    """Random weights AND random BN running stats (so stat porting is
    actually exercised — fresh stats are all-zero/one and would hide bugs)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.empty_like(p).uniform_(-0.1, 0.1, generator=g))
        for m in module.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)


def _state_np(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


class _TorchYOLOX(torch.nn.Module):
    """backbone/neck/head composition exactly as the reference YOLOX
    meta-arch wires it (/root/reference/yolov7/modeling/meta_arch/yolox.py:68-70)."""

    def __init__(self, num_classes=8, depth=0.33, width=0.5):
        super().__init__()
        dx = ref_module("yolov7.modeling.backbone.darknetx")
        pafpn = ref_module("yolov7.modeling.neck.yolo_pafpn")
        yh = ref_module("yolov7.modeling.head.yolox_head")
        self.backbone = dx.CSPDarknet(depth, width)
        self.neck = pafpn.YOLOPAFPN(depth=depth, width=width)
        self.head = yh.YOLOXHead(num_classes, width=width)

    def forward(self, x):
        feats = self.backbone(x)
        fpn_outs = self.neck(feats)
        return feats, fpn_outs, self.head(fpn_outs)


@pytest.fixture(scope="module")
def yolox_pair():
    """(torch model, our flax model+ported variables, input) at s-ish scale."""
    from yolov7_d2_tpu.models.meta_arch.yolox import YOLOX

    num_classes, depth, width = 8, 0.33, 0.5
    tm = _TorchYOLOX(num_classes, depth, width).eval()
    _randomize(tm)

    fm = YOLOX(num_classes=num_classes, depth_mul=depth, width_mul=width)
    x = np.random.default_rng(0).uniform(0, 255, (2, 3, 128, 128)).astype(np.float32)
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x.transpose(0, 2, 3, 1)))
    ported, report = port_torch_state_dict(_state_np(tm), variables)
    assert not report["unused"], report["unused"][:10]
    return tm, fm, ported, x


def test_yolox_port_is_complete(yolox_pair):
    tm, fm, ported, x = yolox_pair
    n_torch = sum(
        1 for k in tm.state_dict() if not k.endswith("num_batches_tracked")
    )
    n_flax = len(jax.tree.leaves(ported["params"])) + len(
        jax.tree.leaves(ported["batch_stats"])
    )
    # every torch tensor landed on a distinct flax leaf, and vice versa
    assert n_torch == n_flax, (n_torch, n_flax)


def test_backbone_activation_parity(yolox_pair):
    tm, fm, ported, x = yolox_pair
    with torch.no_grad():
        feats, _, _ = tm(torch.from_numpy(x))

    from yolov7_d2_tpu.models.backbones.darknetx import CSPDarknetX

    bb = CSPDarknetX(dep_mul=0.33, wid_mul=0.5)
    bb_vars = {
        "params": ported["params"]["backbone"],
        "batch_stats": ported["batch_stats"]["backbone"],
    }
    ours = bb.apply(bb_vars, jnp.asarray(x.transpose(0, 2, 3, 1)), False)
    for k in ("dark3", "dark4", "dark5"):
        ref = feats[k].numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(
            np.asarray(ours[k]), ref, rtol=1e-4, atol=1e-4,
            err_msg=f"backbone feature {k} diverges",
        )


def test_neck_activation_parity(yolox_pair):
    tm, fm, ported, x = yolox_pair
    with torch.no_grad():
        _, fpn_outs, _ = tm(torch.from_numpy(x))

    full = fm.apply(
        {"params": ported["params"], "batch_stats": ported["batch_stats"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False,
    )
    # compare via the head outputs instead of re-plumbing the neck; but also
    # check the neck tensors directly:
    from yolov7_d2_tpu.models.backbones.darknetx import CSPDarknetX
    from yolov7_d2_tpu.models.necks.yolo_pafpn import YOLOPAFPN

    bb = CSPDarknetX(dep_mul=0.33, wid_mul=0.5)
    feats = bb.apply(
        {
            "params": ported["params"]["backbone"],
            "batch_stats": ported["batch_stats"]["backbone"],
        },
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        False,
    )
    neck = YOLOPAFPN(depth=0.33, width=0.5)
    outs = neck.apply(
        {
            "params": ported["params"]["neck"],
            "batch_stats": ported["batch_stats"]["neck"],
        },
        [feats[k] for k in ("dark3", "dark4", "dark5")],
        False,
    )
    for i, (ref_t, ours_t) in enumerate(zip(fpn_outs, outs)):
        ref = ref_t.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(
            np.asarray(ours_t), ref, rtol=1e-4, atol=1e-4,
            err_msg=f"pafpn level {i} diverges",
        )
    assert "outputs" in full


def test_head_decoded_outputs_parity(yolox_pair):
    """Final decoded [B, A, 5+C]: cxcywh in pixels, sigmoided obj/cls —
    the tensors mAP is computed from."""
    tm, fm, ported, x = yolox_pair
    with torch.no_grad():
        _, _, decoded_ref = tm(torch.from_numpy(x))
    decoded_ref = decoded_ref.numpy()  # [B, A, 5+C]

    from yolov7_d2_tpu.models.heads.yolox_head import decode_outputs

    out = fm.apply(
        {"params": ported["params"], "batch_stats": ported["batch_stats"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False,
    )
    boxes, obj_logits, cls_logits = decode_outputs(
        out["outputs"], out["grids"], out["strides"]
    )
    np.testing.assert_allclose(
        np.asarray(boxes), decoded_ref[..., :4], rtol=1e-4, atol=2e-3,
        err_msg="decoded boxes diverge",
    )
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(obj_logits)), decoded_ref[..., 4],
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(cls_logits)), decoded_ref[..., 5:],
        rtol=1e-4, atol=1e-5,
    )


def test_sine_position_embedding_parity():
    """PositionEmbeddingSine (detr_backbone.py:309) vs ours — normalize=True,
    no padding, num_pos_feats=128 (DETR hidden 256)."""
    db = ref_module("yolov7.modeling.backbone.detr_backbone")
    misc = ref_module("yolov7.utils.misc")

    h, w = 13, 17
    pe = db.PositionEmbeddingSine(num_pos_feats=128, normalize=True)
    t = torch.zeros(1, 256, h, w)
    mask = torch.zeros(1, h, w, dtype=torch.bool)
    with torch.no_grad():
        ref = pe(misc.NestedTensor(t, mask)).numpy()  # [1, 256, h, w]

    from yolov7_d2_tpu.models.layers.transformer import sine_position_embedding

    ours = np.asarray(sine_position_embedding(h, w, 128))  # [h, w, 256]
    np.testing.assert_allclose(
        ours, ref[0].transpose(1, 2, 0), rtol=1e-5, atol=1e-5,
        err_msg="sine PE diverges (interleave/normalize mismatch)",
    )


def test_darknet53_activation_parity():
    """Reference Darknet-53 (darknet.py:112, the YOLOv3/v7 trunk) vs our
    Darknet53 through map_darknet_torch_name — per-stage activations."""
    from yolov7_d2_tpu.models.backbones.darknet import Darknet53
    from yolov7_d2_tpu.utils.weight_port import map_darknet_torch_name

    dk = ref_module("yolov7.modeling.backbone.darknet")
    tm = dk.Darknet(53, out_features=["dark3", "dark4", "dark5"]).eval()
    _randomize(tm, seed=3)

    fm = Darknet53(out_features=("dark3", "dark4", "dark5"))
    x = np.random.default_rng(3).uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)
    variables = fm.init(
        jax.random.PRNGKey(0), jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    ported, report = port_torch_state_dict(
        _state_np(tm), variables, name_mapper=map_darknet_torch_name
    )
    assert not report["unused"], report["unused"][:10]

    with torch.no_grad():
        ref = tm(torch.from_numpy(x))
    ours = fm.apply(ported, jnp.asarray(x.transpose(0, 2, 3, 1)))
    for k in ("dark3", "dark4", "dark5"):
        np.testing.assert_allclose(
            np.asarray(ours[k]).transpose(0, 3, 1, 2),
            ref[k].numpy(),
            rtol=2e-4, atol=2e-5, err_msg=k,
        )


def test_efficientrep_activation_parity():
    """Reference EfficientRep (efficientrep.py:362, the YOLOv6 trunk:
    RepVGG 3-branch blocks + SimSPPF) vs ours through
    map_efficientrep_torch_name."""
    from yolov7_d2_tpu.models.backbones.efficientrep import EfficientRep
    from yolov7_d2_tpu.utils.weight_port import map_efficientrep_torch_name

    er = ref_module("yolov7.modeling.backbone.efficientrep")
    width, depth = 0.25, 0.34
    chs_plan = (64, 128, 256, 512, 1024)
    reps_plan = (1, 6, 12, 18, 6)
    chs = [max(int(c * width), 8) for c in chs_plan]
    reps = [max(int(round(r * depth)), 1) for r in reps_plan]
    tm = er.EfficientRep(
        channels_list=chs, num_repeats=reps,
        out_features=["stride8", "stride16", "stride32"],
    ).eval()
    _randomize(tm, seed=5)
    # the assembled reference meta-arch re-inits every BN to eps=1e-3,
    # momentum=0.03 (yolov6.py:107-111 _init_model) — standalone torch
    # defaults (1e-5) never occur in a trained reference model
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.eps = 1e-3
            m.momentum = 0.03

    fm = EfficientRep(width_mul=width, depth_mul=depth)
    x = np.random.default_rng(5).uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)
    variables = fm.init(
        jax.random.PRNGKey(0), jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    ported, report = port_torch_state_dict(
        _state_np(tm), variables, name_mapper=map_efficientrep_torch_name
    )
    assert not report["unused"], report["unused"][:10]

    with torch.no_grad():
        feats = tm(torch.from_numpy(x))
    ref = {"erep3": feats["stride8"], "erep4": feats["stride16"],
           "erep5": feats["stride32"]}
    ours = fm.apply(ported, jnp.asarray(x.transpose(0, 2, 3, 1)))
    for k in ("erep3", "erep4", "erep5"):
        np.testing.assert_allclose(
            np.asarray(ours[k]).transpose(0, 3, 1, 2),
            ref[k].numpy(),
            rtol=2e-4, atol=2e-5, err_msg=k,
        )
