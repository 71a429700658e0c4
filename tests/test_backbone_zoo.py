"""Tiny-shape forward tests for every backbone/neck in the zoo:
shape contracts, stride correctness, finiteness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov7_d2_tpu.models.backbones.convnext import ConvNeXt
from yolov7_d2_tpu.models.backbones.efficientnet import EfficientNet
from yolov7_d2_tpu.models.backbones.efficientrep import EfficientRep
from yolov7_d2_tpu.models.backbones.pvt_v2 import PVTv2
from yolov7_d2_tpu.models.backbones.regnet import RegNet
from yolov7_d2_tpu.models.backbones.res2net import Res2Net
from yolov7_d2_tpu.models.backbones.swin import (
    SwinTransformer,
    window_partition,
    window_reverse,
)
from yolov7_d2_tpu.models.necks.bifpn import BiFPN
from yolov7_d2_tpu.models.necks.reppan import PPYOLOPAN, RepPANNeck

S = 64


def _run(model, size=S, **kw):
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, size, size, 3))
    v = model.init(jax.random.PRNGKey(1), x, **kw)
    out = model.apply(v, x, **kw)
    for k, f in out.items():
        assert np.all(np.isfinite(np.asarray(f))), k
    return out


def test_convnext_tiny():
    out = _run(ConvNeXt(size="tiny"))
    assert out["stage1"].shape == (1, 8, 8, 192)   # stride 8
    assert out["stage2"].shape == (1, 4, 4, 384)   # stride 16
    assert out["stage3"].shape == (1, 2, 2, 768)   # stride 32


def test_regnet_x400():
    out = _run(RegNet(variant="x_400mf"))
    assert out["s2"].shape == (1, 8, 8, 64)
    assert out["s3"].shape == (1, 4, 4, 160)
    assert out["s4"].shape == (1, 2, 2, 384)


def test_res2net50():
    out = _run(Res2Net(depth=50))
    assert out["res3"].shape == (1, 8, 8, 512)
    assert out["res4"].shape == (1, 4, 4, 1024)
    assert out["res5"].shape == (1, 2, 2, 2048)


def test_swin_window_roundtrip():
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 8, 8, 4))
    wins = window_partition(x, 4)
    assert wins.shape == (2 * 4, 16, 4)
    back = window_reverse(wins, 4, 8, 8)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_swin_tiny():
    out = _run(SwinTransformer(size="tiny", window_size=4))
    assert out["stage1"].shape == (1, 8, 8, 192)
    assert out["stage2"].shape == (1, 4, 4, 384)
    assert out["stage3"].shape == (1, 2, 2, 768)


def test_pvt_v2_b0():
    out = _run(PVTv2(variant="b0"))
    assert out["stage1"].shape == (1, 8, 8, 64)
    assert out["stage2"].shape == (1, 4, 4, 160)
    assert out["stage3"].shape == (1, 2, 2, 256)


def test_efficientnet_b0():
    out = _run(EfficientNet(variant="efficientnet_b0"))
    assert out["stride8"].shape == (1, 8, 8, 40)
    assert out["stride16"].shape == (1, 4, 4, 112)
    assert out["stride32"].shape == (1, 2, 2, 320)


def test_efficientrep():
    out = _run(EfficientRep(width_mul=0.25, depth_mul=0.33))
    assert out["erep3"].shape[1:3] == (8, 8)
    assert out["erep4"].shape[1:3] == (4, 4)
    assert out["erep5"].shape[1:3] == (2, 2)


def _pyramid():
    return [
        jnp.ones((1, 8, 8, 64)),
        jnp.ones((1, 4, 4, 128)),
        jnp.ones((1, 2, 2, 256)),
    ]


def test_bifpn_five_levels():
    neck = BiFPN(out_channels=32, num_bifpn=2)
    # reference BiFPN size_divisibility is 128: P7 = stride-128 maxpool
    # chain, so the finest (stride-8) tap must be >= 16x16
    feats = [
        jnp.ones((1, 16, 16, 64)),
        jnp.ones((1, 8, 8, 128)),
        jnp.ones((1, 4, 4, 256)),
    ]
    v = neck.init(jax.random.PRNGKey(0), feats)
    outs = neck.apply(v, feats)
    assert len(outs) == 5
    assert outs[0].shape == (1, 16, 16, 32)
    assert outs[3].shape == (1, 2, 2, 32)   # P6
    for o in outs:
        assert np.all(np.isfinite(np.asarray(o)))


def test_reppan():
    neck = RepPANNeck(width_mul=0.25, depth_mul=0.33)
    feats = [
        jnp.ones((1, 8, 8, 64)),
        jnp.ones((1, 4, 4, 128)),
        jnp.ones((1, 2, 2, 256)),
    ]
    v = neck.init(jax.random.PRNGKey(0), feats)
    p3, p4, p5 = neck.apply(v, feats)
    assert p3.shape[1:3] == (8, 8)
    assert p4.shape[1:3] == (4, 4)
    assert p5.shape[1:3] == (2, 2)


def test_ppyolo_pan():
    neck = PPYOLOPAN(channels=(32, 64, 128))
    feats = _pyramid()
    v = neck.init(jax.random.PRNGKey(0), feats)
    p3, p4, p5 = neck.apply(v, feats)
    assert p3.shape == (1, 8, 8, 32)
    assert p4.shape == (1, 4, 4, 64)
    assert p5.shape == (1, 2, 2, 128)


def test_backbone_registry_builders():
    from yolov7_d2_tpu.config import get_cfg
    from yolov7_d2_tpu.core.registry import BACKBONE_REGISTRY
    import yolov7_d2_tpu.models  # noqa: F401 (registration side effects)

    cfg = get_cfg()
    for name in [
        "build_cspdarknetx_backbone", "build_darknet_backbone",
        "build_resnet_backbone", "build_resnet_vd_backbone",
        "build_convnext_backbone", "build_regnet_backbone",
        "build_res2net_backbone", "build_swin_transformer_backbone",
        "build_pvt_v2_backbone", "build_efficientnet_backbone",
        "build_efficientrep_backbone",
    ]:
        assert name in BACKBONE_REGISTRY, name
        model = BACKBONE_REGISTRY.get(name)(cfg)
        assert model is not None


def test_dla34():
    from yolov7_d2_tpu.models.backbones.dla import DLA
    out = _run(DLA(depth=34))
    assert out["level3"].shape == (1, 8, 8, 128)
    assert out["level4"].shape == (1, 4, 4, 256)
    assert out["level5"].shape == (1, 2, 2, 512)


def test_dla60_bottleneck():
    from yolov7_d2_tpu.models.backbones.dla import DLA
    out = _run(DLA(depth=60))
    assert out["level3"].shape == (1, 8, 8, 256)
    assert out["level5"].shape == (1, 2, 2, 1024)


def test_dlaup_pyramid():
    """DLAUp channel/scale bookkeeping matches reference DLAUp:336 —
    shallowest-first outputs, each at its own level's channel count."""
    from yolov7_d2_tpu.models.backbones.dla import DLAUp
    chans = [64, 128, 256, 512]
    feats = [
        jnp.zeros((1, 16 // (2 ** i), 16 // (2 ** i), c))
        for i, c in enumerate(chans)
    ]
    up = DLAUp(0, chans, [1, 2, 4, 8])
    v = up.init(jax.random.PRNGKey(0), feats)
    outs = up.apply(v, feats)
    assert len(outs) == 4
    assert outs[0].shape == (1, 16, 16, 64)   # fully merged, stride 4
    assert outs[-1].shape == (1, 2, 2, 512)   # untouched deepest


def test_bilinear_up_matches_resize_at_init():
    """bilinear-initialized depthwise lhs-dilated conv == the torch
    grouped ConvTranspose2d(k=2f, s=f, p=f//2) it mirrors (checked
    against torch on the same input)."""
    import torch
    from yolov7_d2_tpu.models.backbones.dla import BilinearUp, _bilinear_kernel

    x = np.random.RandomState(0).rand(1, 5, 7, 3).astype(np.float32)
    m = BilinearUp(3, 2)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = np.asarray(m.apply(v, jnp.asarray(x)))

    t = torch.nn.ConvTranspose2d(3, 3, 4, stride=2, padding=1, groups=3,
                                 bias=False)
    with torch.no_grad():
        t.weight.copy_(torch.from_numpy(
            np.tile(_bilinear_kernel(4)[None, None], (3, 1, 1, 1))
        ))
        ref = t(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-5)


def test_dlaseg_modes():
    from yolov7_d2_tpu.models.backbones.dla import DLASeg
    out = _run(DLASeg(num_layers=34, out_features=("dla0", "dla1", "dla2")))
    assert out["dla0"].shape == (1, 16, 16, 64)  # stride 4, merged
    out = _run(DLASeg(num_layers=34, ms_output=True,
                      out_features=("dla2", "dla3", "dla4", "dla5")))
    assert out["dla2"].shape == (1, 16, 16, 64)
    assert out["dla5"].shape == (1, 2, 2, 512)
    # ms_output WITHOUT dla_up: the raw base levels dla0..dla5
    # (reference :502-505 st=0 branch; regression: used to IndexError)
    out = _run(DLASeg(num_layers=34, use_dla_up=False, ms_output=True,
                      out_features=tuple(f"dla{i}" for i in range(6))))
    assert out["dla0"].shape == (1, 64, 64, 16)
    assert out["dla5"].shape == (1, 2, 2, 512)


def test_fbnet():
    from yolov7_d2_tpu.models.backbones.mobile import FBNet
    out = _run(FBNet())
    assert set(out) == {"trunk2", "trunk3", "trunk4"}
    for f in out.values():
        assert np.all(np.isfinite(np.asarray(f)))


def test_mobilevit():
    from yolov7_d2_tpu.models.backbones.mobile import MobileViT
    out = _run(MobileViT(), size=128)
    assert set(out) == {"stage2", "stage3", "stage4"}


def test_fbnet_v3_arch_table_parity():
    """All 13 reference fbnet_v3.py arch tables resolve and run (incl. the
    no_se quantization variants, fbnet_v3.py:298-370)."""
    from yolov7_d2_tpu.models.backbones.mobile import FBNET_ARCH, FBNet

    expected = {
        "FBNetV3_A", "FBNetV3_B", "FBNetV3_C", "FBNetV3_D", "FBNetV3_E",
        "FBNetV3_F", "FBNetV3_G", "FBNetV3_H", "FBNetV3_A_dsmask",
        "FBNetV3_A_dsmask_tiny", "FBNetV3_A_no_se", "FBNetV3_B_no_se",
        "FBNetV3_B_light_no_se",
    }
    assert expected <= set(FBNET_ARCH)
    # no _se ops survive in the no_se tables
    for name in ("FBNetV3_A_no_se", "FBNetV3_B_no_se",
                 "FBNetV3_B_light_no_se"):
        ops = [b[0] for stage in FBNET_ARCH[name] for b in stage]
        assert not any(op.endswith("_se") for op in ops), name
    out = _run(FBNet(arch="FBNetV3_B_light_no_se"))
    assert set(out) == {"trunk2", "trunk3", "trunk4"}


def test_fbnet_v2_builtin_name_surface():
    """Every MODEL_ARCH_BUILTIN name the reference registers
    (fbnet_v3.py:420-530) resolves through MODEL.FBNET_V2.ARCH, including
    the trunk-alias names (default_dsmask, FBNetV3_B_light_large,
    FBNetV3_G_fpn) and the suffix forms (_C4/_C5)."""
    from yolov7_d2_tpu.models.backbones.mobile import resolve_fbnet_arch

    reference_names = [
        "default", "default_dsmask",
        "FBNetV3_A", "FBNetV3_B", "FBNetV3_C", "FBNetV3_D", "FBNetV3_E",
        "FBNetV3_F", "FBNetV3_G", "FBNetV3_H",
        "FBNetV3_A_dsmask_C5", "FBNetV3_A_dsmask", "FBNetV3_A_dsmask_tiny",
        "FBNetV3_B_light_large", "FBNetV3_G_fpn",
    ]
    for name in reference_names:
        key, out = resolve_fbnet_arch(name)
        assert key and out, name


def test_fbnet_default_matches_reference_default_stages():
    """The 'default' trunk is DEFAULT_STAGES verbatim (fbnet_v3.py:52-64):
    32-ch stem, 16 e1, 24x2/32x3 e6, 64x4+96x3 e6, 160x3+320 e6."""
    from yolov7_d2_tpu.models.backbones.mobile import FBNET_ARCH, FBNet

    assert FBNET_ARCH["default"] == [
        [("conv_k3", 32, 2, 1, 1), ("ir_k3", 16, 1, 1, 1)],
        [("ir_k3", 24, 2, 2, 6)],
        [("ir_k3", 32, 2, 3, 6)],
        [("ir_k3", 64, 2, 4, 6), ("ir_k3", 96, 1, 3, 6)],
        [("ir_k3", 160, 2, 3, 6), ("ir_k3", 320, 1, 1, 6)],
    ]
    assert FBNET_ARCH["default_dsmask"] == FBNET_ARCH["default"]
    out = _run(FBNet(arch="default", out_features=("trunk3",)))
    assert out["trunk3"].shape == (1, 4, 4, 96)  # stride 16, 96ch


def test_fbnet_v2_builder_primitives():
    """skip / ir_pool / _hs ops (the mobile_cv builder vocabulary the
    reference's ARCH_DEF dicts use) build and run; skip is identity when
    shape-preserving."""
    import jax
    import jax.numpy as jnp

    from yolov7_d2_tpu.models.backbones.mobile import FBNet

    stages = [
        [("conv_k3_hs", 16, 2, 1, 1)],
        [("ir_k3_hs", 24, 2, 1, 4), ("skip", 24, 1, 1, 1)],
        [("ir_k5_se_hs", 32, 2, 1, 4)],
        [("ir_pool", 64, 1, 1, 6)],
    ]
    m = FBNet(stages=stages, out_features=("trunk1", "trunk3"))
    x = jnp.ones((1, 64, 64, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(vars_, x)
    assert out["trunk1"].shape == (1, 16, 16, 24)
    assert out["trunk3"].shape == (1, 1, 1, 64)  # ir_pool collapses to 1x1
    # skip with matching channels+stride adds no params
    names = jax.tree_util.tree_leaves_with_path(vars_["params"])
    assert not any("s1_g1_b0" in jax.tree_util.keystr(p) for p, _ in names)


def test_fbnet_arch_def_literal_path():
    """MODEL.FBNET_V2.ARCH_DEF literal dicts (reference fbnet_v2.py:64-71)
    build a backbone: mobile_cv-format tuples with {"expansion": N} dicts
    and basic_args are normalized."""
    import jax
    import jax.numpy as jnp

    from yolov7_d2_tpu.config import get_cfg
    from yolov7_d2_tpu.models.backbones.mobile import build_fbnet_backbone

    cfg = get_cfg()
    cfg.MODEL.FBNET_V2.ARCH_DEF = [
        {"trunk": [
            [("conv_k3", 8, 2, 1)],
            [("ir_k3", 16, 2, 2, {"expansion": 4})],
            [("ir_k5", 24, 2, 1, {"expansion": 4}, {"less_se_channels": False})],
        ]},
        {"basic_args": {"dw_skip_bnrelu": True}},
    ]
    cfg.MODEL.FBNET_V2.OUT_FEATURES = ["trunk2"]
    m = build_fbnet_backbone(cfg)
    x = jnp.ones((1, 64, 64, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(vars_, x)
    assert out["trunk2"].shape == (1, 8, 8, 24)
