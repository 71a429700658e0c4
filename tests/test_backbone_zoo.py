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
    feats = _pyramid()
    v = neck.init(jax.random.PRNGKey(0), feats)
    outs = neck.apply(v, feats)
    assert len(outs) == 5
    assert outs[0].shape == (1, 8, 8, 32)
    assert outs[3].shape == (1, 1, 1, 32)   # P6
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
    from yolov7_d2_tpu.models.backbones.dla import DLA, DLAUp
    out = _run(DLA(depth=34))
    assert out["level3"].shape == (1, 8, 8, 128)
    assert out["level4"].shape == (1, 4, 4, 256)
    assert out["level5"].shape == (1, 2, 2, 512)
    up = DLAUp(channels=32)
    feats = [out["level3"], out["level4"], out["level5"]]
    v = up.init(jax.random.PRNGKey(0), feats)
    outs = up.apply(v, feats)
    assert outs[0].shape == (1, 8, 8, 32)


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
