"""Mobile backbones: FBNetV2/V3-style inverted-residual nets and MobileViT.

Parity with /root/reference/yolov7/modeling/backbone/fbnet_v2.py /
fbnet_v3.py (``FBNetV2C4Backbone:307`` — d2go mobile_cv stacks of
quantization-friendly inverted residuals) and mobilevit.py (MobileViT
blocks; present-but-unwired in the reference — wired here).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolov7_d2_tpu.core.registry import BACKBONE_REGISTRY


class ConvBNAct(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    (self.stride, self.stride), padding=[(p, p), (p, p)],
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(x)
        return (nn.relu6(x) if self.act else x).astype(self.dtype)


def _round_channels(c: float, divisor: int = 8) -> int:
    new = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new < 0.9 * c:  # never round down by more than 10%
        new += divisor
    return new


class SqueezeExcite(nn.Module):
    """SE gate (fbnet_v2 ``ir_k*_se`` ops): global-avg pool -> reduce 1x1 ->
    relu -> expand 1x1 -> sigmoid -> scale. Reduction is 1/4 of the block's
    hidden width (mobile_cv default)."""

    se_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        s = nn.Conv(self.se_channels, (1, 1), dtype=jnp.float32,
                    name="reduce")(s)
        s = nn.relu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=jnp.float32, name="expand")(s)
        return (x * jax.nn.sigmoid(s)).astype(self.dtype)


class InvertedResidual(nn.Module):
    """IRF block (fbnet_v2.py mobile_cv IRFBlock): pw expand -> dw kxk ->
    [SE] -> pw project, residual when stride 1 and channels match.

    ``dw_skip_bnrelu`` (reference _BASIC_ARGS, fbnet_v3.py:36-40) omits the
    BN+relu after the depthwise conv — the quantization-friendly variant the
    reference trains with. Fractional expansions are rounded to the width
    divisor like mobile_cv's builder.
    """

    out_channels: int
    stride: int = 1
    expand: float = 6.0
    kernel: int = 3
    se: bool = False
    dw_skip_bnrelu: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        mid = _round_channels(inp * self.expand)
        y = x
        if mid != inp:
            y = ConvBNAct(mid, 1, dtype=self.dtype, name="expand")(y, train)
        if self.dw_skip_bnrelu:
            p = (self.kernel - 1) // 2
            y = nn.Conv(mid, (self.kernel, self.kernel),
                        (self.stride, self.stride), padding=[(p, p), (p, p)],
                        feature_group_count=mid, use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name="dw")(y)
        else:
            y = ConvBNAct(mid, self.kernel, self.stride, groups=mid,
                          dtype=self.dtype, name="dw")(y, train)
        if self.se:
            y = SqueezeExcite(_round_channels(mid / 4), dtype=self.dtype,
                              name="se")(y)
        y = ConvBNAct(self.out_channels, 1, act=False, dtype=self.dtype,
                      name="project")(y, train)
        if self.stride == 1 and inp == self.out_channels:
            y = y + x
        return y


# Stage tables: each stage is a list of (op, out_channels, stride, repeats,
# expansion) groups; the first block of a group takes the stride, repeats run
# at stride 1. op in {conv_k3, ir_k3, ir_k5, ir_k3_se, ir_k5_se}. These are
# the published FBNetV3 architecture hyperparameters
# (/root/reference/yolov7/modeling/backbone/fbnet_v3.py:67-296, from
# facebookresearch/mobile_cv), re-expressed as data.
FBNET_ARCH = {
    # FBNet-ish default (kept for MODEL.FBNET_V2.ARCH="default" back-compat)
    "default": [
        [("conv_k3", 16, 2, 1, 1), ("ir_k3", 16, 1, 1, 1)],
        [("ir_k3", 24, 2, 2, 6)],
        [("ir_k3", 32, 2, 3, 6)],
        [("ir_k3", 64, 2, 3, 6), ("ir_k3", 112, 1, 2, 6)],
        [("ir_k3", 184, 2, 3, 6)],
    ],
    "FBNetV3_A_dsmask": [
        [("conv_k3", 16, 2, 1, 1), ("ir_k3", 16, 1, 1, 1)],
        [("ir_k5", 32, 2, 1, 4), ("ir_k5", 32, 1, 1, 2)],
        [("ir_k5", 40, 2, 1, 4), ("ir_k3", 40, 1, 3, 3)],
        [("ir_k5", 72, 2, 1, 4), ("ir_k3", 72, 1, 3, 3),
         ("ir_k5", 112, 1, 1, 4), ("ir_k5", 112, 1, 3, 4)],
        [("ir_k5", 184, 2, 1, 4), ("ir_k3", 184, 1, 4, 4),
         ("ir_k5", 200, 1, 1, 6)],
    ],
    "FBNetV3_A_dsmask_tiny": [
        [("conv_k3", 8, 2, 1, 1), ("ir_k3", 8, 1, 1, 1)],
        [("ir_k5", 16, 2, 1, 3), ("ir_k5", 16, 1, 1, 2)],
        [("ir_k5", 24, 2, 1, 4), ("ir_k3", 24, 1, 2, 3)],
        [("ir_k5", 40, 2, 1, 4), ("ir_k3", 40, 1, 2, 3),
         ("ir_k5", 64, 1, 1, 4), ("ir_k5", 64, 1, 2, 3)],
        [("ir_k5", 92, 2, 1, 4), ("ir_k3", 92, 1, 2, 4),
         ("ir_k5", 92, 1, 1, 6)],
    ],
    "FBNetV3_A": [
        [("conv_k3", 16, 2, 1, 1), ("ir_k3", 16, 1, 2, 1)],
        [("ir_k5", 24, 2, 1, 4), ("ir_k5", 24, 1, 3, 3)],
        [("ir_k5_se", 32, 2, 1, 4), ("ir_k3_se", 32, 1, 3, 3)],
        [("ir_k5", 64, 2, 1, 4), ("ir_k3", 64, 1, 3, 3),
         ("ir_k5_se", 112, 1, 1, 4), ("ir_k5_se", 112, 1, 5, 3)],
        [("ir_k5_se", 184, 2, 1, 4), ("ir_k3_se", 184, 1, 4, 4),
         ("ir_k5_se", 200, 1, 1, 6)],
    ],
    "FBNetV3_B": [
        [("conv_k3", 16, 2, 1, 1), ("ir_k3", 16, 1, 2, 1)],
        [("ir_k5", 24, 2, 1, 4), ("ir_k5", 24, 1, 3, 2)],
        [("ir_k5_se", 40, 2, 1, 5), ("ir_k5_se", 40, 1, 4, 3)],
        [("ir_k5", 72, 2, 1, 5), ("ir_k3", 72, 1, 4, 3),
         ("ir_k3_se", 120, 1, 1, 5), ("ir_k5_se", 120, 1, 5, 3)],
        [("ir_k3_se", 184, 2, 1, 6), ("ir_k5_se", 184, 1, 5, 4),
         ("ir_k5_se", 224, 1, 1, 6)],
    ],
    "FBNetV3_C": [
        [("conv_k3", 16, 2, 1, 1), ("ir_k3", 16, 1, 2, 1)],
        [("ir_k5", 24, 2, 1, 5), ("ir_k3", 24, 1, 4, 3)],
        [("ir_k5_se", 48, 2, 1, 5), ("ir_k5_se", 48, 1, 4, 2)],
        [("ir_k5", 88, 2, 1, 4), ("ir_k3", 88, 1, 4, 3),
         ("ir_k3_se", 120, 1, 1, 4), ("ir_k5_se", 120, 1, 5, 3)],
        [("ir_k5_se", 216, 2, 1, 5), ("ir_k5_se", 216, 1, 5, 5),
         ("ir_k5_se", 216, 1, 1, 6)],
    ],
    "FBNetV3_D": [
        [("conv_k3", 24, 2, 1, 1), ("ir_k3", 16, 1, 2, 1)],
        [("ir_k3", 24, 2, 1, 5), ("ir_k3", 24, 1, 5, 2)],
        [("ir_k5_se", 40, 2, 1, 4), ("ir_k3_se", 40, 1, 4, 3)],
        [("ir_k3", 72, 2, 1, 5), ("ir_k3", 72, 1, 4, 3),
         ("ir_k3_se", 128, 1, 1, 5), ("ir_k5_se", 128, 1, 6, 3)],
        [("ir_k3_se", 208, 2, 1, 6), ("ir_k5_se", 208, 1, 5, 5),
         ("ir_k5_se", 240, 1, 1, 6)],
    ],
    "FBNetV3_E": [
        [("conv_k3", 24, 2, 1, 1), ("ir_k3", 16, 1, 3, 1)],
        [("ir_k5", 24, 2, 1, 4), ("ir_k5", 24, 1, 4, 2)],
        [("ir_k5_se", 48, 2, 1, 4), ("ir_k5_se", 48, 1, 4, 3)],
        [("ir_k5", 80, 2, 1, 5), ("ir_k3", 80, 1, 4, 3),
         ("ir_k3_se", 128, 1, 1, 5), ("ir_k5_se", 128, 1, 7, 3)],
        [("ir_k3_se", 216, 2, 1, 6), ("ir_k5_se", 216, 1, 5, 5),
         ("ir_k5_se", 240, 1, 1, 6)],
    ],
    "FBNetV3_F": [
        [("conv_k3", 24, 2, 1, 1), ("ir_k3", 24, 1, 3, 1)],
        [("ir_k5", 32, 2, 1, 4), ("ir_k5", 32, 1, 4, 2)],
        [("ir_k5_se", 56, 2, 1, 4), ("ir_k5_se", 56, 1, 4, 3)],
        [("ir_k5", 88, 2, 1, 5), ("ir_k3", 88, 1, 4, 3),
         ("ir_k3_se", 144, 1, 1, 5), ("ir_k5_se", 144, 1, 8, 3)],
        [("ir_k3_se", 248, 2, 1, 6), ("ir_k5_se", 248, 1, 6, 5),
         ("ir_k5_se", 272, 1, 1, 6)],
    ],
    "FBNetV3_G": [
        [("conv_k3", 32, 2, 1, 1), ("ir_k3", 24, 1, 3, 1)],
        [("ir_k5", 40, 2, 1, 4), ("ir_k5", 40, 1, 4, 2)],
        [("ir_k5_se", 56, 2, 1, 4), ("ir_k5_se", 56, 1, 4, 3)],
        [("ir_k5", 104, 2, 1, 5), ("ir_k3", 104, 1, 4, 3),
         ("ir_k3_se", 160, 1, 1, 5), ("ir_k5_se", 160, 1, 8, 3)],
        [("ir_k3_se", 264, 2, 1, 6), ("ir_k5_se", 264, 1, 6, 5),
         ("ir_k5_se", 288, 1, 2, 6)],
    ],
    "FBNetV3_H": [
        [("conv_k3", 48, 2, 1, 1), ("ir_k3", 32, 1, 4, 1)],
        [("ir_k5", 64, 2, 1, 4), ("ir_k5", 64, 1, 6, 2)],
        [("ir_k5_se", 80, 2, 1, 4), ("ir_k5_se", 80, 1, 6, 3)],
        [("ir_k5", 160, 2, 1, 5), ("ir_k3", 160, 1, 6, 3),
         ("ir_k3_se", 240, 1, 1, 5), ("ir_k5_se", 240, 1, 12, 3)],
        [("ir_k3_se", 400, 2, 1, 6), ("ir_k5_se", 400, 1, 8, 5),
         ("ir_k5_se", 480, 1, 3, 6)],
    ],
    # quantization-friendly variant (reference fbnet_v3.py:347): B with a
    # shorter stage-2/3 schedule and no SE anywhere
    "FBNetV3_B_light_no_se": [
        [("conv_k3", 16, 2, 1, 1), ("ir_k3", 16, 1, 2, 1)],
        [("ir_k5", 24, 2, 1, 4), ("ir_k5", 24, 1, 2, 2)],
        [("ir_k5", 40, 2, 1, 5), ("ir_k5", 40, 1, 3, 3)],
        [("ir_k5", 72, 2, 1, 5), ("ir_k3", 72, 1, 4, 3),
         ("ir_k3", 120, 1, 1, 5), ("ir_k5", 120, 1, 5, 3)],
        [("ir_k3", 184, 2, 1, 6), ("ir_k5", 184, 1, 5, 4),
         ("ir_k5", 224, 1, 1, 6)],
    ],
}

# SE-free variants (reference fbnet_v3.py:298,322 — "SE is not
# quantization friendly"): identical stage tables with the _se ops demoted
for _src in ("FBNetV3_A", "FBNetV3_B"):
    FBNET_ARCH[f"{_src}_no_se"] = [
        [(op.replace("_se", ""), c, s, n, e) for (op, c, s, n, e) in stage]
        for stage in FBNET_ARCH[_src]
    ]


def resolve_fbnet_arch(name: str) -> Tuple[str, Tuple[str, ...]]:
    """Resolve an ARCH name like ``FBNetV3_A_dsmask_C5`` into a stage-table
    key and default out_features (``_C5`` -> through trunk4 @ stride 32,
    ``_C4`` -> trunk3 @ stride 16 — d2go's C4/C5 trunk split)."""
    out: Tuple[str, ...] = ("trunk2", "trunk3", "trunk4")
    if name.endswith("_C5"):
        name, out = name[:-3], ("trunk4",)
    elif name.endswith("_C4"):
        name, out = name[:-3], ("trunk3",)
    if name not in FBNET_ARCH:
        raise KeyError(
            f"unknown FBNet arch '{name}'; available: {sorted(FBNET_ARCH)}"
        )
    return name, out


class FBNet(nn.Module):
    """FBNetV2/V3 trunk built from a stage table. Stage i's output is
    ``trunk{i}`` (stride ``2**(i+1)``)."""

    arch: str = "default"
    out_features: Sequence[str] = ("trunk2", "trunk3", "trunk4")
    scale_factor: float = 1.0
    dw_skip_bnrelu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        stages = FBNET_ARCH[self.arch]
        outputs: Dict[str, jnp.ndarray] = {}
        for si, stage in enumerate(stages):
            for gi, (op, c, s, n, e) in enumerate(stage):
                c = _round_channels(c * self.scale_factor)
                for bi in range(n):
                    stride = s if bi == 0 else 1
                    name = f"s{si}_g{gi}_b{bi}"
                    if op == "conv_k3":
                        x = ConvBNAct(c, 3, stride, dtype=self.dtype,
                                      name=name)(x, train)
                    else:
                        kernel = int(op.split("_k")[1][0])
                        x = InvertedResidual(
                            c, stride, e, kernel, se=op.endswith("_se"),
                            dw_skip_bnrelu=self.dw_skip_bnrelu,
                            dtype=self.dtype, name=name,
                        )(x, train)
            outputs[f"trunk{si}"] = x
        return {k: v for k, v in outputs.items() if k in self.out_features}


class MobileViTBlock(nn.Module):
    """Local conv rep + unfolded transformer over patches + fusion."""

    dim: int
    depth: int = 2
    patch: int = 2
    num_heads: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        y = ConvBNAct(inp, 3, dtype=self.dtype, name="local_conv")(x, train)
        y = nn.Conv(self.dim, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="proj_in")(y)
        b, h, w, c = y.shape
        p = self.patch
        # unfold to (patch-position, tokens) and attend across patches
        t = y.reshape(b, h // p, p, w // p, p, c)
        t = t.transpose(0, 2, 4, 1, 3, 5).reshape(b * p * p, -1, c)
        for i in range(self.depth):
            a = nn.LayerNorm(dtype=jnp.float32, name=f"norm1_{i}")(t).astype(
                self.dtype
            )
            a = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, dtype=self.dtype,
                param_dtype=jnp.float32, deterministic=True,
                name=f"attn_{i}",
            )(a, a, inputs_v=a)
            t = t + a
            m = nn.LayerNorm(dtype=jnp.float32, name=f"norm2_{i}")(t).astype(
                self.dtype
            )
            m = nn.Dense(self.dim * 2, dtype=self.dtype,
                         param_dtype=jnp.float32, name=f"mlp1_{i}")(m)
            m = nn.silu(m)
            m = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"mlp2_{i}")(m)
            t = t + m
        y = t.reshape(b, p, p, h // p, w // p, c)
        y = y.transpose(0, 3, 1, 4, 2, 5).reshape(b, h, w, c)
        y = nn.Conv(inp, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="proj_out")(y)
        y = jnp.concatenate([x, y], axis=-1)
        return ConvBNAct(inp, 3, dtype=self.dtype, name="fusion")(y, train)


class MobileViT(nn.Module):
    out_features: Sequence[str] = ("stage2", "stage3", "stage4")
    dtype: Any = jnp.float32

    # (channels, type, transformer_dim) per stage — MobileViT-S-ish plan
    plan: Tuple = (
        (32, "mv2", 0), (64, "mv2", 0), (96, "vit", 144),
        (128, "vit", 192), (160, "vit", 240),
    )

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        x = ConvBNAct(16, 3, 2, dtype=self.dtype, name="stem")(x, train)
        outputs: Dict[str, jnp.ndarray] = {}
        for i, (c, kind, tdim) in enumerate(self.plan):
            x = InvertedResidual(c, 2, 4, dtype=self.dtype,
                                 name=f"down_{i}")(x, train)
            if kind == "vit":
                x = MobileViTBlock(tdim, dtype=self.dtype,
                                   name=f"vit_{i}")(x, train)
            outputs[f"stage{i}"] = x
        return {k: v for k, v in outputs.items() if k in self.out_features}


@BACKBONE_REGISTRY.register()
def build_fbnet_backbone(cfg, dtype=jnp.float32):
    arch, default_out = resolve_fbnet_arch(cfg.MODEL.FBNET_V2.ARCH)
    out = tuple(cfg.MODEL.FBNET_V2.OUT_FEATURES) or default_out
    # a C4/C5-suffixed ARCH overrides the generic OUT_FEATURES default
    if cfg.MODEL.FBNET_V2.ARCH.endswith(("_C4", "_C5")):
        out = default_out
    return FBNet(
        arch=arch,
        out_features=out,
        scale_factor=cfg.MODEL.FBNET_V2.SCALE_FACTOR,
        dtype=dtype,
    )


@BACKBONE_REGISTRY.register()
def build_mobilevit_backbone(cfg, dtype=jnp.float32):
    return MobileViT(dtype=dtype)


@BACKBONE_REGISTRY.register()
def build_cspresnet50d_backbone(cfg, dtype=jnp.float32):
    """CSPResNet50d (reference cspresnet.py:10 thin timm wrapper) — mapped
    to our ResNet-vd (the 'd' stem variant is exactly resnet-vd)."""
    from yolov7_d2_tpu.models.backbones.resnet import ResNet

    return ResNet(
        depth=50, vd=True,
        out_features=tuple(cfg.MODEL.RESNETS.OUT_FEATURES),
        frozen_bn=False, dtype=dtype,
    )
