"""Mobile backbones: FBNetV2/V3-style inverted-residual nets and MobileViT.

Parity with /root/reference/yolov7/modeling/backbone/fbnet_v2.py /
fbnet_v3.py (``FBNetV2C4Backbone:307`` — d2go mobile_cv stacks of
quantization-friendly inverted residuals) and mobilevit.py (MobileViT
blocks; present-but-unwired in the reference — wired here).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

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


class InvertedResidual(nn.Module):
    out_channels: int
    stride: int = 1
    expand: int = 6
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        mid = inp * self.expand
        y = x
        if self.expand != 1:
            y = ConvBNAct(mid, 1, dtype=self.dtype, name="expand")(y, train)
        y = ConvBNAct(mid, self.kernel, self.stride, groups=mid,
                      dtype=self.dtype, name="dw")(y, train)
        y = ConvBNAct(self.out_channels, 1, act=False, dtype=self.dtype,
                      name="project")(y, train)
        if self.stride == 1 and inp == self.out_channels:
            y = y + x
        return y


# (expand, channels, repeats, stride) per stage — FBNet-ish default arch
FBNET_ARCH = {
    "default": [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2),
                (6, 64, 3, 2), (6, 112, 2, 1), (6, 184, 3, 2)],
}


class FBNet(nn.Module):
    arch: str = "default"
    out_features: Sequence[str] = ("trunk2", "trunk3", "trunk4")
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        x = ConvBNAct(16, 3, 2, dtype=self.dtype, name="stem")(x, train)
        outputs: Dict[str, jnp.ndarray] = {}
        trunk = 0
        for si, (e, c, n, s) in enumerate(FBNET_ARCH[self.arch]):
            for i in range(n):
                if (s if i == 0 else 1) == 2:
                    outputs[f"trunk{trunk}"] = x
                    trunk += 1
                x = InvertedResidual(c, s if i == 0 else 1, e,
                                     dtype=self.dtype,
                                     name=f"s{si}_b{i}")(x, train)
        outputs[f"trunk{trunk}"] = x
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
    return FBNet(
        arch=cfg.MODEL.FBNET_V2.ARCH,
        out_features=tuple(cfg.MODEL.FBNET_V2.OUT_FEATURES),
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
