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
from ..layers.norm import BatchNorm


def _apply_act(x, act) -> jnp.ndarray:
    """act: True/"relu6" (mobile default), "hswish" (the _hs op variants),
    False/"none"."""
    if act is True or act == "relu6":
        return nn.relu6(x)
    if act == "hswish":
        return x * nn.relu6(x + 3.0) / 6.0
    return x


class ConvBNAct(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: Any = True  # True/"relu6" | "hswish" | False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = (self.kernel - 1) // 2
        if self.stride < 0:  # mobile_cv negative stride: 2x upsample
            f = -self.stride
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, h * f, w * f, c), "nearest")
            stride = 1
        else:
            stride = self.stride
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    (stride, stride), padding=[(p, p), (p, p)],
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)
        x = BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(x)
        return _apply_act(x, self.act).astype(self.dtype)


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
    act: Any = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        mid = _round_channels(inp * self.expand)
        y = x
        if mid != inp:
            y = ConvBNAct(mid, 1, act=self.act, dtype=self.dtype,
                          name="expand")(y, train)
        if self.stride < 0:  # mobile_cv upsample op (head stages use -2)
            f = -self.stride
            b, h, w, c = y.shape
            y = jax.image.resize(y, (b, h * f, w * f, c), "nearest")
            stride = 1
        else:
            stride = self.stride
        if self.dw_skip_bnrelu:
            p = (self.kernel - 1) // 2
            y = nn.Conv(mid, (self.kernel, self.kernel),
                        (stride, stride), padding=[(p, p), (p, p)],
                        feature_group_count=mid, use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name="dw")(y)
        else:
            y = ConvBNAct(mid, self.kernel, stride, groups=mid,
                          act=self.act, dtype=self.dtype, name="dw")(y, train)
        if self.se:
            y = SqueezeExcite(_round_channels(mid / 4), dtype=self.dtype,
                              name="se")(y)
        y = ConvBNAct(self.out_channels, 1, act=False, dtype=self.dtype,
                      name="project")(y, train)
        if self.stride == 1 and inp == self.out_channels:
            y = y + x
        return y


class IRPool(nn.Module):
    """mobile_cv ``ir_pool`` head op: pw expand -> global average pool ->
    activation -> pw project. Collapses the spatial map to 1x1 (used as the
    final classification-head op in FBNetV2 arch defs)."""

    out_channels: int
    expand: float = 6.0
    act: Any = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        mid = _round_channels(inp * self.expand)
        y = ConvBNAct(mid, 1, act=self.act, dtype=self.dtype,
                      name="expand")(x, train)
        y = jnp.mean(y.astype(jnp.float32), axis=(1, 2), keepdims=True)
        y = _apply_act(y, self.act).astype(self.dtype)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=True,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="project")(y)
        return y


class SkipOp(nn.Module):
    """mobile_cv ``skip`` op: identity when shape-preserving, otherwise a
    1x1 conv+BN bridge (channel or stride change)."""

    out_channels: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.stride == 1 and x.shape[-1] == self.out_channels:
            return x
        return ConvBNAct(self.out_channels, 1, self.stride, act=False,
                         dtype=self.dtype, name="bridge")(x, train)


# Stage tables: each stage is a list of (op, out_channels, stride, repeats,
# expansion) groups; the first block of a group takes the stride, repeats run
# at stride 1. op in {conv_k3, ir_k3, ir_k5, ir_k3_se, ir_k5_se}. These are
# the published FBNetV3 architecture hyperparameters
# (/root/reference/yolov7/modeling/backbone/fbnet_v3.py:67-296, from
# facebookresearch/mobile_cv), re-expressed as data.
FBNET_ARCH = {
    # the reference's "default"/"default_dsmask" trunk — DEFAULT_STAGES
    # verbatim (fbnet_v3.py:52-64; the MobileNetV2-like FBNetV2-builder
    # default). Stages 0-3 are the detection trunk there ([0:4]); stage 4
    # (160/320 e6) is DEFAULT_STAGES' "resolution stage 4", exposed here as
    # trunk4 for stride-32 consumers.
    "default": [
        [("conv_k3", 32, 2, 1, 1), ("ir_k3", 16, 1, 1, 1)],
        [("ir_k3", 24, 2, 2, 6)],
        [("ir_k3", 32, 2, 3, 6)],
        [("ir_k3", 64, 2, 4, 6), ("ir_k3", 96, 1, 3, 6)],
        [("ir_k3", 160, 2, 3, 6), ("ir_k3", 320, 1, 1, 6)],
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

# the remaining MODEL_ARCH_BUILTIN trunk names (reference fbnet_v3.py:420-527)
# — every reference MODEL.FBNET_V2.ARCH value now resolves:
# "default_dsmask" shares the default trunk (:429-436), "FBNetV3_B_light_large"
# is the light-no-SE trunk (:512-519), "FBNetV3_G_fpn" is the full 5-stage G
# trunk (:520-527).
FBNET_ARCH["default_dsmask"] = FBNET_ARCH["default"]
FBNET_ARCH["FBNetV3_B_light_large"] = FBNET_ARCH["FBNetV3_B_light_no_se"]
FBNET_ARCH["FBNetV3_G_fpn"] = FBNET_ARCH["FBNetV3_G"]


def normalize_arch_def(arch_def) -> list:
    """Normalize a reference-style ARCH_DEF (mobile_cv block tuples, e.g.
    ``("ir_k5", 40, 2, 1, {"expansion": 4}, {...})``) into this module's
    ``(op, channels, stride, repeats, expansion)`` rows. Supports the cfg
    literal-dict path (reference fbnet_v2.py:64-71 _merge_fbnetv2_arch_def):
    pass the merged dict's "trunk" list."""
    stages = []
    for stage in arch_def:
        rows = []
        for blk in stage:
            blk = list(blk)
            op, c, s = blk[0], int(blk[1]), int(blk[2])
            n = int(blk[3]) if len(blk) > 3 else 1
            e = 6.0
            for extra in blk[4:]:
                if isinstance(extra, dict):
                    if "expansion" in extra:
                        e = float(extra["expansion"])
                elif isinstance(extra, (int, float)):
                    e = float(extra)
            rows.append((op, c, s, n, e))
        stages.append(rows)
    return stages


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


def _parse_op(op: str):
    """``ir_k5_se_hs`` -> (base, kernel, se, act). Base ops: conv_k{1,3,5},
    ir_k{3,5}, skip, ir_pool; modifiers: _se (squeeze-excite), _hs
    (hard-swish) — the mobile_cv builder-op vocabulary the reference's
    ARCH_DEF dicts draw from."""
    act: Any = True
    if op.endswith("_hs"):
        act, op = "hswish", op[:-3]
    se = False
    if op.endswith("_se"):
        se, op = True, op[:-3]
    if op in ("skip", "ir_pool"):
        return op, 0, se, act
    base, _, k = op.rpartition("_k")
    if base not in ("conv", "ir") or not k.isdigit():
        raise ValueError(f"unknown FBNet builder op '{op}'")
    return base, int(k), se, act


class FBNet(nn.Module):
    """FBNetV2/V3 trunk built from a stage table. Stage i's output is
    ``trunk{i}`` (stride ``2**(i+1)``). ``stages`` overrides the named
    table (the MODEL.FBNET_V2.ARCH_DEF literal path); only stages feeding
    a requested out_feature are built, so the parameter surface matches
    the reference's per-arch trunk split (e.g. trunk=[0:4])."""

    arch: str = "default"
    out_features: Sequence[str] = ("trunk2", "trunk3", "trunk4")
    scale_factor: float = 1.0
    dw_skip_bnrelu: bool = True
    stages: Any = None  # optional explicit stage table (normalized rows)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        stages = self.stages if self.stages is not None else FBNET_ARCH[self.arch]
        wanted = {int(f[5:]) for f in self.out_features}
        last = max(wanted)
        outputs: Dict[str, jnp.ndarray] = {}
        for si, stage in enumerate(stages):
            if si > last:
                break
            for gi, (op, c, s, n, e) in enumerate(stage):
                base, kernel, se, act = _parse_op(op)
                c = _round_channels(c * self.scale_factor)
                for bi in range(n):
                    stride = s if bi == 0 else 1
                    name = f"s{si}_g{gi}_b{bi}"
                    if base == "conv":
                        x = ConvBNAct(c, kernel, stride, act=act,
                                      dtype=self.dtype, name=name)(x, train)
                    elif base == "skip":
                        x = SkipOp(c, stride, dtype=self.dtype,
                                   name=name)(x, train)
                    elif base == "ir_pool":
                        x = IRPool(c, e, act=act, dtype=self.dtype,
                                   name=name)(x, train)
                    else:
                        x = InvertedResidual(
                            c, stride, e, kernel, se=se,
                            dw_skip_bnrelu=self.dw_skip_bnrelu, act=act,
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
    arch_def = list(cfg.MODEL.FBNET_V2.get("ARCH_DEF", []))
    if arch_def:
        # reference fbnet_v2.py:64-71: ARCH_DEF is a list of dicts merged
        # into one arch dict; its "trunk" is the backbone stage table
        merged: dict = {}
        for d in arch_def:
            merged.update(d)
        basic = merged.get("basic_args", {})
        return FBNet(
            stages=normalize_arch_def(merged["trunk"]),
            out_features=tuple(cfg.MODEL.FBNET_V2.OUT_FEATURES),
            scale_factor=cfg.MODEL.FBNET_V2.SCALE_FACTOR,
            dw_skip_bnrelu=bool(basic.get("dw_skip_bnrelu", True)),
            dtype=dtype,
        )
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


@BACKBONE_REGISTRY.register(name="FBNetV2C4Backbone")
def build_fbnet_c4_backbone(cfg, dtype=jnp.float32):
    """The reference's registry name for the plain FBNet trunk
    (fbnet_v2.py:302-310 FBNetV2C4Backbone wraps build_fbnet_backbone)."""
    return build_fbnet_backbone(cfg, dtype=dtype)


class _FBNetFPN(nn.Module):
    """FBNet trunk + FPN over MODEL.FPN.IN_FEATURES (reference
    FBNetV2FpnBackbone, fbnet_v2.py:321-331)."""

    trunk: Any
    in_features: Sequence[str] = ("trunk1", "trunk2", "trunk3", "trunk4")
    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        from yolov7_d2_tpu.models.necks.fpn import FPN

        feats = self.trunk(x, train)
        # trunk{i} has stride 2**(i+1) -> FPN level p{i+1}
        first = int(self.in_features[0][5:]) + 1
        return FPN(
            out_channels=self.out_channels, first_level=first,
            dtype=self.dtype, name="fpn",
        )([feats[f] for f in self.in_features], train)


@BACKBONE_REGISTRY.register(name="FBNetV2FpnBackbone")
def build_fbnet_fpn_backbone(cfg, dtype=jnp.float32):
    in_features = tuple(cfg.MODEL.FPN.IN_FEATURES) or (
        "trunk1", "trunk2", "trunk3", "trunk4"
    )
    if not all(f.startswith("trunk") for f in in_features):
        in_features = ("trunk1", "trunk2", "trunk3", "trunk4")
    arch, _ = resolve_fbnet_arch(cfg.MODEL.FBNET_V2.ARCH)
    trunk = FBNet(
        arch=arch, out_features=in_features,
        scale_factor=cfg.MODEL.FBNET_V2.SCALE_FACTOR,
        dtype=dtype, name="bottom_up",
    )
    return _FBNetFPN(
        trunk=trunk, in_features=in_features,
        out_channels=cfg.MODEL.FPN.OUT_CHANNELS, dtype=dtype,
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
