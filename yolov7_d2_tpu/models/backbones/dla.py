"""DLA (deep layer aggregation) backbone + DLAUp/IDAUp decoders.

Parity with /root/reference/yolov7/modeling/backbone/dla.py (CenterNet
flavor: ``Tree:136`` with children-threading aggregation, ``DLA:194``,
``IDAUp:309`` / ``DLAUp:336`` built on modulated deformable convs
(``_DeformConv:271``) and grouped bilinear-initialized transposed-conv
upsampling (``fill_up_weights:259``), ``DLASeg:368``,
``build_dla_backbone:430``) and dlafpn.py (``build_dla_fpn3_backbone:423``
FPN variants).

TPU-native notes: the DCN sampling runs through the gather/bilinear
formulation in ``ops/deform_conv.py`` (1x1-matmul tap fuse on the MXU);
the learnable bilinear upsample is a depthwise ``lhs_dilation`` conv
(identical math to torch's grouped ConvTranspose2d k=2f, s=f, p=f//2).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from yolov7_d2_tpu.core.registry import BACKBONE_REGISTRY
from yolov7_d2_tpu.models.backbones.resnet import ConvBN
from yolov7_d2_tpu.ops.deform_conv import DeformConv
from ..layers.norm import BatchNorm

# num_layers -> (levels, channels, block) (reference dla.py DLA_CONFIGS:363)
DLA_SPECS = {
    34: ((1, 1, 1, 2, 2, 1), (16, 32, 64, 128, 256, 512), "basic"),
    60: ((1, 1, 1, 2, 3, 1), (16, 32, 128, 256, 512, 1024), "bottleneck"),
}


class BasicBlock(nn.Module):
    """3x3 -> 3x3 residual block (reference dla.py:43)."""

    channels: int
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        p = self.dilation
        y = nn.Conv(self.channels, (3, 3), (self.stride, self.stride),
                    padding=[(p, p), (p, p)],
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(x)
        y = BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), (1, 1),
                    padding=[(p, p), (p, p)],
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv2")(y)
        y = BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="bn2")(y)
        return nn.relu(y + residual).astype(self.dtype)


class BottleneckBlock(nn.Module):
    """1x1 -> 3x3 -> 1x1 with expansion 2 (reference dla.py:74)."""

    channels: int
    stride: int = 1
    dilation: int = 1
    expansion: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        mid = self.channels // self.expansion
        y = ConvBN(mid, 1, 1, frozen_bn=False, dtype=self.dtype,
                   name="conv1")(x, train)
        p = self.dilation
        y = nn.Conv(mid, (3, 3), (self.stride, self.stride),
                    padding=[(p, p), (p, p)],
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv2")(y)
        y = BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="bn2")(y)
        y = nn.relu(y)
        y = ConvBN(self.channels, 1, 1, act=False, frozen_bn=False,
                   dtype=self.dtype, name="conv3")(y, train)
        return nn.relu(y + residual).astype(self.dtype)


def _block(kind: str):
    return BasicBlock if kind == "basic" else BottleneckBlock


class Root(nn.Module):
    """Aggregation node (reference dla.py:115): concat children ->
    1x1 conv-BN (+ residual to the first child) -> relu."""

    channels: int
    residual: bool = False
    kernel: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, children: Sequence[jnp.ndarray], train: bool = False):
        x = jnp.concatenate(children, axis=-1)
        x = ConvBN(self.channels, self.kernel, 1, act=False, frozen_bn=False,
                   dtype=self.dtype, name="conv")(x, train)
        if self.residual:
            x = x + children[0]
        return nn.relu(x).astype(self.dtype)


class Tree(nn.Module):
    """Hierarchical aggregation tree (reference dla.py:136).

    Children-threading parity: at ``level_root`` stages the strided input
    (``bottom``) joins the aggregation list; for levels > 1 the left
    subtree's output is appended and the RIGHT subtree's root consumes
    the accumulated list (reference forward:178-192).
    """

    levels: int
    block: str
    channels: int
    stride: int = 1
    level_root: bool = False
    root_residual: bool = False
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, children: Optional[List] = None,
                 train: bool = False):
        children = [] if children is None else list(children)
        if self.stride > 1:
            bottom = nn.max_pool(
                x, (self.stride, self.stride), (self.stride, self.stride)
            )
        else:
            bottom = x
        if bottom.shape[-1] != self.channels:
            residual = ConvBN(self.channels, 1, 1, act=False,
                              frozen_bn=False, dtype=self.dtype,
                              name="project")(bottom, train)
        else:
            residual = bottom
        if self.level_root:
            children.append(bottom)

        blk = _block(self.block)
        if self.levels == 1:
            x1 = blk(self.channels, self.stride, self.dilation,
                     dtype=self.dtype, name="tree1")(x, residual, train)
            x2 = blk(self.channels, 1, self.dilation, dtype=self.dtype,
                     name="tree2")(x1, None, train)
            return Root(self.channels, self.root_residual, dtype=self.dtype,
                        name="root")([x2, x1] + children, train)
        x1 = Tree(self.levels - 1, self.block, self.channels, self.stride,
                  root_residual=self.root_residual, dilation=self.dilation,
                  dtype=self.dtype, name="tree1")(x, residual, None, train)
        children.append(x1)
        return Tree(self.levels - 1, self.block, self.channels, 1,
                    root_residual=self.root_residual, dilation=self.dilation,
                    dtype=self.dtype, name="tree2")(x1, None, children, train)


class DLA(nn.Module):
    """DLA trunk (reference dla.py:194): 7x7 base, two conv levels, four
    tree stages (level_root on stages 3-5). Returns level0..level5."""

    depth: int = 34
    out_features: Sequence[str] = ("level3", "level4", "level5")
    residual_root: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        levels, channels, block = DLA_SPECS[self.depth]
        x = ConvBN(channels[0], 7, 1, frozen_bn=False, dtype=self.dtype,
                   name="base")(x, train)
        outputs: Dict[str, jnp.ndarray] = {}
        # level0/1: plain conv stacks (_make_conv_level:240)
        for c in range(levels[0]):
            x = ConvBN(channels[0], 3, 1, frozen_bn=False, dtype=self.dtype,
                       name=f"level0_{c}")(x, train)
        outputs["level0"] = x
        for c in range(levels[1]):
            x = ConvBN(channels[1], 3, 2 if c == 0 else 1, frozen_bn=False,
                       dtype=self.dtype, name=f"level1_{c}")(x, train)
        outputs["level1"] = x
        for i in range(2, 6):
            x = Tree(levels[i], block, channels[i], stride=2,
                     level_root=(i >= 3), root_residual=self.residual_root,
                     dtype=self.dtype, name=f"level{i}")(
                x, None, None, train
            )
            outputs[f"level{i}"] = x
        return {k: v for k, v in outputs.items() if k in self.out_features}


def _bilinear_kernel(k: int) -> np.ndarray:
    """fill_up_weights (reference dla.py:259): separable bilinear taps."""
    f = math.ceil(k / 2)
    c = (2 * f - 1 - f % 2) / (2.0 * f)
    w = np.zeros((k, k), np.float32)
    for i in range(k):
        for j in range(k):
            w[i, j] = (1 - abs(i / f - c)) * (1 - abs(j / f - c))
    return w


class BilinearUp(nn.Module):
    """Learnable depthwise 2f x 2f upsample, bilinear-initialized — the
    grouped ConvTranspose2d(k=2f, s=f, p=f//2) of reference IDAUp:317,
    expressed as an lhs-dilated conv (same math, MXU/VPU friendly).

    Weight-porting note: this is an lhs-dilated *cross-correlation*;
    torch's ConvTranspose2d applies the spatially flipped kernel. The two
    agree at the symmetric bilinear init, but these up_* kernels train in
    the reference, so a DLA name mapper in utils/weight_port.py must
    flip trained torch kernels spatially ([::-1, ::-1] on H, W) when
    loading them here."""

    channels: int
    factor: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = self.factor
        k = 2 * f

        def init(key, shape, dtype=jnp.float32):
            base = _bilinear_kernel(k)
            return jnp.asarray(
                np.tile(base[:, :, None, None], (1, 1, 1, self.channels)),
                dtype,
            )

        w = self.param("kernel", init, (k, k, 1, self.channels))
        p = k - 1 - f // 2  # transposed-conv padding f//2 flipped
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype),
            window_strides=(1, 1), padding=[(p, p), (p, p)],
            lhs_dilation=(f, f),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.channels,
        )


class DeformConvBlock(nn.Module):
    """Modulated DCN 3x3 -> BN -> ReLU (reference _DeformConv:271)."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = DeformConv(self.channels, 3, modulated=True, dtype=self.dtype,
                       name="dcn")(x)
        x = BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="bn")(x)
        return nn.relu(x).astype(self.dtype)


class IDAUp(nn.Module):
    """Iterative deep aggregation (reference IDAUp:309): for each level
    above ``startp``: DCN-project to ``o`` channels, learnable bilinear
    upsample by its factor, DCN-node fuse with the previous level."""

    out_channels: int
    up_factors: Sequence[int]   # per input level (index 0 unused)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, layers: List[jnp.ndarray], startp: int, endp: int,
                 train: bool = False) -> List[jnp.ndarray]:
        layers = list(layers)
        for i in range(startp + 1, endp):
            j = i - startp
            y = DeformConvBlock(self.out_channels, dtype=self.dtype,
                                name=f"proj_{j}")(layers[i], train)
            y = BilinearUp(self.out_channels, int(self.up_factors[j]),
                           dtype=self.dtype, name=f"up_{j}")(y)
            layers[i] = DeformConvBlock(
                self.out_channels, dtype=self.dtype, name=f"node_{j}"
            )(y + layers[i - 1], train)
        return layers


class DLAUp(nn.Module):
    """Pyramid decoder (reference DLAUp:336): repeatedly IDAUp the two
    deepest unmerged levels into the shallower scale, emitting one output
    per level, shallowest (highest-res) first."""

    startp: int
    channels: Sequence[int]
    scales: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, layers: List[jnp.ndarray], train: bool = False):
        layers = list(layers)
        channels = list(self.channels)
        scales = np.array(self.scales, dtype=int)
        out = [layers[-1]]
        for i in range(len(layers) - self.startp - 1):
            j = -i - 2
            ida = IDAUp(channels[j], (scales[j:] // scales[j]).tolist(),
                        dtype=self.dtype, name=f"ida_{i}")
            layers = ida(layers, len(layers) - i - 2, len(layers), train)
            out.insert(0, layers[-1])
            scales[j + 1:] = scales[j]
        return out


class DLASeg(nn.Module):
    """DLA + DLAUp + final IDAUp (reference DLASeg:368). ``ms_output``
    emits the multi-scale DLAUp pyramid (dla2..dla5-ish); otherwise the
    stride-4 CenterNet-style head inputs dla0..dla2."""

    num_layers: int = 34
    out_features: Sequence[str] = ("dla2",)
    use_dla_up: bool = True
    ms_output: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        _, channels, _ = DLA_SPECS[self.num_layers]
        first_level = 2  # log2(down_ratio=4)
        last_level = 6 if self.ms_output else 5
        base = DLA(self.num_layers,
                   out_features=tuple(f"level{i}" for i in range(6)),
                   dtype=self.dtype, name="base")(x, train)
        layers = [base[f"level{i}"] for i in range(6)]
        pyramid = layers[first_level:]
        scales = [2 ** i for i in range(len(channels[first_level:]))]
        if self.use_dla_up:
            pyramid = DLAUp(0, channels[first_level:], scales,
                            dtype=self.dtype, name="dla_up")(pyramid, train)
        if not self.ms_output:  # stride-4 output (reference :489-500)
            y = list(pyramid[: last_level - first_level])
            y = IDAUp(channels[first_level],
                      [2 ** i for i in range(last_level - first_level)],
                      dtype=self.dtype, name="ida_up")(y, 0, len(y), train)
            feats = {f"dla{i}": y[i] for i in range(len(y))}
        elif self.use_dla_up:
            feats = {
                f"dla{i + first_level}": pyramid[i]
                for i in range(last_level - first_level)
            }
        else:
            # reference :502-505 with use_dla_up=False: the RAW base levels
            # dla0..dla5 (st = 0), untouched by any decoder
            feats = {f"dla{i}": layers[i] for i in range(last_level)}
        return {k: v for k, v in feats.items() if k in self.out_features}


@BACKBONE_REGISTRY.register()
def build_dla_backbone(cfg, dtype=jnp.float32):
    """reference dla.py:430 — DLASeg from cfg.MODEL.DLA.*."""
    d = getattr(cfg.MODEL, "DLA", None)
    norm = getattr(d, "NORM", "BN") if d else "BN"
    if norm not in ("BN", "SyncBN"):
        # SyncBN == BN here (stats sync via pmean in parallel/norm_sync);
        # other norms are not plumbed through the DLA blocks yet
        raise NotImplementedError(
            f"MODEL.DLA.NORM={norm!r} is not supported (BN/SyncBN only)"
        )
    return DLASeg(
        num_layers=getattr(d, "NUM_LAYERS", 34) if d else 34,
        out_features=tuple(getattr(d, "OUT_FEATURES", ["dla2"]))
        if d else ("dla2",),
        use_dla_up=getattr(d, "USE_DLA_UP", True) if d else True,
        ms_output=getattr(d, "MS_OUTPUT", False) if d else False,
        dtype=dtype,
    )


@BACKBONE_REGISTRY.register()
def build_dla_fpn3_backbone(cfg, dtype=jnp.float32):
    """dlafpn.py:423 — DLA trunk emitting level3/4/5 for an FPN neck."""
    return DLA(depth=34, out_features=("level3", "level4", "level5"),
               dtype=dtype)


@BACKBONE_REGISTRY.register()
def build_dlaup_backbone(cfg, dtype=jnp.float32):
    """dlafpn.py:475 — multi-scale DLAUp pyramid output."""
    return DLASeg(num_layers=34, ms_output=True, use_dla_up=True,
                  out_features=("dla2", "dla3", "dla4", "dla5"),
                  dtype=dtype)
