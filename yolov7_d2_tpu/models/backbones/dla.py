"""DLA-34/60 backbone (deep layer aggregation) + DLA-Up decoder.

Parity with /root/reference/yolov7/modeling/backbone/dla.py / dlafpn.py
(``build_dla_backbone:430``, ``build_dla_fpn3_backbone:423``,
CenterNet-style): hierarchical tree stages with aggregation nodes; DLAUp
iteratively upsamples + fuses for the FPN variant.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from yolov7_d2_tpu.core.registry import BACKBONE_REGISTRY
from yolov7_d2_tpu.models.backbones.resnet import ConvBN
from yolov7_d2_tpu.models.necks.yolo_pafpn import upsample2x_nearest

DLA_SPECS = {
    34: ((1, 1, 1, 2, 2, 1), (16, 32, 64, 128, 256, 512)),
    60: ((1, 1, 1, 2, 3, 1), (16, 32, 128, 256, 512, 1024)),
}


class BasicBlock(nn.Module):
    channels: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        y = ConvBN(self.channels, 3, self.stride, frozen_bn=False,
                   dtype=self.dtype, name="conv1")(x, train)
        y = ConvBN(self.channels, 3, 1, act=False, frozen_bn=False,
                   dtype=self.dtype, name="conv2")(y, train)
        if residual is None:
            residual = x
        return nn.relu(y + residual).astype(self.dtype)


class Root(nn.Module):
    """Aggregation node: concat children -> 1x1 conv (+residual)."""

    channels: int
    residual: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, children, train: bool = False):
        x = jnp.concatenate(children, axis=-1)
        x = ConvBN(self.channels, 1, 1, act=False, frozen_bn=False,
                   dtype=self.dtype, name="conv")(x, train)
        if self.residual:
            x = x + children[0]
        return nn.relu(x).astype(self.dtype)


class Tree(nn.Module):
    levels: int
    channels: int
    stride: int = 1
    root_residual: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.stride > 1:
            bottom = nn.max_pool(
                x, (self.stride, self.stride), (self.stride, self.stride)
            )
        else:
            bottom = x
        if bottom.shape[-1] != self.channels:
            residual = ConvBN(
                self.channels, 1, 1, act=False, frozen_bn=False,
                dtype=self.dtype, name="project",
            )(bottom, train)
        else:
            residual = bottom

        if self.levels == 1:
            t1 = BasicBlock(self.channels, self.stride, dtype=self.dtype,
                            name="tree1")(x, residual, train)
            t2 = BasicBlock(self.channels, 1, dtype=self.dtype,
                            name="tree2")(t1, None, train)
            return Root(self.channels, self.root_residual, dtype=self.dtype,
                        name="root")([t2, t1], train)
        t1 = Tree(self.levels - 1, self.channels, self.stride,
                  self.root_residual, dtype=self.dtype, name="tree1")(x, train)
        t2 = Tree(self.levels - 1, self.channels, 1, self.root_residual,
                  dtype=self.dtype, name="tree2")(t1, train)
        # deeper trees fold bottom/residual into the final root
        return Root(self.channels, self.root_residual, dtype=self.dtype,
                    name="root")([t2, t1, residual], train)


class DLA(nn.Module):
    depth: int = 34
    out_features: Sequence[str] = ("level3", "level4", "level5")
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        levels, channels = DLA_SPECS[self.depth]
        x = ConvBN(channels[0], 7, 1, frozen_bn=False, dtype=self.dtype,
                   name="base")(x, train)
        outputs: Dict[str, jnp.ndarray] = {}
        # level0/1: plain convs; level2+: trees with stride 2
        x = ConvBN(channels[0], 3, 1, frozen_bn=False, dtype=self.dtype,
                   name="level0")(x, train)
        outputs["level0"] = x
        x = ConvBN(channels[1], 3, 2, frozen_bn=False, dtype=self.dtype,
                   name="level1")(x, train)
        outputs["level1"] = x
        for i in range(2, 6):
            x = Tree(levels[i], channels[i], stride=2,
                     root_residual=(i >= 4), dtype=self.dtype,
                     name=f"level{i}")(x, train)
            outputs[f"level{i}"] = x
        return {k: v for k, v in outputs.items() if k in self.out_features}


class DLAUp(nn.Module):
    """Iterative deep aggregation decoder (dlafpn.py DLAUp): upsample the
    deepest level and fuse into shallower ones, producing a pyramid at the
    shallowest resolution + intermediate levels."""

    channels: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        proj = [
            ConvBN(self.channels, 1, 1, frozen_bn=False, dtype=self.dtype,
                   name=f"proj_{i}")(f, train)
            for i, f in enumerate(feats)
        ]
        out = [proj[-1]]
        for i in range(len(proj) - 2, -1, -1):
            up = upsample2x_nearest(out[0])
            fused = ConvBN(self.channels, 3, 1, frozen_bn=False,
                           dtype=self.dtype, name=f"node_{i}")(
                proj[i] + up, train
            )
            out.insert(0, fused)
        return tuple(out)


@BACKBONE_REGISTRY.register()
def build_dla_backbone(cfg, dtype=jnp.float32):
    return DLA(depth=34, dtype=dtype)


@BACKBONE_REGISTRY.register()
def build_dla_fpn3_backbone(cfg, dtype=jnp.float32):
    """DLA + DLAUp pyramid (dlafpn.py:423)."""
    dla = DLA(depth=34, out_features=("level3", "level4", "level5"),
              dtype=dtype)
    return dla  # DLAUp composed by the consuming meta-arch
