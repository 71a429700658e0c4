"""BiFPN — bidirectional weighted feature pyramid (EfficientDet).

Parity with /root/reference/yolov7/modeling/neck/bifpn.py: the exact
8-node fusion graph (``get_fpn_config:30``), fast-normalized attention
weights (``FpnCombine:184`` 'fastattn'), channel/space resampling with
1x1 conv + norm + k=s maxpool / nearest upsample
(``ResampleFeatureMap:144``), Swish-then-3x3-conv node refinement with
no activation after the norm (``BiFpnLayer:242``,
conv_bn_relu_pattern=False), and the two extra input levels built by
1x1-conv+norm+maxpool off the last backbone level (``BiFPN:295``
resample loop — the second extra level is a bare maxpool because its
input already has fpn channels). Reference quirks kept: the conv bias
exists only when norm == '' (``ConvBnAct2d:95``/``SeparableConv2d:131``
compute bias from the norm string, ignoring the ``bias`` argument), and
the separable conv's pointwise half follows the same rule while the
depthwise half never has a bias.

Weight porting: ``utils/weight_port.py:port_bifpn_state_dict``;
differential test vs the reference's own torch module:
``tests/test_torch_parity_stacks.py`` (TestBiFPNParity).
"""

from __future__ import annotations

from typing import Any, List, Sequence

import jax.numpy as jnp
from flax import linen as nn

from yolov7_d2_tpu.core.registry import NECK_REGISTRY
from ..layers.norm import BatchNorm

# get_fpn_config(base_reduction=8): per-node (reduction, inputs_offsets)
# into the running feature list [P3 P4 P5 P6 P7, node5.. ].
_FPN_NODES = (
    (64, (3, 4)),
    (32, (2, 5)),
    (16, (1, 6)),
    (8, (0, 7)),
    (16, (1, 7, 8)),
    (32, (2, 6, 9)),
    (64, (3, 5, 10)),
    (128, (4, 11)),
)


def _swish(x):
    return x * nn.sigmoid(x)


def _upsample_nearest(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    # UpsamplingNearest2d(scale_factor=scale), exactly (integer repeat)
    x = jnp.repeat(x, scale, axis=1)
    return jnp.repeat(x, scale, axis=2)


def _maxpool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    # nn.MaxPool2d(kernel_size=k, stride=k) — no padding
    return nn.max_pool(x, (k, k), (k, k), padding="VALID")


class BiFPN(nn.Module):
    """Input: the backbone's ``in_features`` levels (stride 8/16/32 for
    the default P3-P5 taps); extends to ``num_levels`` internally and
    runs ``num_bifpn`` fusion layers. Returns ``num_levels`` maps,
    finest first (p3..p7)."""

    out_channels: int = 160
    num_bifpn: int = 6
    num_levels: int = 5
    norm: str = "GN"
    separable_conv: bool = False
    dtype: Any = jnp.float32

    def _norm_layer(self, name: str, train: bool = False):
        if self.norm == "GN":
            return nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                dtype=jnp.float32, name=name)
        if self.norm in ("BN", "SyncBN"):
            return BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32, name=name)
        return None

    def _conv_norm(self, x, channels: int, kernel: int, name: str,
                   train: bool = False):
        """ConvBnAct2d with act_layer=None: conv (bias iff norm=='') +
        optional norm. padding = kernel // 2 (reference Conv2d)."""
        p = kernel // 2
        x = nn.Conv(channels, (kernel, kernel), padding=[(p, p), (p, p)],
                    use_bias=(self.norm == ""), dtype=self.dtype,
                    param_dtype=jnp.float32, name=f"{name}_conv")(x)
        norm = self._norm_layer(f"{name}_bn", train)
        if norm is not None:
            x = norm(x)
        return x.astype(self.dtype)

    def _sep_conv_norm(self, x, channels: int, name: str,
                       train: bool = False):
        """SeparableConv2d, act_layer=None: depthwise 3x3 (never biased
        in the after-combine path) + pointwise 1x1 (bias iff norm=='')
        + optional norm."""
        c = x.shape[-1]
        x = nn.Conv(c, (3, 3), padding=[(1, 1), (1, 1)],
                    feature_group_count=c, use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name=f"{name}_dw")(x)
        x = nn.Conv(channels, (1, 1), use_bias=(self.norm == ""),
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name=f"{name}_pw")(x)
        norm = self._norm_layer(f"{name}_bn", train)
        if norm is not None:
            x = norm(x)
        return x.astype(self.dtype)

    def _resample(self, x, in_chs: int, ratio: float, name: str,
                  train: bool = False):
        """ResampleFeatureMap with apply_bn_for_resampling=True,
        conv_after_downsample=False: optional 1x1 conv+norm, then k=s
        maxpool (ratio>1) or nearest upsample (ratio<1)."""
        if in_chs != self.out_channels:
            x = self._conv_norm(x, self.out_channels, 1, name, train)
        if ratio > 1:
            x = _maxpool(x, int(ratio))
        elif ratio < 1:
            x = _upsample_nearest(x, int(1 // ratio))
        return x

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        feats = list(feats)
        # reductions relative to the finest tap = base_reduction 8
        reds: List[int] = [8 * (1 << i) for i in range(len(feats))]
        chs: List[int] = [int(f.shape[-1]) for f in feats]

        # extend to num_levels off the last map (BiFPN.resample loop);
        # in_chs threads through so only the FIRST extra level gets a conv
        x = feats
        in_chs = chs[-1]
        for level in range(len(feats), self.num_levels):
            x.append(self._resample(x[-1], in_chs, 2.0,
                                    name=f"resample_{level}",
                                    train=train))
            in_chs = self.out_channels
            reds.append(reds[-1] * 2)
            chs.append(self.out_channels)

        for rep in range(self.num_bifpn):
            for i, (target_red, offsets) in enumerate(_FPN_NODES):
                base = f"cell{rep}_fnode{i}"
                nodes = []
                for off in offsets:
                    nodes.append(self._resample(
                        x[off], chs[off], target_red / reds[off],
                        name=f"{base}_res{off}", train=train,
                    ))
                # fastattn: relu weights, shared normalizer eps 1e-4
                w = self.param(f"{base}_edge", nn.initializers.ones,
                               (len(offsets),))
                w = nn.relu(w).astype(nodes[0].dtype)
                denom = jnp.sum(w) + 1e-4
                combined = sum(n * w[j] for j, n in enumerate(nodes)) / denom
                # after_combine: Swish THEN conv+norm (no trailing act)
                y = _swish(combined)
                if self.separable_conv:
                    y = self._sep_conv_norm(y, self.out_channels,
                                            name=f"{base}_conv",
                                            train=train)
                else:
                    y = self._conv_norm(y, self.out_channels, 3,
                                        name=f"{base}_conv", train=train)
                x.append(y)
                reds.append(target_red)
                chs.append(self.out_channels)
            x = x[-self.num_levels:]
            reds = reds[-self.num_levels:]
            chs = chs[-self.num_levels:]
        return tuple(x)


@NECK_REGISTRY.register()
def build_bifpn(cfg, dtype=jnp.float32):
    return BiFPN(
        out_channels=cfg.MODEL.BIFPN.OUT_CHANNELS,
        num_bifpn=cfg.MODEL.BIFPN.NUM_BIFPN,
        num_levels=cfg.MODEL.BIFPN.NUM_LEVELS,
        norm=cfg.MODEL.BIFPN.NORM,
        separable_conv=cfg.MODEL.BIFPN.SEPARABLE_CONV,
        dtype=dtype,
    )
