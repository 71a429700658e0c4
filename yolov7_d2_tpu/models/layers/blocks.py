"""Convolutional vocabulary shared by all YOLO-family parts.

Parity with /root/reference/yolov7/modeling/backbone/layers/wrappers.py
(BaseConv:60, DWConv:86, Bottleneck:105, SPPBottleneck:142, CSPLayer:165,
Focus:202) and activations.py — redesigned TPU-first:

  * NHWC layout end-to-end (TPU conv layout; torch is NCHW).
  * bf16 compute / f32 params via the ``dtype`` / ``param_dtype`` pattern;
    BatchNorm statistics always accumulate in f32.
  * BN defaults match YOLOX (eps=1e-3, torch momentum 0.03 -> flax 0.97,
    cf. reference yolox.py:85-90) so ported weights behave identically.
  * Focus (space-to-depth patchify) is a reshape/transpose XLA fuses away.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from .norm import BatchNorm

BN_MOMENTUM = 0.97  # = 1 - torch 0.03
BN_EPS = 1e-3


def get_activation(name: str = "silu") -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Activation lookup (reference layers/utils.py:45 get_activation)."""
    if name in ("silu", "swish"):
        return nn.silu
    if name == "relu":
        return nn.relu
    if name == "lrelu":
        return lambda x: nn.leaky_relu(x, negative_slope=0.1)
    if name == "gelu":
        return nn.gelu
    if name == "mish":
        # x * tanh(softplus(x)) (reference cspdarknet.py:23 python fallback)
        return lambda x: x * jnp.tanh(jax.nn.softplus(x))
    if name in ("identity", "none", ""):
        return lambda x: x
    raise ValueError(f"Unsupported activation: {name}")


class BaseConv(nn.Module):
    """Conv2d + BatchNorm + activation ("CBS" block, wrappers.py:60)."""

    out_channels: int
    ksize: int = 1
    stride: int = 1
    groups: int = 1
    act: str = "silu"
    # YOLOX BN convention by default; plain-torch modules (reference
    # darknet.py conv_bn_lrelu) use eps=1e-5 — pass it for exact parity
    bn_eps: float = BN_EPS
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pad = (self.ksize - 1) // 2
        x = nn.Conv(
            features=self.out_channels,
            kernel_size=(self.ksize, self.ksize),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        # BN in the compute dtype: flax accumulates the batch statistics in
        # f32 regardless (force_float32_reductions), so bf16 here only
        # affects the normalize/scale apply — and keeps the whole
        # conv->bn->silu chain one bf16 HBM pass instead of upcasting the
        # activation tensor to f32 and back (the dominant elementwise cost
        # in the train-step trace, docs/traces/).
        x = BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=self.bn_eps,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(x)
        return get_activation(self.act)(x).astype(self.dtype)


class DWConv(nn.Module):
    """Depthwise 3x3 + pointwise 1x1 (wrappers.py:86)."""

    out_channels: int
    ksize: int = 3
    stride: int = 1
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_ch = x.shape[-1]
        x = BaseConv(
            in_ch, self.ksize, self.stride, groups=in_ch, act=self.act,
            dtype=self.dtype, name="dconv",
        )(x, train)
        return BaseConv(
            self.out_channels, 1, 1, act=self.act, dtype=self.dtype, name="pconv"
        )(x, train)


class Bottleneck(nn.Module):
    """1x1 reduce -> 3x3, optional residual (wrappers.py:105)."""

    out_channels: int
    shortcut: bool = True
    expansion: float = 0.5
    depthwise: bool = False
    act: str = "silu"
    bn_eps: float = BN_EPS
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        hidden = int(self.out_channels * self.expansion)
        y = BaseConv(hidden, 1, 1, act=self.act, bn_eps=self.bn_eps,
                     dtype=self.dtype, name="conv1")(
            x, train
        )
        conv2_cls = DWConv if self.depthwise else BaseConv
        kw = {} if self.depthwise else {"bn_eps": self.bn_eps}
        y = conv2_cls(
            self.out_channels, 3, 1, act=self.act, dtype=self.dtype,
            name="conv2", **kw
        )(y, train)
        if self.shortcut and x.shape[-1] == self.out_channels:
            y = y + x
        return y


def _maxpool_stride1(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Stride-1 kxk same-padded maxpool. (A separable shifted-max variant
    with a jnp.maximum-tree backward was tried against the
    select_and_scatter backward and measured SLOWER end-to-end — 182.5 vs
    179.3 ms/step @bs128 — so reduce_window stays; see docs/PERF.md r3.)"""
    p = k // 2
    return nn.max_pool(x, (k, k), strides=(1, 1), padding=[(p, p), (p, p)])


class SPPBottleneck(nn.Module):
    """Spatial pyramid pooling block (wrappers.py:142): 1x1 -> parallel
    maxpools (5/9/13) -> concat -> 1x1."""

    out_channels: int
    kernel_sizes: Sequence[int] = (5, 9, 13)
    act: str = "silu"
    bn_eps: float = BN_EPS
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        hidden = x.shape[-1] // 2
        x = BaseConv(hidden, 1, 1, act=self.act, bn_eps=self.bn_eps,
                     dtype=self.dtype, name="conv1")(
            x, train
        )
        # Cascaded-pool identity (YOLOv5 "SPPF"): stride-1 maxpools compose,
        # mp_{2a-1} ∘ mp_{2b-1} = mp_{2(a+b)-3}, so 5/9/13 = mp5, mp5∘mp5,
        # mp5∘mp5∘mp5 — identical outputs, but the backward
        # (select_and_scatter) runs over 3x25 window taps instead of
        # 25+81+169: measured 40ms -> ~11ms per train step (bs128 @640,
        # v5e) for the default (5, 9, 13) pyramid. Non-arithmetic ladders
        # fall back to direct pools.
        ks = list(self.kernel_sizes)
        cascade = all(
            ks[i] - ks[i - 1] == ks[0] - 1 for i in range(1, len(ks))
        ) and ks[0] % 2 == 1
        pools = [x]
        if cascade:
            k = ks[0]
            y = x
            for _ in ks:
                y = _maxpool_stride1(y, k)
                pools.append(y)
        else:
            for k in ks:
                pools.append(_maxpool_stride1(x, k))
        x = jnp.concatenate(pools, axis=-1)
        return BaseConv(
            self.out_channels, 1, 1, act=self.act, bn_eps=self.bn_eps,
            dtype=self.dtype, name="conv2"
        )(x, train)


class CSPLayer(nn.Module):
    """Cross-stage-partial block ("C3", wrappers.py:165): split into two 1x1
    branches, run ``n`` bottlenecks on one, concat, fuse 1x1."""

    out_channels: int
    n: int = 1
    shortcut: bool = True
    expansion: float = 0.5
    depthwise: bool = False
    act: str = "silu"
    bn_eps: float = BN_EPS
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        hidden = int(self.out_channels * self.expansion)
        x1 = BaseConv(hidden, 1, 1, act=self.act, bn_eps=self.bn_eps,
                      dtype=self.dtype, name="conv1")(
            x, train
        )
        x2 = BaseConv(hidden, 1, 1, act=self.act, bn_eps=self.bn_eps,
                      dtype=self.dtype, name="conv2")(
            x, train
        )
        for i in range(self.n):
            x1 = Bottleneck(
                hidden,
                shortcut=self.shortcut,
                expansion=1.0,
                depthwise=self.depthwise,
                act=self.act,
                bn_eps=self.bn_eps,
                dtype=self.dtype,
                name=f"m_{i}",
            )(x1, train)
        x = jnp.concatenate([x1, x2], axis=-1)
        return BaseConv(
            self.out_channels, 1, 1, act=self.act, bn_eps=self.bn_eps,
            dtype=self.dtype, name="conv3"
        )(x, train)


class _FoldedFocusConv(nn.Module):
    """nn.Conv-compatible stem conv with the 2x2 space-to-depth folded in.

    Holds the identical parameter (``kernel`` [k, k, 4c, out]) at the
    identical path as the ``nn.Conv`` it replaces, but applies it as the
    mathematically equivalent 2k x 2k stride-2 convolution on the RAW
    image: W2k[di::2, dj::2] = W[k, k, g(di,dj)*c:(g+1)*c] with the Focus
    group order (tl, bl, tr, br) = (0,0),(1,0),(0,1),(1,1). Same products,
    same output — but the explicit transpose/concat materialized ~3x the
    full-resolution image in HBM (the largest single data-formatting tax
    in the round-4 e2e trace at 640px); the folded form reads the image
    once inside the conv.
    """

    features: int
    ksize: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        k = self.ksize
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, 4 * c, self.features),
            jnp.float32,
        )
        w2k = jnp.zeros((2 * k, 2 * k, c, self.features), kernel.dtype)
        for g, (di, dj) in enumerate(((0, 0), (1, 0), (0, 1), (1, 1))):
            w2k = w2k.at[di::2, dj::2].set(
                kernel[:, :, g * c : (g + 1) * c, :]
            )
        # SAME on the half grid (pad (k-1)//2) becomes pad k-1 here
        p = k - 1
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            w2k.astype(self.dtype),
            window_strides=(2, 2),
            padding=((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class _FoldedFocusCBS(nn.Module):
    """BaseConv twin (same param tree: conv/kernel + bn) over _FoldedFocusConv."""

    out_channels: int
    ksize: int
    act: str
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = _FoldedFocusConv(
            self.out_channels, self.ksize, dtype=self.dtype, name="conv"
        )(x)
        x = BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(x)
        return get_activation(self.act)(x).astype(self.dtype)


class Focus(nn.Module):
    """Patchify stem (wrappers.py:202): space-to-depth 2x2 then conv.

    Default path folds the space-to-depth into the conv kernel (see
    _FoldedFocusConv — exact same math and parameters, one HBM pass);
    ``fold=False`` keeps the explicit transpose/concat formulation (the
    differential oracle in tests/test_blocks.py).
    """

    out_channels: int
    ksize: int = 3
    stride: int = 1
    act: str = "silu"
    fold: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.fold and self.stride == 1 and self.ksize % 2 == 1:
            return _FoldedFocusCBS(
                self.out_channels, self.ksize, self.act,
                dtype=self.dtype, name="conv",
            )(x, train)
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        # order (tl, bl, tr, br) matches the torch cat order in the reference
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        # reorder channel groups to (patch_tl, patch_bl, patch_tr, patch_br)
        # to match the reference's torch.cat order for weight porting
        x = jnp.concatenate(
            [
                x[..., 0 * c : 1 * c],  # (0,0)
                x[..., 2 * c : 3 * c],  # (1,0)
                x[..., 1 * c : 2 * c],  # (0,1)
                x[..., 3 * c : 4 * c],  # (1,1)
            ],
            axis=-1,
        )
        return BaseConv(
            self.out_channels, self.ksize, self.stride, act=self.act,
            dtype=self.dtype, name="conv",
        )(x, train)


class RepVGGBlock(nn.Module):
    """Re-parameterizable conv block (YOLOv6 EfficientRep vocabulary,
    reference efficientrep.py). Train-time: 3x3 + 1x1 + identity branches;
    deploy-time fusion happens in the checkpoint utils."""

    out_channels: int
    stride: int = 1
    act: str = "relu"
    # reference efficientrep.py builds plain nn.BatchNorm2d (eps 1e-5)
    bn_eps: float = BN_EPS
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_ch = x.shape[-1]
        y = nn.Conv(
            self.out_channels, (3, 3), (self.stride, self.stride),
            padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name="rbr_dense_conv",
        )(x)
        y = BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM,
            epsilon=self.bn_eps, dtype=jnp.float32, name="rbr_dense_bn",
        )(y)
        z = nn.Conv(
            self.out_channels, (1, 1), (self.stride, self.stride),
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name="rbr_1x1_conv",
        )(x)
        z = BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM,
            epsilon=self.bn_eps, dtype=jnp.float32, name="rbr_1x1_bn",
        )(z)
        out = y + z
        if self.stride == 1 and in_ch == self.out_channels:
            idt = BatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM,
                epsilon=self.bn_eps, dtype=jnp.float32, name="rbr_identity_bn",
            )(x)
            out = out + idt
        return get_activation(self.act)(out).astype(self.dtype)
