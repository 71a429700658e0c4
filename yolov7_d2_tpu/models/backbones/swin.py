"""Swin Transformer backbone (T/S/B) with window attention.

Parity with /root/reference/yolov7/modeling/backbone/swin_transformer.py
(``build_swin_transformer_backbone:689``): patch embed, W-MSA/SW-MSA with
relative position bias, patch merging, per-stage LayerNorm outputs.

TPU notes: windows are static reshapes (XLA-friendly); the cyclic shift is
``jnp.roll`` (a cheap HBM-local permute); attention uses one fused einsum
per window batch so the MXU sees [numWindows*B, heads, win², win²] matmuls.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from yolov7_d2_tpu.core.registry import BACKBONE_REGISTRY

SWIN_SPECS = {
    "tiny": ((2, 2, 6, 2), 96, (3, 6, 12, 24)),
    "small": ((2, 2, 18, 2), 96, (3, 6, 12, 24)),
    "base": ((2, 2, 18, 2), 128, (4, 8, 16, 32)),
}


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_reverse(wins: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    b = wins.shape[0] // ((h // ws) * (w // ws))
    x = wins.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(
        np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij")
    ).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask=None):
        """x: [nW*B, win², C]; mask: [nW, win², win²] additive or None."""
        nwb, n, c = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype,
                       param_dtype=jnp.float32, name="qkv")(x)
        qkv = qkv.reshape(nwb, n, 3, self.num_heads, head_dim)
        q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * (head_dim ** -0.5)

        bias_table = self.param(
            "rel_pos_bias",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, self.num_heads),
        )
        idx = relative_position_index(self.window_size)
        bias = bias_table[idx.reshape(-1)].reshape(n, n, self.num_heads)
        attn = attn + bias.transpose(2, 0, 1)[None].astype(attn.dtype)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(-1, nw, self.num_heads, n, n)
            attn = attn + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(nwb, self.num_heads, n, n)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(
            self.dtype
        )
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(nwb, n, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="proj")(out)


def shift_attn_mask(h: int, w: int, ws: int, shift: int) -> jnp.ndarray:
    """Additive mask preventing attention across rolled boundaries."""
    img = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, hs, wsl, :] = cnt
            cnt += 1
    wins = np.reshape(
        np.transpose(
            img.reshape(1, h // ws, ws, w // ws, ws, 1), (0, 1, 3, 2, 4, 5)
        ),
        (-1, ws * ws),
    )
    diff = wins[:, None, :] - wins[:, :, None]
    return jnp.asarray(np.where(diff != 0, -100.0, 0.0), jnp.float32)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        b, h, w, c = x.shape
        # the reference (detection Swin) ALWAYS keeps the configured window
        # and pads, applying shifts through the attention mask even when a
        # single window covers the map (swin_transformer.py:228-241,393-406)
        ws = self.window_size
        shift = self.shift
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        # pad to window multiples (reference swin_transformer.py F.pads the
        # feature map before partitioning, then crops after reversing)
        pad_h = (-h) % ws
        pad_w = (-w) % ws
        if pad_h or pad_w:
            y = jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hp, wp = h + pad_h, w + pad_w
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = shift_attn_mask(hp, wp, ws, shift)
        else:
            mask = None
        wins = window_partition(y, ws)
        wins = WindowAttention(
            self.dim, self.num_heads, ws, dtype=self.dtype, name="attn"
        )(wins, mask)
        y = window_reverse(wins, ws, hp, wp)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        if pad_h or pad_w:
            y = y[:, :h, :w]
        x = x + y

        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     param_dtype=jnp.float32, name="mlp1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="mlp2")(y)
        return x + y


class PatchMerging(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        if h % 2 or w % 2:  # reference pads odd maps before merging
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
            b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="reduction")(x)


class SwinTransformer(nn.Module):
    size: str = "tiny"
    patch_size: int = 4
    window_size: int = 7
    out_features: Sequence[int] = (1, 2, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        depths, embed, heads = SWIN_SPECS[self.size]
        x = nn.Conv(embed, (self.patch_size, self.patch_size),
                    (self.patch_size, self.patch_size), dtype=self.dtype,
                    param_dtype=jnp.float32, name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="patch_norm")(x).astype(
            self.dtype
        )
        outputs: Dict[str, jnp.ndarray] = {}
        dim = embed
        for stage, (n, nh) in enumerate(zip(depths, heads)):
            if stage > 0:
                x = PatchMerging(dim, dtype=self.dtype,
                                 name=f"merge_{stage}")(x).astype(self.dtype)
                dim *= 2
            for i in range(n):
                x = SwinBlock(
                    dim, nh, self.window_size,
                    shift=0 if i % 2 == 0 else self.window_size // 2,
                    dtype=self.dtype, name=f"stage{stage}_block{i}",
                )(x, train)
            if stage in self.out_features:
                out = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                   name=f"out_norm_{stage}")(x)
                outputs[f"stage{stage}"] = out.astype(self.dtype)
        return outputs


@BACKBONE_REGISTRY.register()
def build_swin_transformer_backbone(cfg, dtype=jnp.float32):
    return SwinTransformer(
        size=cfg.MODEL.SWIN.TYPE,
        patch_size=cfg.MODEL.SWIN.PATCH,
        window_size=cfg.MODEL.SWIN.WINDOW,
        out_features=tuple(cfg.MODEL.SWIN.OUT_FEATURES),
        dtype=dtype,
    )
