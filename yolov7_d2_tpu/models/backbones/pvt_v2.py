"""PVTv2 backbone (b0-b5) with spatial-reduction attention.

Parity with /root/reference/yolov7/modeling/backbone/pvt_v2.py
(``build_pvt_v2_backbone:429``): overlapping patch embeds, SR-attention
(keys/values spatially downsampled by a strided conv), conv-FFN (depthwise
3x3 inside the MLP).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolov7_d2_tpu.core.registry import BACKBONE_REGISTRY

PVT2_SPECS = {
    # depths, dims, heads, sr_ratios, mlp_ratios
    "b0": ((2, 2, 2, 2), (32, 64, 160, 256), (1, 2, 5, 8), (8, 4, 2, 1), (8, 8, 4, 4)),
    "b1": ((2, 2, 2, 2), (64, 128, 320, 512), (1, 2, 5, 8), (8, 4, 2, 1), (8, 8, 4, 4)),
    "b2": ((3, 4, 6, 3), (64, 128, 320, 512), (1, 2, 5, 8), (8, 4, 2, 1), (8, 8, 4, 4)),
    "b3": ((3, 4, 18, 3), (64, 128, 320, 512), (1, 2, 5, 8), (8, 4, 2, 1), (8, 8, 4, 4)),
}


class SRAttention(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: int, w: int):
        b, n, c = x.shape
        hd = self.dim // self.num_heads
        q = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="q")(x)
        if self.sr_ratio > 1:
            kv_in = x.reshape(b, h, w, c)
            kv_in = nn.Conv(
                self.dim, (self.sr_ratio, self.sr_ratio),
                (self.sr_ratio, self.sr_ratio), dtype=self.dtype,
                param_dtype=jnp.float32, name="sr",
            )(kv_in)
            kv_in = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="sr_norm")(
                kv_in
            ).astype(self.dtype)
            kv_in = kv_in.reshape(b, -1, self.dim)
        else:
            kv_in = x
        kv = nn.Dense(self.dim * 2, dtype=self.dtype, param_dtype=jnp.float32,
                      name="kv")(kv_in)
        m = kv_in.shape[1]
        k, v = kv.reshape(b, m, 2, self.num_heads, hd).transpose(2, 0, 3, 1, 4)
        qh = q.reshape(b, n, self.num_heads, hd).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhnd,bhmd->bhnm", qh, k) * (hd ** -0.5)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="proj")(out)


class ConvFFN(nn.Module):
    hidden: int
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: int, w: int):
        b, n, _ = x.shape
        x = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc1")(x)
        y = x.reshape(b, h, w, self.hidden)
        y = nn.Conv(self.hidden, (3, 3), padding=[(1, 1), (1, 1)],
                    feature_group_count=self.hidden, dtype=self.dtype,
                    param_dtype=jnp.float32, name="dwconv")(y)
        # torch nn.GELU default is the exact erf form
        x = nn.gelu(y.reshape(b, n, self.hidden), approximate=False)
        return nn.Dense(self.out_dim, dtype=self.dtype,
                        param_dtype=jnp.float32, name="fc2")(x)


class PVT2Block(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int
    mlp_ratio: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: int, w: int):
        y = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        x = x + SRAttention(self.dim, self.num_heads, self.sr_ratio,
                            dtype=self.dtype, name="attn")(y, h, w)
        y = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        return x + ConvFFN(self.dim * self.mlp_ratio, self.dim,
                           dtype=self.dtype, name="ffn")(y, h, w)


class PVTv2(nn.Module):
    variant: str = "b1"
    out_features: Sequence[int] = (1, 2, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        depths, dims, heads, srs, mlps = PVT2_SPECS[self.variant]
        outputs: Dict[str, jnp.ndarray] = {}
        for stage in range(4):
            patch = 7 if stage == 0 else 3
            stride = 4 if stage == 0 else 2
            p = patch // 2
            x = nn.Conv(dims[stage], (patch, patch), (stride, stride),
                        padding=[(p, p), (p, p)], dtype=self.dtype,
                        param_dtype=jnp.float32,
                        name=f"patch_embed_{stage}")(x)
            b, h, w, c = x.shape
            t = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                             name=f"embed_norm_{stage}")(
                x.reshape(b, h * w, c)
            ).astype(self.dtype)
            for i in range(depths[stage]):
                t = PVT2Block(
                    dims[stage], heads[stage], srs[stage], mlps[stage],
                    dtype=self.dtype, name=f"stage{stage}_block{i}",
                )(t, h, w)
            t = nn.LayerNorm(dtype=jnp.float32, name=f"out_norm_{stage}")(t)
            x = t.reshape(b, h, w, c).astype(self.dtype)
            if stage in self.out_features:
                outputs[f"stage{stage}"] = x
        return outputs


@BACKBONE_REGISTRY.register()
def build_pvt_v2_backbone(cfg, dtype=jnp.float32):
    return PVTv2(
        variant=cfg.MODEL.PVT.TYPE,
        out_features=tuple(cfg.MODEL.PVT.OUT_FEATURES),
        dtype=dtype,
    )
