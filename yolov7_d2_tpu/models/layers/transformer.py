"""Transformer building blocks for the DETR family.

Parity with /root/reference/yolov7/modeling/backbone/detr_backbone.py:
``PositionEmbeddingSine:309``, encoder/decoder layers with pre/post-norm
options, and the 3-layer box MLP. Attention is flax's fused
MultiHeadDotProductAttention (XLA flash-attention on TPU); positional
embeddings are added to q/k before projection exactly as the reference does
(``with_pos_embed``).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn


def sine_position_embedding(
    h: int, w: int, num_pos_feats: int = 128, temperature: float = 10000.0,
    normalize: bool = True, centered: bool = False,
) -> jnp.ndarray:
    """2D sine PE [h, w, 2*num_pos_feats] (PositionEmbeddingSine:309).

    ``centered`` is the d2go half-pixel variant (detr_backbone.py:345-352,
    used via MODEL.DETR.CENTERED_POSITION_ENCODIND)."""
    ys = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None]
    xs = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :]
    y_embed = jnp.broadcast_to(ys, (h, w))
    x_embed = jnp.broadcast_to(xs, (h, w))
    if normalize:
        eps = 1e-6
        scale = 2 * math.pi
        if centered:
            y_embed = (y_embed - 0.5) / (h + eps) * scale
            x_embed = (x_embed - 0.5) / (w + eps) * scale
        else:
            y_embed = y_embed / (h + eps) * scale
            x_embed = x_embed / (w + eps) * scale
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    pos_x = jnp.stack(
        [jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=-1
    ).reshape(h, w, -1)
    pos_y = jnp.stack(
        [jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=-1
    ).reshape(h, w, -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


class MLP(nn.Module):
    """The DETR FFN head (e.g. 3-layer box embed)."""

    hidden_dim: int
    out_dim: int
    num_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                         param_dtype=jnp.float32, name=f"layer_{i}")(x)
            x = nn.relu(x)
        return nn.Dense(self.out_dim, dtype=self.dtype,
                        param_dtype=jnp.float32,
                        name=f"layer_{self.num_layers - 1}")(x)


class EncoderLayer(nn.Module):
    d_model: int = 256
    nhead: int = 8
    dim_feedforward: int = 2048
    dropout: float = 0.1
    pre_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, pos, train: bool = False, mask=None):
        def sa(x):
            q = k = x + pos
            return nn.MultiHeadDotProductAttention(
                num_heads=self.nhead, dtype=self.dtype,
                param_dtype=jnp.float32, dropout_rate=self.dropout,
                deterministic=not train, name="self_attn",
            )(q, k, inputs_v=x, mask=mask)

        def ffn(x):
            y = nn.Dense(self.dim_feedforward, dtype=self.dtype,
                         param_dtype=jnp.float32, name="linear1")(x)
            y = nn.relu(y)
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
            return nn.Dense(self.d_model, dtype=self.dtype,
                            param_dtype=jnp.float32, name="linear2")(y)

        n1 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")
        n2 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")
        drop = nn.Dropout(self.dropout, deterministic=not train)
        if self.pre_norm:
            src = src + drop(sa(n1(src).astype(self.dtype)))
            src = src + drop(ffn(n2(src).astype(self.dtype)))
        else:
            src = n1(src + drop(sa(src))).astype(self.dtype)
            src = n2(src + drop(ffn(src))).astype(self.dtype)
        return src


class DecoderLayer(nn.Module):
    d_model: int = 256
    nhead: int = 8
    dim_feedforward: int = 2048
    dropout: float = 0.1
    pre_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, query_pos, pos, train: bool = False):
        def sa(x):
            q = k = x + query_pos
            return nn.MultiHeadDotProductAttention(
                num_heads=self.nhead, dtype=self.dtype,
                param_dtype=jnp.float32, dropout_rate=self.dropout,
                deterministic=not train, name="self_attn",
            )(q, k, inputs_v=x)

        def ca(x):
            return nn.MultiHeadDotProductAttention(
                num_heads=self.nhead, dtype=self.dtype,
                param_dtype=jnp.float32, dropout_rate=self.dropout,
                deterministic=not train, name="cross_attn",
            )(x + query_pos, memory + pos, inputs_v=memory)

        def ffn(x):
            y = nn.Dense(self.dim_feedforward, dtype=self.dtype,
                         param_dtype=jnp.float32, name="linear1")(x)
            y = nn.relu(y)
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
            return nn.Dense(self.d_model, dtype=self.dtype,
                            param_dtype=jnp.float32, name="linear2")(y)

        n1 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")
        n2 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")
        n3 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm3")
        drop = nn.Dropout(self.dropout, deterministic=not train)
        if self.pre_norm:
            tgt = tgt + drop(sa(n1(tgt).astype(self.dtype)))
            tgt = tgt + drop(ca(n2(tgt).astype(self.dtype)))
            tgt = tgt + drop(ffn(n3(tgt).astype(self.dtype)))
        else:
            tgt = n1(tgt + drop(sa(tgt))).astype(self.dtype)
            tgt = n2(tgt + drop(ca(tgt))).astype(self.dtype)
            tgt = n3(tgt + drop(ffn(tgt))).astype(self.dtype)
        return tgt


class Transformer(nn.Module):
    """DETR encoder-decoder returning all decoder layer outputs
    (deep supervision, detr_backbone.py build_transformer:285)."""

    d_model: int = 256
    nhead: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    pre_norm: bool = False
    # rematerialize each encoder/decoder layer in the backward pass:
    # trades ~num_layers x layer-activation memory for one extra forward
    # (the HBM-capacity lever for the bs64 layout cliff, docs/PERF.md)
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        src: jnp.ndarray,        # [B, HW, C]
        pos: jnp.ndarray,        # [B, HW, C]
        query_embed: jnp.ndarray,  # [Q, C]
        train: bool = False,
    ):
        b = src.shape[0]
        Enc = (nn.remat(EncoderLayer, static_argnums=(3, 4))
               if self.remat else EncoderLayer)
        for i in range(self.num_encoder_layers):
            src = Enc(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                self.pre_norm, self.dtype, name=f"enc_{i}",
            )(src, pos, train, None)
        if self.pre_norm:
            src = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="enc_norm")(src).astype(
                self.dtype
            )

        q = jnp.broadcast_to(
            query_embed[None], (b, *query_embed.shape)
        ).astype(self.dtype)
        tgt = jnp.zeros_like(q)
        # DETR applies one shared final norm to every intermediate output
        dec_norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="dec_norm")
        outs = []
        Dec = (nn.remat(DecoderLayer, static_argnums=(5,))
               if self.remat else DecoderLayer)
        for i in range(self.num_decoder_layers):
            tgt = Dec(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                self.pre_norm, self.dtype, name=f"dec_{i}",
            )(tgt, src, q, pos, train)
            outs.append(dec_norm(tgt))
        return jnp.stack(outs, axis=0), src  # [L, B, Q, C], memory
