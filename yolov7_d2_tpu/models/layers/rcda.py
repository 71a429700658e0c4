"""Row-Column Decoupled Attention (AnchorDETR).

Parity with /root/reference/yolov7/modeling/backbone/layers/
row_column_decoupled_attention.py (``multi_head_rcda_forward:30``): the 2D
key map is pooled to 1D row keys (mean over H -> attends along W) and 1D
column keys (mean over W -> attends along H); the output is the factored
contraction

    out[q] = sum_h A_col[q, h] * sum_w A_row[q, w] * V[h, w]

which shrinks attention memory from O(Q·H·W) to O(Q·(H+W)) — the
memory-optimization role axial attention plays in the reference.

TPU notes: both contractions are plain einsums (MXU-friendly [Q,W]x[W,HC]
matmuls); XLA fuses the softmaxes into them. The ``efficient_compute`` branch
ordering of the reference (short edge first) is irrelevant here — we always
contract W first then H, and XLA's scheduler does the rest.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class RCDAttention(nn.Module):
    """query (+row/col pos) -> factored cross-attention over a 2D memory."""

    embed_dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        query_row: jnp.ndarray,   # [B, Q, C]  (query + row position emb)
        query_col: jnp.ndarray,   # [B, Q, C]  (query + col position emb)
        key_row: jnp.ndarray,     # [B, H, W, C] (memory + x position emb)
        key_col: jnp.ndarray,     # [B, H, W, C] (memory + y position emb)
        value: jnp.ndarray,       # [B, H, W, C]
    ) -> jnp.ndarray:
        hd = self.embed_dim // self.num_heads
        nh = self.num_heads
        b, q, _ = query_row.shape
        _, h, w, _ = value.shape

        def proj(x, name):
            return nn.Dense(self.embed_dim, dtype=self.dtype,
                            param_dtype=jnp.float32, name=name)(x)

        qr = proj(query_row, "q_row") * (hd ** -0.5)
        qc = proj(query_col, "q_col") * (hd ** -0.5)
        kr = proj(key_row, "k_row").mean(axis=1)    # [B, W, C] (pool over H)
        kc = proj(key_col, "k_col").mean(axis=2)    # [B, H, C] (pool over W)
        v = proj(value, "v")

        qr = qr.reshape(b, q, nh, hd)
        qc = qc.reshape(b, q, nh, hd)
        kr = kr.reshape(b, w, nh, hd)
        kc = kc.reshape(b, h, nh, hd)
        v = v.reshape(b, h, w, nh, hd)

        a_row = jax.nn.softmax(
            jnp.einsum("bqnd,bwnd->bnqw", qr, kr).astype(jnp.float32), -1
        ).astype(self.dtype)
        a_col = jax.nn.softmax(
            jnp.einsum("bqnd,bhnd->bnqh", qc, kc).astype(jnp.float32), -1
        ).astype(self.dtype)
        # contract W first, then H (factored attention)
        tmp = jnp.einsum("bnqw,bhwnd->bnqhd", a_row, v)
        out = jnp.einsum("bnqh,bnqhd->bqnd", a_col, tmp)
        out = out.reshape(b, q, self.embed_dim)
        return nn.Dense(self.embed_dim, dtype=self.dtype,
                        param_dtype=jnp.float32, name="out_proj")(out)


def pos2posemb2d(points: jnp.ndarray, num_feats: int = 128,
                 temperature: float = 10000.0) -> jnp.ndarray:
    """2D point -> sine embedding (reference anchordetr_backbone.py:412)."""
    import math

    scale = 2 * math.pi
    pts = points * scale
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_feats)
    pos_x = pts[..., 0:1] / dim_t
    pos_y = pts[..., 1:2] / dim_t
    pos_x = jnp.stack(
        [jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], -1
    ).reshape(*points.shape[:-1], -1)
    pos_y = jnp.stack(
        [jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], -1
    ).reshape(*points.shape[:-1], -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)
