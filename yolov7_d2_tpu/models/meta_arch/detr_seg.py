"""DETR segmentation & panoptic heads.

Parity with /root/reference/yolov7/modeling/meta_arch/detr_seg.py:
  * ``MHAttentionMap:153`` — per-query multi-head attention heatmaps over
    the encoder memory
  * ``MaskHeadSmallConv:80`` — small FPN-style conv net turning
    (projected memory ⊕ attention maps) into per-query masks
  * ``DETRsegm:24`` — DETR + the two above
  * ``PostProcessSegm:273`` / ``PostProcessPanoptic:300`` — thresholded
    instance masks / argmax panoptic merge.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolov7_d2_tpu.core.registry import META_ARCH_REGISTRY
from yolov7_d2_tpu.models.meta_arch.detr import DETR


class MHAttentionMap(nn.Module):
    """Per-query attention heatmaps [B, Q, nheads, H, W] (no value proj)."""

    hidden_dim: int
    num_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, queries: jnp.ndarray, memory_2d: jnp.ndarray):
        b, q_n, _ = queries.shape
        _, h, w, _ = memory_2d.shape
        hd = self.hidden_dim // self.num_heads
        q = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="q_proj")(queries)
        k = nn.Conv(self.hidden_dim, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="k_proj")(memory_2d)
        q = q.reshape(b, q_n, self.num_heads, hd)
        k = k.reshape(b, h * w, self.num_heads, hd)
        logits = jnp.einsum("bqnd,bpnd->bqnp", q, k) * (hd ** -0.5)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return attn.reshape(b, q_n, self.num_heads, h, w)


class MaskHeadSmallConv(nn.Module):
    """(memory ⊕ attn maps) -> per-query mask logits, upsampling 3x2x."""

    hidden_dim: int = 256
    num_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, memory_2d: jnp.ndarray, attn: jnp.ndarray):
        b, q_n, nh, h, w = attn.shape
        mem = jnp.broadcast_to(
            memory_2d[:, None], (b, q_n, h, w, memory_2d.shape[-1])
        )
        x = jnp.concatenate(
            [mem, attn.transpose(0, 1, 3, 4, 2)], axis=-1
        ).reshape(b * q_n, h, w, -1)
        dims = [self.hidden_dim, self.hidden_dim // 2, self.hidden_dim // 4]
        for i, d in enumerate(dims):
            x = nn.Conv(d, (3, 3), padding=[(1, 1), (1, 1)],
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"lay{i}")(x)
            x = nn.relu(
                nn.GroupNorm(num_groups=min(8, d), epsilon=1e-5, dtype=jnp.float32,
                             name=f"gn{i}")(x)
            ).astype(self.dtype)
            if i > 0:
                bq, hh, ww, c = x.shape
                x = jax.image.resize(x, (bq, hh * 2, ww * 2, c), "nearest")
        out = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)],
                      dtype=self.dtype, param_dtype=jnp.float32,
                      name="out_lay")(x)
        hh, ww = out.shape[1], out.shape[2]
        return out.reshape(b, q_n, hh, ww).astype(jnp.float32)


class DETRsegm(nn.Module):
    """DETR + mask head; returns DETR outputs + pred_masks [B, Q, Hm, Wm]."""

    num_classes: int = 80
    hidden_dim: int = 256
    num_queries: int = 100
    nheads: int = 8
    enc_layers: int = 6
    dec_layers: int = 6
    resnet_depth: int = 50
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False) -> Dict[str, jnp.ndarray]:
        # run base DETR but capture memory: re-implement the tail inline
        from yolov7_d2_tpu.models.backbones.resnet import ResNet
        from yolov7_d2_tpu.models.layers.transformer import (
            MLP,
            Transformer,
            sine_position_embedding,
        )

        mean = jnp.asarray([103.53, 116.28, 123.675])
        std = jnp.asarray([57.375, 57.12, 58.395])
        x = ((images - mean) / std).astype(self.dtype)
        feats = ResNet(depth=self.resnet_depth, out_features=("res5",),
                       # every reference DETR config sets STRIDE_IN_1X1
                       # False (torchvision R50: stride on the 3x3)
                       stride_in_1x1=False,
                       dtype=self.dtype, name="backbone")(x, train)
        f = feats["res5"]
        b, h, w, _ = f.shape
        src = nn.Conv(self.hidden_dim, (1, 1), dtype=self.dtype,
                      param_dtype=jnp.float32, name="input_proj")(f)
        pos = sine_position_embedding(h, w, self.hidden_dim // 2)
        pos = jnp.broadcast_to(
            pos[None], (b, h, w, self.hidden_dim)
        ).astype(self.dtype)
        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (self.num_queries, self.hidden_dim),
        )
        hs, memory = Transformer(
            d_model=self.hidden_dim, nhead=self.nheads,
            num_encoder_layers=self.enc_layers,
            num_decoder_layers=self.dec_layers,
            dropout=0.0, dtype=self.dtype, name="transformer",
        )(
            src.reshape(b, h * w, self.hidden_dim),
            pos.reshape(b, h * w, self.hidden_dim),
            query_embed, train,
        )
        o = hs.astype(jnp.float32)
        cls_logits = nn.Dense(self.num_classes + 1, param_dtype=jnp.float32,
                              name="class_embed")(o)
        boxes = jax.nn.sigmoid(MLP(self.hidden_dim, 4, 3, name="bbox_embed")(o))
        memory_2d = memory.reshape(b, h, w, self.hidden_dim)
        attn = MHAttentionMap(
            self.hidden_dim, self.nheads, dtype=self.dtype,
            name="bbox_attention",
        )(hs[-1].astype(self.dtype), memory_2d)
        masks = MaskHeadSmallConv(
            self.hidden_dim, self.nheads, dtype=self.dtype, name="mask_head"
        )(memory_2d, attn.astype(self.dtype))
        return {
            "pred_logits": cls_logits[-1],
            "pred_boxes": boxes[-1],
            "aux_logits": cls_logits[:-1],
            "aux_boxes": boxes[:-1],
            "pred_masks": masks,
        }


def postprocess_segm(
    out: Dict[str, jnp.ndarray], mask_threshold: float = 0.5
):
    """PostProcessSegm:273 — per-query sigmoid masks thresholded."""
    return jax.nn.sigmoid(out["pred_masks"]) > mask_threshold


def postprocess_panoptic(
    out: Dict[str, jnp.ndarray],
    num_classes: int,
    object_threshold: float = 0.85,
):
    """PostProcessPanoptic:300 — pixel-wise argmax over the weighted query
    masks; queries below threshold or predicting no-object are dropped.

    Returns (segment_map [B, Hm, Wm] int32 query-index, query_keep [B, Q]).
    """
    prob = jax.nn.softmax(out["pred_logits"], axis=-1)
    scores = jnp.max(prob[..., :-1], axis=-1)
    keep = (scores > object_threshold) & (
        jnp.argmax(prob, axis=-1) != num_classes
    )
    masks = jax.nn.sigmoid(out["pred_masks"])
    weighted = masks * jnp.where(keep, scores, 0.0)[..., None, None]
    seg = jnp.argmax(weighted, axis=1).astype(jnp.int32)
    return seg, keep


@META_ARCH_REGISTRY.register(name="DetrSegm")
def build_detr_segm(cfg, dtype: Optional[Any] = None):
    dtype = dtype or (jnp.bfloat16 if cfg.SOLVER.AMP.ENABLED else jnp.float32)
    d = cfg.MODEL.DETR
    return DETRsegm(
        num_classes=d.NUM_CLASSES,
        hidden_dim=d.HIDDEN_DIM,
        num_queries=d.NUM_OBJECT_QUERIES,
        nheads=d.NHEADS,
        enc_layers=d.ENC_LAYERS,
        dec_layers=d.DEC_LAYERS,
        resnet_depth=cfg.MODEL.RESNETS.DEPTH,
        dtype=dtype,
    )
