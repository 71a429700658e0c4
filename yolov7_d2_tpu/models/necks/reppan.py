"""RepPAN neck (YOLOv6) + PP-YOLO PAN.

Parity with /root/reference/yolov7/modeling/neck/reppan.py (``RepPANNeck:6``)
and neck/ppyolo_pan.py (``PPYOLOPAN:230`` with SPP + DropBlock — the
reference file carries a latent paddle ``nn.Layer`` bug at :9 which we
obviously do not reproduce).

BN eps/momentum follow the ASSEMBLED reference model (1e-3 / torch 0.03,
set by ``_init_model`` at meta_arch/yolov6.py:107-111 over the standalone
modules' torch defaults) — see efficientrep.py's module docstring.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolov7_d2_tpu.core.registry import NECK_REGISTRY
from yolov7_d2_tpu.models.backbones.efficientrep import RepBlock
from yolov7_d2_tpu.models.layers.blocks import BaseConv, SPPBottleneck
from yolov7_d2_tpu.models.necks.yolo_pafpn import upsample2x_nearest


class RepPANNeck(nn.Module):
    """Top-down + bottom-up PAN with RepBlocks (strides 8/16/32).

    Channel plan follows the reference exactly (efficientrep.py builder
    ``channels_list_neck = [256, 128, 128, 256, 256, 512]`` = indices 5..10
    of the combined list; neck/reppan.py wires Rep_p4→ch5, Rep_p3→ch6,
    downsample2→ch7, Rep_n3→ch8, downsample1→ch9, Rep_n4→ch10), scaled by
    ``make_divisible(c * width_mul, 8)``.
    """

    width_mul: float = 1.0
    depth_mul: float = 1.0
    dtype: Any = jnp.float32

    # reference channels_list indices 5..10
    channels_plan: Sequence[int] = (256, 128, 128, 256, 256, 512)
    # reference num_repeats indices 5..8 (Rep_p4, Rep_p3, Rep_n3, Rep_n4)
    repeats_plan: Sequence[int] = (12, 12, 12, 12)

    @nn.compact
    def __call__(
        self, feats: Sequence[jnp.ndarray], train: bool = False
    ) -> Tuple[jnp.ndarray, ...]:
        from yolov7_d2_tpu.models.backbones.efficientrep import make_divisible

        x2, x1, x0 = feats
        ch5, ch6, ch7, ch8, ch9, ch10 = [
            make_divisible(c * self.width_mul) for c in self.channels_plan
        ]
        reps = [
            max(round(r * self.depth_mul), 1) if r > 1 else r
            for r in self.repeats_plan
        ]

        r0 = BaseConv(ch5, 1, 1, act="relu",
                      dtype=self.dtype, name="reduce0")(x0, train)
        # the reference upsamples with a LEARNABLE ConvTranspose2d(k=2,s=2)
        # (efficientrep.py Transpose:100), not nearest-neighbor
        u0 = nn.ConvTranspose(ch5, (2, 2), (2, 2), dtype=self.dtype,
                              param_dtype=jnp.float32, name="upsample0")(r0)
        up0 = jnp.concatenate([u0, x1], axis=-1)
        p4 = RepBlock(ch5, reps[0], dtype=self.dtype, name="rep_p4")(
            up0, train
        )

        r1 = BaseConv(ch6, 1, 1, act="relu",
                      dtype=self.dtype, name="reduce1")(p4, train)
        u1 = nn.ConvTranspose(ch6, (2, 2), (2, 2), dtype=self.dtype,
                              param_dtype=jnp.float32, name="upsample1")(r1)
        up1 = jnp.concatenate([u1, x2], axis=-1)
        p3 = RepBlock(ch6, reps[1], dtype=self.dtype, name="rep_p3")(
            up1, train
        )

        d1 = BaseConv(ch7, 3, 2, act="relu",
                      dtype=self.dtype, name="down1")(p3, train)
        n4 = RepBlock(ch8, reps[2], dtype=self.dtype, name="rep_n3")(
            jnp.concatenate([d1, r1], axis=-1), train
        )

        d0 = BaseConv(ch9, 3, 2, act="relu",
                      dtype=self.dtype, name="down0")(n4, train)
        n5 = RepBlock(ch10, reps[3], dtype=self.dtype, name="rep_n4")(
            jnp.concatenate([d0, r0], axis=-1), train
        )
        return (p3, n4, n5)


class DropBlock(nn.Module):
    """DropBlock2D (reference ppyolo_pan.py:122): contiguous spatial blocks
    are zeroed during training; inference is identity. Seeds are sampled at
    rate gamma so the expected drop fraction matches ``1 - keep_prob``."""

    block_size: int = 3
    keep_prob: float = 0.9

    @nn.compact
    def __call__(self, x, train: bool = False):
        if not train or self.keep_prob >= 1.0:
            return x
        b, h, w, c = x.shape
        bs = min(self.block_size, h, w)
        gamma = (
            (1.0 - self.keep_prob)
            / (bs * bs)
            * (h * w)
            / max((h - bs + 1) * (w - bs + 1), 1)
        )
        rng = self.make_rng("dropout")
        seeds = jax.random.bernoulli(rng, gamma, (b, h, w, 1))
        # grow each seed into a bs x bs zero block
        block = nn.max_pool(
            seeds.astype(x.dtype), (bs, bs), strides=(1, 1),
            padding=[(bs // 2, (bs - 1) // 2), (bs // 2, (bs - 1) // 2)],
        )
        mask = 1.0 - block
        scale = mask.size / jnp.maximum(mask.sum(), 1.0)
        return x * mask * scale.astype(x.dtype)


class PPYOLOPAN(nn.Module):
    """PP-YOLOv2 PAN: conv blocks with SPP on the deepest level and
    DropBlock regularization (reference ppyolo_pan.py:122,230)."""

    channels: Sequence[int] = (128, 256, 512)
    with_spp: bool = True
    drop_block: bool = True
    keep_prob: float = 0.9
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, feats: Sequence[jnp.ndarray], train: bool = False
    ) -> Tuple[jnp.ndarray, ...]:
        x2, x1, x0 = feats
        c3, c4, c5 = self.channels

        y0 = BaseConv(c5, 1, 1, act="lrelu", dtype=self.dtype,
                      name="p5_in")(x0, train)
        if self.with_spp:
            y0 = SPPBottleneck(c5, act="lrelu", dtype=self.dtype,
                               name="spp")(y0, train)
        y0 = BaseConv(c5, 3, 1, act="lrelu", dtype=self.dtype,
                      name="p5_out")(y0, train)
        if self.drop_block:
            y0 = DropBlock(keep_prob=self.keep_prob, name="drop_p5")(y0, train)

        u1 = jnp.concatenate(
            [upsample2x_nearest(
                BaseConv(c4, 1, 1, act="lrelu", dtype=self.dtype,
                         name="lat1")(y0, train)
            ), x1],
            axis=-1,
        )
        y1 = BaseConv(c4, 3, 1, act="lrelu", dtype=self.dtype,
                      name="p4_out")(u1, train)
        if self.drop_block:
            y1 = DropBlock(keep_prob=self.keep_prob, name="drop_p4")(y1, train)

        u2 = jnp.concatenate(
            [upsample2x_nearest(
                BaseConv(c3, 1, 1, act="lrelu", dtype=self.dtype,
                         name="lat2")(y1, train)
            ), x2],
            axis=-1,
        )
        y2 = BaseConv(c3, 3, 1, act="lrelu", dtype=self.dtype,
                      name="p3_out")(u2, train)
        if self.drop_block:
            y2 = DropBlock(keep_prob=self.keep_prob, name="drop_p3")(y2, train)

        d2 = BaseConv(c4, 3, 2, act="lrelu", dtype=self.dtype,
                      name="pan_down2")(y2, train)
        z1 = BaseConv(c4, 3, 1, act="lrelu", dtype=self.dtype,
                      name="pan_p4")(jnp.concatenate([d2, y1], -1), train)
        d1 = BaseConv(c5, 3, 2, act="lrelu", dtype=self.dtype,
                      name="pan_down1")(z1, train)
        z0 = BaseConv(c5, 3, 1, act="lrelu", dtype=self.dtype,
                      name="pan_p5")(jnp.concatenate([d1, y0], -1), train)
        return (y2, z1, z0)


@NECK_REGISTRY.register()
def build_reppan(cfg, dtype=jnp.float32):
    return RepPANNeck(
        width_mul=cfg.MODEL.YOLO.WIDTH_MUL,
        depth_mul=cfg.MODEL.YOLO.DEPTH_MUL,
        dtype=dtype,
    )


@NECK_REGISTRY.register()
def build_ppyolo_pan(cfg, dtype=jnp.float32):
    return PPYOLOPAN(with_spp=cfg.MODEL.YOLO.NECK.WITH_SPP, dtype=dtype)
