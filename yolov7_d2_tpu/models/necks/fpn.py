"""Standard FPN (P2..P6) — the detectron2-style pyramid SOLOv2 and the
panoptic heads consume (reference relies on d2's FPN through
``MODEL.FPN.IN_FEATURES``)."""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax.numpy as jnp
from flax import linen as nn

from yolov7_d2_tpu.core.registry import NECK_REGISTRY
from yolov7_d2_tpu.models.necks.yolo_pafpn import upsample2x_nearest


class FPN(nn.Module):
    out_channels: int = 256
    add_p6: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, feats: Sequence[jnp.ndarray], train: bool = False
    ) -> List[jnp.ndarray]:
        """feats: backbone levels shallow->deep (e.g. res2..res5).
        Returns [P_shallowest..P_deepest(+P6)]."""
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name=f"lateral_{i}")(f)
            for i, f in enumerate(feats)
        ]
        outs = [None] * len(laterals)
        outs[-1] = laterals[-1]
        for i in range(len(laterals) - 2, -1, -1):
            outs[i] = laterals[i] + upsample2x_nearest(outs[i + 1])
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name=f"output_{i}")(o)
            for i, o in enumerate(outs)
        ]
        if self.add_p6:
            outs.append(
                nn.max_pool(outs[-1], (1, 1), (2, 2))
            )
        return outs


@NECK_REGISTRY.register()
def build_fpn(cfg, dtype=jnp.float32):
    return FPN(out_channels=cfg.MODEL.FPN.OUT_CHANNELS, dtype=dtype)
