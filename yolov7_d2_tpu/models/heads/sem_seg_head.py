"""Semantic segmentation FPN head.

Parity with /root/reference/yolov7/modeling/head/sem_seg_head.py:34
(``SemSegFPNHead``, panoptic-FPN style): each pyramid level gets a small
conv+GN+upsample stack down to the common (1/4) scale, the stacks are
summed and a 1x1 predictor emits per-pixel class logits.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolov7_d2_tpu.core.registry import HEAD_REGISTRY


class SemSegFPNHead(nn.Module):
    num_classes: int = 54          # COCO stuff classes
    conv_dims: int = 128
    common_stride: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, feats: Sequence[jnp.ndarray], strides: Sequence[int],
        train: bool = False,
    ) -> jnp.ndarray:
        """feats: pyramid levels (shallow->deep); strides: their strides.
        Returns logits at 1/common_stride of the input."""
        outs = []
        for i, (f, s) in enumerate(zip(feats, strides)):
            # number of 2x upsamples from this level to the common stride
            n_ups = max((s // self.common_stride).bit_length() - 1, 0)
            x = f
            for j in range(max(n_ups, 1)):
                x = nn.Conv(self.conv_dims, (3, 3), padding=[(1, 1), (1, 1)],
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"l{i}_conv{j}")(x)
                x = nn.relu(
                    nn.GroupNorm(num_groups=min(32, self.conv_dims), epsilon=1e-5,
                                 dtype=jnp.float32, name=f"l{i}_gn{j}")(x)
                ).astype(self.dtype)
                if j < n_ups:
                    b, h, w, c = x.shape
                    x = jax.image.resize(x, (b, h * 2, w * 2, c), "bilinear")
            outs.append(x)
        x = sum(outs)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       param_dtype=jnp.float32, name="predictor")(
            x
        ).astype(jnp.float32)


@HEAD_REGISTRY.register()
def build_sem_seg_head(cfg, dtype=jnp.float32):
    return SemSegFPNHead(dtype=dtype)
