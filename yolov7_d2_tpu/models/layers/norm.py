"""Torch-faithful BatchNorm.

flax ``nn.BatchNorm`` updates the running variance with the BIASED batch
variance; ``torch.nn.BatchNorm2d`` uses the UNBIASED (Bessel-corrected)
estimate for the running update while normalizing with the biased one
(pytorch functional.batch_norm semantics). The gap is var * 1/(N-1) per
update — negligible for large spatial maps but material at small ones
(e.g. a 2x2 stride-32 level at batch 2: N=8, a 14% relative error on the
running variance), and it is exactly the kind of train-then-eval
divergence the mAP-parity gate cares about.

This module is a drop-in for the ``nn.BatchNorm`` surface the package
uses (``use_running_average``, ``momentum``, ``epsilon``, ``dtype``,
``param_dtype``); statistics always accumulate in f32 (flax
``force_float32_reductions`` semantics), the normalize/scale apply runs
in the compute dtype. Collection layout ("batch_stats" mean/var,
"params" scale/bias) is identical, so weight porting and every existing
checkpoint/test template is unaffected.

Reference semantics: torch/nn/modules/batchnorm.py (running stats with
``unbiased_var = var * N / (N - 1)``); verified differentially in
tests/test_torch_parity_grads.py (3-step SGD trajectory incl. running
stats).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn
from jax import lax


class BatchNorm(nn.Module):
    """BatchNorm with torch's running-statistics update rule."""

    use_running_average: bool = False
    momentum: float = 0.99
    epsilon: float = 1e-5
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32
    use_bias: bool = True
    use_scale: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        features = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((features,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((features,), jnp.float32))

        if self.use_running_average:
            mean = ra_mean.value
            var = ra_var.value
        else:
            # stats in f32 regardless of compute dtype
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            mean2 = jnp.mean(jnp.square(xf), axis=axes)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                n = float(x.size // features)
                bessel = n / max(n - 1.0, 1.0)   # torch running_var update
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * (var * bessel)

        compute_dtype = self.dtype or jnp.promote_types(x.dtype, jnp.float32)
        y = x.astype(compute_dtype) - mean.astype(compute_dtype)
        mul = lax.rsqrt(var.astype(compute_dtype)
                        + jnp.asarray(self.epsilon, compute_dtype))
        if self.use_scale:
            scale = self.param(
                "scale", nn.initializers.ones, (features,), self.param_dtype)
            mul = mul * scale.astype(compute_dtype)
        y = y * mul
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (features,), self.param_dtype)
            y = y + bias.astype(compute_dtype)
        return y.astype(compute_dtype)
