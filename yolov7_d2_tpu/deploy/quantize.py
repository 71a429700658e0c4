"""Post-training int8 quantization.

The reference ships FX / PPQ / ORT / TRT quantization paths
(/root/reference/deploy/quant_fx, quant_atom, quant_onnx, tools/quantize_d2.py)
plus QAT utilities (yolov7/utils/qat_utils.py). The TPU-native equivalent:

  * weight-only int8: per-output-channel symmetric scales for every conv /
    dense kernel; dequantized on the fly (HBM footprint / bandwidth 4x
    smaller, MXU still bf16) — the deployment default.
  * activation calibration: min/max or percentile observers over a
    calibration set producing per-tensor scales (the PTQ calib step,
    deploy/quant_fx/calib.py analogue) for int8 serving paths.
  * QAT: fake-quant with straight-through estimator, toggleable like
    ``get_qat_qconfig`` / learnable-fake-quant enable (qat_utils.py:63-166).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# weight-only int8
# ---------------------------------------------------------------------------

def quantize_weights_int8(params: Any) -> Tuple[Any, Any]:
    """Per-output-channel symmetric int8 for all >=2D kernels.

    Returns (quantized_tree, scales_tree); non-kernel leaves pass through
    (scale None).
    """

    def quant(leaf):
        if leaf.ndim >= 2:
            # flax kernels put output channels last
            absmax = jnp.max(
                jnp.abs(leaf), axis=tuple(range(leaf.ndim - 1)), keepdims=True
            )
            scale = jnp.maximum(absmax, 1e-8) / 127.0
            q = jnp.clip(jnp.round(leaf / scale), -127, 127).astype(jnp.int8)
            return q, scale
        return leaf, None

    flat, treedef = jax.tree_util.tree_flatten(params)
    qs, ss = zip(*[quant(l) for l in flat]) if flat else ((), ())
    return (
        jax.tree_util.tree_unflatten(treedef, qs),
        jax.tree_util.tree_unflatten(treedef, ss),
    )


def dequantize_weights(qparams: Any, scales: Any, dtype=jnp.bfloat16) -> Any:
    def dq(q, s):
        if s is None:
            return q
        return (q.astype(jnp.float32) * s).astype(dtype)

    return jax.tree.map(
        dq, qparams, scales,
        is_leaf=lambda x: x is None or isinstance(x, jnp.ndarray),
    )


# ---------------------------------------------------------------------------
# activation calibration (PTQ observers)
# ---------------------------------------------------------------------------

class MinMaxObserver:
    """Running min/max (or percentile) per named activation."""

    def __init__(self, percentile: float = 100.0):
        self.percentile = percentile
        self._mins: Dict[str, float] = {}
        self._maxs: Dict[str, float] = {}

    def observe(self, name: str, value: jnp.ndarray) -> None:
        v = jax.device_get(value).astype(float)
        if self.percentile >= 100.0:
            lo, hi = float(v.min()), float(v.max())
        else:
            import numpy as np

            lo = float(np.percentile(v, 100 - self.percentile))
            hi = float(np.percentile(v, self.percentile))
        self._mins[name] = min(self._mins.get(name, lo), lo)
        self._maxs[name] = max(self._maxs.get(name, hi), hi)

    def scales(self) -> Dict[str, float]:
        return {
            k: max(abs(self._mins[k]), abs(self._maxs[k]), 1e-8) / 127.0
            for k in self._mins
        }


def calibrate(
    apply_fn: Callable, variables: Any, batches, observer: MinMaxObserver,
    taps: Dict[str, Callable] | None = None,
):
    """Run calibration batches, observing the model output (and optional
    named tap functions of the output)."""
    for batch in batches:
        out = apply_fn(variables, batch)
        leaves = jax.tree_util.tree_leaves(out)
        for i, leaf in enumerate(leaves):
            observer.observe(f"output_{i}", leaf)
        for name, fn in (taps or {}).items():
            observer.observe(name, fn(out))
    return observer.scales()


# ---------------------------------------------------------------------------
# QAT fake-quant (straight-through estimator)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def fake_quant(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    q = jnp.clip(jnp.round(x / scale), -127, 127)
    return q * scale


def _fq_fwd(x, scale):
    return fake_quant(x, scale), (x, scale)


def _fq_bwd(res, g):
    x, scale = res
    # straight-through on x inside the clip range; zero outside
    inside = (jnp.abs(x / scale) <= 127).astype(g.dtype)
    return g * inside, jnp.zeros_like(scale)


fake_quant.defvjp(_fq_fwd, _fq_bwd)


def qat_transform_params(params: Any) -> Any:
    """Apply fake-quant to every kernel (training-time QAT forward)."""

    def fq(leaf):
        if leaf.ndim >= 2:
            absmax = jnp.max(
                jnp.abs(leaf), axis=tuple(range(leaf.ndim - 1)), keepdims=True
            )
            scale = jnp.maximum(absmax, 1e-8) / 127.0
            return fake_quant(leaf, scale)
        return leaf

    return jax.tree.map(fq, params)
