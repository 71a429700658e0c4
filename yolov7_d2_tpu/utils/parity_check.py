"""Per-layer activation diff harness for weight porting.

SURVEY.md §5 requires reference checkpoints to reproduce COCO mAP within 0.3
through the porting shim; when they don't, the debugging tool is a per-layer
activation comparison. Usage:

  1. on the torch side, hook every module and dump activations to an .npz
     (name -> array, NCHW);
  2. here, run the same input through the flax model with
     ``capture_intermediates`` and diff layer-by-layer (layouts normalized),
     reporting the first layer that diverges.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np


def capture_activations(
    model, variables, images, train: bool = False
) -> Dict[str, np.ndarray]:
    """Run the model capturing every module's output (flax intermediates).

    Returns {'backbone/stem/conv': array, ...} with NHWC arrays.
    """
    out, state = model.apply(
        variables, images, train=train,
        capture_intermediates=True, mutable=["intermediates"],
    )
    flat = {}

    def walk(tree, prefix=""):
        for k, v in tree.items():
            path = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, path)
            else:
                # intermediates store tuples of outputs
                val = v[0] if isinstance(v, (tuple, list)) else v
                if hasattr(val, "shape"):
                    flat[path.replace("/__call__", "")] = np.asarray(val)

    walk(state["intermediates"])
    return flat


def to_nhwc(arr: np.ndarray) -> np.ndarray:
    """torch NCHW -> NHWC for 4D tensors (no-op for other ranks)."""
    if arr.ndim == 4:
        return np.transpose(arr, (0, 2, 3, 1))
    return arr


def diff_report(
    ours: Dict[str, np.ndarray],
    reference: Dict[str, np.ndarray],
    name_map: Optional[Dict[str, str]] = None,
    rtol: float = 1e-3,
    atol: float = 1e-3,
    ref_is_nchw: bool = False,
) -> List[Tuple[str, float, float, bool]]:
    """Compare activations; returns [(name, max_abs_err, rel_err, ok)].

    ``name_map`` translates reference layer names to ours; unmapped names
    are matched by identity. Set ``ref_is_nchw`` when the reference dump
    came from torch (4D arrays are transposed to NHWC before comparison).
    """
    rows = []
    for ref_name, ref_val in reference.items():
        our_name = (name_map or {}).get(ref_name, ref_name)
        if our_name not in ours:
            rows.append((ref_name, float("nan"), float("nan"), False))
            continue
        a = ours[our_name].astype(np.float64)
        b = np.asarray(ref_val)
        if ref_is_nchw:
            b = to_nhwc(b)
        b = b.astype(np.float64)
        if a.shape != b.shape:
            rows.append((ref_name, float("inf"), float("inf"), False))
            continue
        err = np.abs(a - b)
        max_err = float(err.max()) if err.size else 0.0
        denom = float(np.abs(b).max()) or 1.0
        rel = max_err / denom
        rows.append((ref_name, max_err, rel, bool(rel <= rtol or max_err <= atol)))
    return rows


def first_divergence(rows) -> Optional[str]:
    for name, _, _, ok in rows:
        if not ok:
            return name
    return None
