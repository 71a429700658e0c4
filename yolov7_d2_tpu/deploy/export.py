"""Deploy-time export.

The reference exports through ONNX -> TensorRT/ORT/TVM
(/root/reference/export.py, deploy/). The TPU-native serving artifact is a
**StableHLO module**: the jitted inference function serialized with
``jax.export`` — loadable from any PJRT runtime (including the C++ serving
client, deploy/cc) without Python. Plus conv+BN-fused weight export and a
stripped-parameter orbax checkpoint.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def export_stablehlo(
    fn,
    example_args: Tuple,
    path: str,
    platform: Optional[str] = None,
) -> str:
    """Serialize ``jit(fn)(*example_args)`` to a StableHLO artifact."""
    from jax import export as jax_export

    platforms = [platform] if platform else None
    exported = jax_export.export(jax.jit(fn), platforms=platforms)(
        *example_args
    )
    blob = exported.serialize()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_stablehlo(path: str):
    from jax import export as jax_export

    with open(path, "rb") as f:
        blob = f.read()
    return jax_export.deserialize(blob)


def export_mlir(
    fn,
    example_args: Tuple,
    out_dir: str,
    platform: Optional[str] = None,
) -> Dict[str, str]:
    """Emit the MLIR module + serialized CompileOptions sidecar for the C++
    PJRT serving client (deploy/cc/pjrt_infer.cc) — the counterpart of the
    reference's ONNX-for-TensorRT export."""
    from jax import export as jax_export
    from jax._src.lib import xla_client

    platforms = [platform] if platform else None
    exported = jax_export.export(jax.jit(fn), platforms=platforms)(
        *example_args
    )
    os.makedirs(out_dir, exist_ok=True)
    mlir_path = os.path.join(out_dir, "model.mlir")
    with open(mlir_path, "w") as f:
        f.write(exported.mlir_module())
    opts_path = os.path.join(out_dir, "compile_options.pb")
    with open(opts_path, "wb") as f:
        f.write(xla_client.CompileOptions().SerializeAsString())
    return {"mlir": mlir_path, "compile_options": opts_path}


def export_inference_fn(
    model,
    variables: Dict[str, Any],
    input_shape: Tuple[int, int, int, int],
    out_dir: str,
    postprocess=None,
) -> Dict[str, str]:
    """Export model.apply (+ optional fused postprocess) with params baked in
    as constants (the serving artifact needs no param feeding), and a
    sidecar metadata json."""
    os.makedirs(out_dir, exist_ok=True)
    frozen_vars = jax.tree.map(jnp.asarray, variables)

    def infer(images):
        out = model.apply(frozen_vars, images, train=False)
        if postprocess is not None:
            return postprocess(out)
        return out

    example = jnp.zeros(input_shape, jnp.float32)
    path = os.path.join(out_dir, "model.stablehlo")
    export_stablehlo(infer, (example,), path)
    meta = {
        "input_shape": list(input_shape),
        "input_dtype": "float32",
        "layout": "NHWC",
        "postprocess_fused": postprocess is not None,
    }
    meta_path = os.path.join(out_dir, "export_meta.json")
    with open(meta_path, "w") as f:
        json.dump(meta, f, indent=2)
    return {"stablehlo": path, "meta": meta_path}
