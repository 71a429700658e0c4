"""Weight pruning.

TPU-native analogue of the reference's NNI pruning path
(/root/reference/deploy/prune_nni.py, which wraps nni's L1FilterPruner):

  * ``l1_filter_prune`` — STRUCTURED filter pruning: per conv kernel, zero
    the output filters with the smallest L1 norms (NNI L1FilterPruner
    semantics). Zeroed filters keep the pytree shape static (XLA-friendly);
    a follow-up int8 weight-only quantization (deploy/quantize.py) makes the
    zeros free to store.
  * ``magnitude_prune`` — UNSTRUCTURED global magnitude pruning at a target
    sparsity.
  * ``sparsity_report`` — per-layer and global zero fractions.

On TPU, unstructured sparsity does not speed up the MXU; structured filter
pruning does once the model is re-exported with the kept-channel plan. The
masks returned by both functions can be applied after every optimizer step
for sparsity-aware fine-tuning (lottery-ticket style).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _is_conv_kernel(path: Tuple[str, ...], x) -> bool:
    return path and path[-1] == "kernel" and getattr(x, "ndim", 0) == 4


def _iter_with_path(params):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        keys = tuple(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        yield keys, leaf


def l1_filter_prune(
    params, sparsity: float = 0.5, min_filters: int = 8
) -> Tuple[Any, Any]:
    """Zero the ``sparsity`` fraction of output filters with the smallest
    L1 norm in every conv kernel [kh, kw, I, O] (NNI L1FilterPruner
    semantics). Returns (pruned_params, masks) with identical structure."""

    def prune_leaf(path, x):
        if not _is_conv_kernel(path, x) or x.shape[-1] <= min_filters:
            return x, jnp.ones_like(x, jnp.float32)
        o = x.shape[-1]
        k = min(int(o * sparsity), o - 1)
        if k <= 0:
            return x, jnp.ones_like(x, jnp.float32)
        norms = jnp.abs(x).sum(axis=(0, 1, 2))          # [O]
        thresh = jnp.sort(norms)[k - 1]
        keep = (norms > thresh).astype(jnp.float32)      # [O]
        mask = jnp.broadcast_to(keep, x.shape)
        return x * mask, mask

    flat = jax.tree_util.tree_flatten_with_path(params)
    treedef = flat[1]
    pruned, masks = [], []
    for path, leaf in flat[0]:
        keys = tuple(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        p, m = prune_leaf(keys, leaf)
        pruned.append(p)
        masks.append(m)
    return (
        jax.tree_util.tree_unflatten(treedef, pruned),
        jax.tree_util.tree_unflatten(treedef, masks),
    )


def magnitude_prune(params, sparsity: float = 0.5) -> Tuple[Any, Any]:
    """Global unstructured magnitude pruning: zero the smallest ``sparsity``
    fraction of all conv/dense weights by |w|."""
    mags = [
        np.abs(np.asarray(leaf)).ravel()
        for path, leaf in _iter_with_path(params)
        if path[-1] == "kernel"
    ]
    if not mags:
        return params, jax.tree.map(lambda x: jnp.ones_like(x), params)
    allmag = np.concatenate(mags)
    k = int(len(allmag) * sparsity)
    thresh = np.partition(allmag, k)[k] if k > 0 else -1.0

    def leafmap(path, x):
        if path[-1] != "kernel":
            return x, jnp.ones_like(x, jnp.float32)
        mask = (jnp.abs(x) > thresh).astype(jnp.float32)
        return x * mask, mask

    flat = jax.tree_util.tree_flatten_with_path(params)
    pruned, masks = [], []
    for path, leaf in flat[0]:
        keys = tuple(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        p, m = leafmap(keys, leaf)
        pruned.append(p)
        masks.append(m)
    return (
        jax.tree_util.tree_unflatten(flat[1], pruned),
        jax.tree_util.tree_unflatten(flat[1], masks),
    )


def apply_masks(params, masks):
    """Re-apply pruning masks (after an optimizer step during fine-tuning)."""
    return jax.tree.map(lambda p, m: p * m, params, masks)


def sparsity_report(params) -> Dict[str, float]:
    """Zero fraction per conv/dense kernel + 'global'."""
    report: Dict[str, float] = {}
    total = nonzero = 0
    for path, leaf in _iter_with_path(params):
        if path[-1] != "kernel":
            continue
        arr = np.asarray(leaf)
        nz = int(np.count_nonzero(arr))
        report["/".join(path[:-1])] = 1.0 - nz / arr.size
        total += arr.size
        nonzero += nz
    report["global"] = 1.0 - nonzero / max(total, 1)
    return report
