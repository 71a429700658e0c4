"""Cross-replica BatchNorm statistics synchronization.

Parity with /root/reference/yolov7/utils/allreduce_norm.py (gather BN/IN
buffers, flatten-concat, ``dist.all_reduce``, reload — YOLOX-style, gloo).

TPU-native: under pjit the batch is sharded over the ``data`` axis, so BN
moments computed inside the jitted step are *local* to each shard's slice.
``cross_replica_mean_stats`` is a pure pytree map of ``lax.pmean`` calls —
use it inside a shard_map/pmap region, or call :func:`allreduce_norm_host`
on the host to average a replicated state's stats explicitly (the direct
analogue of the reference's periodic all_reduce_norm hook).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def _is_stat_leaf(path: str) -> bool:
    return path.endswith("/mean") or path.endswith("/var")


def cross_replica_mean_stats(batch_stats: Any, axis_name: str = "data"):
    """lax.pmean over every BN running stat (use inside pmap/shard_map)."""
    return jax.tree.map(
        lambda x: jax.lax.pmean(x, axis_name), batch_stats
    )


def allreduce_norm_host(batch_stats_per_replica):
    """Host-side averaging of a list of per-replica batch_stats pytrees
    (the hook form of the reference all_reduce_norm:96)."""
    n = len(batch_stats_per_replica)
    return jax.tree.map(
        lambda *xs: sum(xs) / n, *batch_stats_per_replica
    )


def precise_bn(model, params, batch_stats, batches, momentum: float = 0.0):
    """PreciseBN (the reference enables d2's hook in
    train_transformer.py:108-155): re-estimate BN running stats by running
    ``batches`` through the model in train mode and averaging the computed
    moments, instead of trusting EMA momentum.

    Returns new batch_stats.
    """
    accum = None
    count = 0

    @jax.jit
    def step(params, batch_stats, images):
        _, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, train=True, mutable=["batch_stats"],
        )
        return mutated["batch_stats"]

    for batch in batches:
        images = batch["image"] if isinstance(batch, dict) else batch
        new_stats = step(params, batch_stats, images)
        if accum is None:
            accum = jax.tree.map(jnp.zeros_like, new_stats)
        accum = jax.tree.map(lambda a, s: a + s, accum, new_stats)
        count += 1
    if count == 0:
        return batch_stats
    return jax.tree.map(lambda a: a / count, accum)
