"""Device mesh + sharding helpers.

The reference's entire distributed story is DDP over NCCL
(SURVEY.md §2.11: d2 ``launch`` -> mp.spawn -> init_process_group -> DDP).
TPU-native equivalent: a ``jax.sharding.Mesh`` over all chips with axes
``(data, model)``; the batch is sharded over ``data`` (DDP ≙ XLA all-reduce
over ICI inserted automatically by GSPMD), parameters are replicated (or
sharded over ``model`` for wide layers). Multi-host: ``jax.distributed``.

No NCCL calls, no process groups — shardings + jit do everything.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build_mesh(
    mesh_shape: Sequence[int] = (-1, 1),
    axis_names: Sequence[str] = ("data", "model"),
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    shape = list(mesh_shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1]))
        if known <= 0 or len(devices) % known or len(devices) < known:
            raise ValueError(
                f"build_mesh: cannot infer -1 in mesh_shape {tuple(mesh_shape)} "
                f"from {len(devices)} device(s); need a positive multiple of "
                f"{known}. (If you expected virtual CPU devices, "
                "JAX_PLATFORMS=cpu and --xla_force_host_platform_device_count "
                "must be set BEFORE jax initializes its backend.)"
            )
        shape[shape.index(-1)] = len(devices) // known
    need = int(np.prod(shape))
    if len(devices) != need:
        raise ValueError(
            f"build_mesh: mesh shape {tuple(shape)} needs {need} devices but "
            f"got {len(devices)} ({[d.platform for d in devices[:4]]}...). "
            "Set JAX_PLATFORMS=cpu + "
            "XLA_FLAGS=--xla_force_host_platform_device_count=<n> before the "
            "first jax call, or pass a matching `devices` list."
        )
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_pytree(batch, mesh: Mesh):
    """Place a host batch with leading batch dims sharded over ``data``."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def state_shardings(state, mesh: Mesh, tp_min_features: int = 0):
    """Shardings for a train-state pytree.

    Default (``tp_min_features=0``): replicate every leaf (pure DP — the
    reference's only parallelism, SURVEY.md §2.11).

    With ``tp_min_features > 0`` and a ``model`` axis of size > 1: kernels
    (ndim >= 2) whose trailing output-feature dim is >= the threshold and
    divisible by the axis size are sharded over ``model`` (tensor
    parallelism on the widest convs/denses; GSPMD inserts the collectives).
    Optimizer moments and EMA mirror param shapes, so the same rule shards
    them consistently.
    """
    tp = dict(mesh.shape).get("model", 1)
    rep = replicated(mesh)

    def leaf(x):
        shp = getattr(x, "shape", None)
        if (
            tp > 1
            and tp_min_features > 0
            and shp is not None
            and len(shp) >= 2
            and shp[-1] >= tp_min_features
            and shp[-1] % tp == 0
        ):
            spec = [None] * (len(shp) - 1) + ["model"]
            return NamedSharding(mesh, P(*spec))
        return rep

    return jax.tree.map(leaf, state)


def local_process_batch_slice(global_batch_size: int) -> slice:
    """Which slice of the global batch this host feeds (multi-host input)."""
    per = global_batch_size // jax.process_count()
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
