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
        shape[shape.index(-1)] = len(devices) // known
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


def state_shardings(state, mesh: Mesh):
    """Replicate all train-state leaves (DP). Model-axis param sharding is a
    per-arch opt-in (wide head convs), added where profiling justifies it."""
    rep = replicated(mesh)
    return jax.tree.map(lambda _: rep, state)


def local_process_batch_slice(global_batch_size: int) -> slice:
    """Which slice of the global batch this host feeds (multi-host input)."""
    per = global_batch_size // jax.process_count()
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
