"""Driver-contract tests for __graft_entry__.

The round-1 failure mode: the driver imports the module and calls
``dryrun_multichip(8)`` with whatever jax backend its process already bound
(one real TPU chip). The dryrun must therefore be self-contained — these
tests call it exactly that way (no env pre-set by the test body; the
subprocess mechanism must force its own platform).
"""

import subprocess
import sys

import pytest


def test_dryrun_multichip_driver_style():
    import __graft_entry__ as g

    # Must not rely on the caller's platform/env: it re-execs in a
    # subprocess with JAX_PLATFORMS=cpu + 8 virtual devices forced.
    g.dryrun_multichip(8)


def test_dryrun_multichip_4_devices():
    import __graft_entry__ as g

    g.dryrun_multichip(4)


def test_build_mesh_errors_on_insufficient_devices():
    import jax

    from yolov7_d2_tpu.parallel.mesh import build_mesh

    one = jax.devices()[:1]
    with pytest.raises(ValueError, match="xla_force_host_platform"):
        build_mesh((-1, 2), ("data", "model"), one)
    with pytest.raises(ValueError, match="devices"):
        build_mesh((4, 2), ("data", "model"), one)


def test_state_shardings_tp_shards_wide_kernels():
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from yolov7_d2_tpu.parallel.mesh import build_mesh, state_shardings

    mesh = build_mesh((-1, 2), ("data", "model"))
    tree = {
        "wide_kernel": jnp.zeros((3, 3, 64, 256)),
        "narrow_kernel": jnp.zeros((3, 3, 8, 16)),
        "bias": jnp.zeros((256,)),
        "step": jnp.zeros(()),
    }
    sh = state_shardings(tree, mesh, tp_min_features=128)
    assert sh["wide_kernel"].spec == P(None, None, None, "model")
    assert sh["narrow_kernel"].spec == P()
    assert sh["bias"].spec == P()
    assert sh["step"].spec == P()
    # and placing + using the sharded tree works
    placed = jax.device_put(tree, sh)
    s = jax.jit(lambda t: sum(jnp.sum(x) for x in t.values()))(placed)
    assert float(s) == 0.0


def test_dryrun_multichip_16_devices():
    """Pod-slice shape beyond the driver's 8: (8, 2) mesh, DP x TP."""
    import __graft_entry__

    __graft_entry__.dryrun_multichip(16)
