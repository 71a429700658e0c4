"""Worker for the 2-process jax.distributed multi-host simulation test.

Each process owns 2 virtual CPU devices (4 global over 2 processes,
arranged as a (2, 2) data x model mesh) — the CPU analogue of a 2-host TPU
slice. Exercises, for real (cross-process):

  1. ``local_process_batch_slice`` feeding per-host shards of a global
     batch (``jax.make_array_from_process_local_data``), with a jitted
     global reduction matching the single-host oracle;
  2. a model-axis-sharded parameter pytree saved and restored through the
     orbax ``Checkpointer`` under the live mesh (sharded multi-host
     checkpoint round-trip), preserving values AND shardings.

Run: python tests/_multihost_worker.py <coord_addr> <num_procs> <proc_id> <dir>
Prints "MULTIHOST_OK <proc_id>" on success (asserted by the parent test).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    coord, n_procs, pid, workdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=n_procs, process_id=pid
    )
    assert jax.process_count() == n_procs, jax.process_count()
    assert jax.device_count() == 2 * n_procs, jax.device_count()
    assert len(jax.local_devices()) == 2

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from yolov7_d2_tpu.parallel.mesh import (
        build_mesh,
        local_process_batch_slice,
    )
    from yolov7_d2_tpu.train.checkpoint import Checkpointer

    # ---- (2, 2) data x model mesh over the 4 global devices
    mesh = build_mesh((2, 2), ("data", "model"))

    # ---- 1. per-host batch slices -> one global sharded batch
    global_bs = 8
    full = np.arange(global_bs * 3, dtype=np.float32).reshape(global_bs, 3)
    sl = local_process_batch_slice(global_bs)
    assert (sl.stop - sl.start) == global_bs // n_procs
    local = full[sl]
    sharding = NamedSharding(mesh, P("data"))
    garr = jax.make_array_from_process_local_data(sharding, local)
    assert garr.shape == (global_bs, 3)

    @jax.jit
    def reduce(x):
        return jnp.sum(x * x) + jnp.sum(x, axis=0)[0]

    got = np.asarray(jax.device_get(reduce(garr)))
    want = (full * full).sum() + full.sum(axis=0)[0]
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # ---- 2. sharded checkpoint round-trip under the live mesh
    kernel_sh = NamedSharding(mesh, P(None, "model"))
    rep = NamedSharding(mesh, P())
    state = {
        "kernel": jax.device_put(
            np.arange(64, dtype=np.float32).reshape(4, 16) + pid * 0,
            kernel_sh,
        ),
        "bias": jax.device_put(np.full((7,), 3.25, np.float32), rep),
        "step": jax.device_put(np.int32(5), rep),
    }
    ckpt_dir = os.path.join(workdir, "ckpt")
    ck = Checkpointer(ckpt_dir)
    ck.save(5, state)

    template = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
        state,
    )
    restored = Checkpointer(ckpt_dir).restore(template)
    np.testing.assert_array_equal(
        np.asarray(restored["kernel"]), np.asarray(state["kernel"])
    )
    np.testing.assert_array_equal(
        np.asarray(restored["bias"]), np.asarray(state["bias"])
    )
    assert int(restored["step"]) == 5
    assert restored["kernel"].sharding.spec == kernel_sh.spec

    print(f"MULTIHOST_OK {pid}", flush=True)


if __name__ == "__main__":
    main()
