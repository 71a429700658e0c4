"""Raw host->device transfer bandwidth (the third ceiling of the input
pipeline, separate from host-aug CPU and the device step). On the axon
tunnel this measures the tunnel, not PCIe — the point is to bound the
environment artifact precisely so the PERF.md "fed" table can attribute
each measured img/s to the right wall.

Usage: python tools/bench_h2d.py [batch] [size]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 32
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 640


def bench(name, arr, iters=5):
    # vary a pixel per iter so no caching layer can elide the transfer
    d = jnp.asarray(arr)
    float(jnp.asarray(d).ravel()[0].astype(jnp.float32))  # warm + sync
    t0 = time.perf_counter()
    for i in range(iters):
        arr.flat[0] = i
        d = jnp.asarray(arr)
    float(jnp.asarray(d).ravel()[0].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / iters
    mb = arr.nbytes / 1e6
    print(
        f"h2d {name}: {mb:.1f} MB in {dt*1000:.1f} ms = {mb/dt/1000:.3f} GB/s"
        f" ({BATCH/dt:.1f} img/s at bs{BATCH})",
        flush=True,
    )


def main():
    print(jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    img_u8 = rng.integers(0, 255, (BATCH, SIZE, SIZE, 3), np.uint8)
    bench("uint8", img_u8)
    bench("float32", img_u8.astype(np.float32))
    # dispatch floor: tiny transfer
    tiny = np.zeros((8,), np.float32)
    t0 = time.perf_counter()
    for i in range(20):
        tiny[0] = i
        d = jnp.asarray(tiny)
    float(d[0])
    print(f"dispatch floor: {(time.perf_counter()-t0)/20*1000:.2f} ms/call",
          flush=True)


if __name__ == "__main__":
    main()
