"""Micro-bench: per-row top-10 of a [B, G, K] matrix — the SimOTA
extraction primitive (dynamic-k iou sum + kth-cost threshold both reduce
to it). Strategies:
  a) 10-pass masked max-extraction over the full matrix (current)
  b) chunked lax.scan: carry [.., 10] running top-10, read each chunk once
  c) jax.lax.top_k
  d) full sort, slice 10
"""
import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from functools import partial

B, G, K, T = 128, 100, 2048, 10
x = jax.random.uniform(jax.random.PRNGKey(0), (B, G, K))


def timed(fn, *args, iters=30):
    r = fn(*args)
    float(jax.tree.leaves(r)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(jax.tree.leaves(r)[0].reshape(-1)[0])
    return (time.perf_counter() - t0) / iters * 1000


@jax.jit
def extraction(m):
    def body(i, carry):
        vals, cur = carry
        mx = jnp.max(cur, axis=-1)
        vals = vals.at[..., i].set(mx)
        cur = jnp.where(cur >= mx[..., None], -jnp.inf, cur)
        return vals, cur

    vals, _ = jax.lax.fori_loop(0, T, body, (jnp.zeros((B, G, T)), m))
    return vals


@partial(jax.jit, static_argnums=1)
def chunked(m, chunk=256):
    n = K // chunk
    mc = m.reshape(B, G, n, chunk).transpose(2, 0, 1, 3)  # [n, B, G, chunk]

    def body(carry, c):
        buf = jnp.concatenate([carry, c], axis=-1)  # [B, G, 10+chunk]

        def ext(i, bc):
            vals, cur = bc
            mx = jnp.max(cur, axis=-1)
            vals = vals.at[..., i].set(mx)
            cur = jnp.where(cur >= mx[..., None], -jnp.inf, cur)
            return vals, cur

        vals, _ = jax.lax.fori_loop(
            0, T, ext, (jnp.zeros((B, G, T)), buf)
        )
        return vals, None

    init = jnp.full((B, G, T), -jnp.inf)
    out, _ = jax.lax.scan(body, init, mc)
    return out


@jax.jit
def topk(m):
    return jax.lax.top_k(m, T)[0]


@jax.jit
def fullsort(m):
    return jnp.sort(m, axis=-1)[..., -T:]


for name, fn in [("extraction", extraction), ("chunked", chunked),
                 ("top_k", topk), ("sort", fullsort)]:
    ms = timed(fn, x)
    print(f"{name:12s}: {ms:.2f} ms")

# agreement check
a = jnp.sort(extraction(x), axis=-1)
b = jnp.sort(chunked(x), axis=-1)
c = jnp.sort(topk(x), axis=-1)
print("chunked == extraction:", bool(jnp.allclose(a, b)))
print("top_k   == extraction:", bool(jnp.allclose(a, c)))
