"""Micro-bench the SimOTA prefilter pieces @ [B=128, G=100, A=8400, K=2048]:
top_k selection, column gather of [G, A] -> [G, K], row gathers, scatter-back.
"""
import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp

B, G, A, K, C = 128, 100, 8400, 2048, 80
key = jax.random.PRNGKey(0)
sel = jax.random.uniform(key, (B, A))
cand = jax.random.uniform(key, (B, G, A)) > 0.5
cls = jax.random.uniform(key, (B, A, C))
idx = jax.random.randint(key, (B, K), 0, A)


def timed(fn, *args, iters=30):
    r = fn(*args)
    float(jax.tree.leaves(r)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(jax.tree.leaves(r)[0].reshape(-1)[0])
    return (time.perf_counter() - t0) / iters * 1000


print("top_k(sel,K)[B,A] :", timed(jax.jit(lambda s: jax.lax.top_k(s, K)[1]), sel), "ms")
print("col-gather [G,A]->[G,K]:", timed(
    jax.jit(lambda c, i: jax.vmap(lambda cc, ii: cc[:, ii])(c, i)), cand, idx), "ms")
print("row-gather cls [A,C]->[K,C]:", timed(
    jax.jit(lambda x, i: jax.vmap(lambda xx, ii: xx[ii])(x, i)), cls, idx), "ms")
print("scatter [K]->[A] x3:", timed(
    jax.jit(lambda i: jax.vmap(
        lambda ii: jnp.zeros((A,)).at[ii].set(1.0)
    )(i)), idx), "ms")
