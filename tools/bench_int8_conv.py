"""Micro-bench: s8xs8->s32 conv vs bf16 conv on the chip (v5e lists 2x
MXU rate for int8). Shapes = the YOLOX-s hot conv (bs128, 80x80x128 3x3).
Decides whether a static-int8 serving path is worth building."""
import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp
import numpy as np

B, H, W, C, K = 128, 80, 80, 128, 3
rng = np.random.default_rng(0)
x_f = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.bfloat16)
w_f = jnp.asarray(rng.normal(size=(K, K, C, C)), jnp.bfloat16)
x_i = jnp.asarray(rng.integers(-127, 127, (B, H, W, C)), jnp.int8)
w_i = jnp.asarray(rng.integers(-127, 127, (K, K, C, C)), jnp.int8)

dn = ("NHWC", "HWIO", "NHWC")


@jax.jit
def conv_bf16(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )


@jax.jit
def conv_int8(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )


def timed(fn, *args, iters=30):
    out = fn(*args)
    float(jnp.asarray(out).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.asarray(out).reshape(-1)[0])
    return (time.perf_counter() - t0) / iters * 1000


flops = 2 * B * H * W * C * C * K * K
ms_f = timed(conv_bf16, x_f, w_f)
print(f"bf16 conv: {ms_f:.2f} ms  ({flops/ms_f/1e9:.0f} TFLOP/s)")
try:
    ms_i = timed(conv_int8, x_i, w_i)
    print(f"int8 conv: {ms_i:.2f} ms  ({flops/ms_i/1e9:.0f} TOP/s)  "
          f"speedup {ms_f/ms_i:.2f}x")
except Exception as e:
    print(f"int8 conv unsupported: {type(e).__name__}: {e}")
