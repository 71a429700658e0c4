"""SPPF cascade identity: stride-1 maxpool composition equals the parallel
pyramid (reference wrappers.py:142 runs 5/9/13 pools in parallel; we run
mp5 three times — mp5∘mp5 = mp9, mp5∘mp5∘mp5 = mp13)."""

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np
import pytest

from yolov7_d2_tpu.models.layers.blocks import SPPBottleneck


def _direct_pool(x, k):
    p = k // 2
    return nn.max_pool(x, (k, k), strides=(1, 1), padding=[(p, p), (p, p)])


@pytest.mark.parametrize("ks", [(5, 9, 13), (3, 5, 7)])
def test_cascade_equals_parallel_pyramid(ks):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 17, 19, 8))
    k = ks[0]
    y, cascade = x, []
    for _ in ks:
        y = _direct_pool(y, k)
        cascade.append(y)
    direct = [_direct_pool(x, kk) for kk in ks]
    for c, d, kk in zip(cascade, direct, ks):
        np.testing.assert_allclose(np.asarray(c), np.asarray(d), err_msg=f"k={kk}")


@pytest.mark.parametrize("ks", [(5, 9, 13), (3, 5, 9)])  # cascade + fallback
def test_spp_module_runs_both_paths(ks):
    m = SPPBottleneck(out_channels=16, kernel_sizes=ks)
    x = jnp.ones((1, 16, 16, 8))
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    assert out.shape == (1, 16, 16, 16)
    assert bool(jnp.isfinite(out).all())
