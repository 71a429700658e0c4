import jax
import jax.numpy as jnp
import numpy as np

from yolov7_d2_tpu.deploy.quantize import (
    MinMaxObserver,
    dequantize_weights,
    fake_quant,
    qat_transform_params,
    quantize_weights_int8,
)
from yolov7_d2_tpu.parallel.norm_sync import (
    allreduce_norm_host,
    precise_bn,
)


def test_weight_only_int8_roundtrip_error_small():
    rng = np.random.default_rng(0)
    params = {
        "conv": {"kernel": jnp.asarray(rng.normal(0, 0.1, (3, 3, 16, 32)),
                                       jnp.float32),
                 "bias": jnp.asarray(rng.normal(0, 0.1, (32,)), jnp.float32)},
    }
    q, s = quantize_weights_int8(params)
    assert q["conv"]["kernel"].dtype == jnp.int8
    assert s["conv"]["bias"] is None  # 1D passthrough
    dq = dequantize_weights(q, s, dtype=jnp.float32)
    err = np.abs(
        np.asarray(dq["conv"]["kernel"]) - np.asarray(params["conv"]["kernel"])
    )
    # quantization error bounded by scale/2 per channel
    scale = np.asarray(s["conv"]["kernel"])
    assert (err <= scale / 2 + 1e-6).all()
    np.testing.assert_array_equal(
        np.asarray(dq["conv"]["bias"]), np.asarray(params["conv"]["bias"])
    )


def test_fake_quant_ste_gradient():
    x = jnp.linspace(-2.0, 2.0, 9)
    scale = jnp.asarray(0.1)
    g = jax.grad(lambda x: jnp.sum(fake_quant(x, scale)))(x)
    # inside range: gradient 1 (straight-through)
    inside = np.abs(np.asarray(x) / 0.1) <= 127
    np.testing.assert_allclose(np.asarray(g)[inside], 1.0)


def test_qat_transform_quantizes_kernels_only():
    params = {"k": jnp.ones((2, 2)), "b": jnp.full((2,), 0.123456)}
    out = qat_transform_params(params)
    np.testing.assert_allclose(np.asarray(out["b"]), 0.123456)
    assert out["k"].shape == (2, 2)


def test_minmax_observer_scales():
    obs = MinMaxObserver()
    obs.observe("a", jnp.asarray([-2.0, 1.0]))
    obs.observe("a", jnp.asarray([0.5, 3.0]))
    s = obs.scales()
    assert s["a"] == 3.0 / 127.0


def test_allreduce_norm_host_averages():
    a = {"bn": {"mean": jnp.asarray([1.0]), "var": jnp.asarray([2.0])}}
    b = {"bn": {"mean": jnp.asarray([3.0]), "var": jnp.asarray([4.0])}}
    out = allreduce_norm_host([a, b])
    np.testing.assert_allclose(float(out["bn"]["mean"][0]), 2.0)
    np.testing.assert_allclose(float(out["bn"]["var"][0]), 3.0)


def test_precise_bn_recomputes_stats():
    from flax import linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9,
            )(x)

    model = Tiny()
    x0 = jnp.ones((4, 8))
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    batches = [jnp.full((4, 8), 5.0), jnp.full((4, 8), 7.0)]
    new_stats = precise_bn(
        model, variables["params"], variables["batch_stats"], batches
    )
    # with momentum-EMA from 0 the stats move toward mean 6 but the precise
    # average of the two mutated stats is deterministic and finite
    assert np.isfinite(np.asarray(new_stats["BatchNorm_0"]["mean"])).all()
    assert float(new_stats["BatchNorm_0"]["mean"][0]) > 0.0


def test_verify_results():
    from yolov7_d2_tpu.config import get_cfg
    from yolov7_d2_tpu.evaluation.testing import flatten_results, verify_results

    cfg = get_cfg()
    cfg.TEST.EXPECTED_RESULTS = [["AP", 0.40, 0.02]]
    assert verify_results(cfg, {"AP": 0.41})
    assert not verify_results(cfg, {"AP": 0.30})
    assert not verify_results(cfg, {"other": 0.40})
    flat = flatten_results({"bbox": {"AP": 1.0, "AP50": 2.0}})
    assert flat == {"bbox/AP": 1.0, "bbox/AP50": 2.0}
