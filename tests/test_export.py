import jax
import jax.numpy as jnp
import numpy as np

from yolov7_d2_tpu.deploy.export import (
    export_inference_fn,
    export_stablehlo,
    load_stablehlo,
)
from yolov7_d2_tpu.models.meta_arch.yolox import YOLOX


def test_stablehlo_roundtrip_simple(tmp_path):
    def fn(x):
        return jnp.sin(x) * 2.0

    x = jnp.arange(8.0)
    path = export_stablehlo(fn, (x,), str(tmp_path / "f.stablehlo"))
    loaded = load_stablehlo(path)
    out = loaded.call(x)
    np.testing.assert_allclose(np.asarray(out), np.sin(np.arange(8.0)) * 2,
                               rtol=1e-6)


def test_export_yolox_inference(tmp_path):
    model = YOLOX(num_classes=3, depth_mul=0.33, width_mul=0.125)
    imgs = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs, train=False)
    paths = export_inference_fn(
        model, variables, (1, 64, 64, 3), str(tmp_path / "export")
    )
    loaded = load_stablehlo(paths["stablehlo"])
    out = loaded.call(imgs)
    # exported graph reproduces the eager model
    ref = model.apply(variables, imgs, train=False)
    np.testing.assert_allclose(
        np.asarray(out["outputs"]), np.asarray(ref["outputs"]),
        rtol=1e-4, atol=1e-4,
    )
