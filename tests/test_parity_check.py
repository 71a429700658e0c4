import jax
import jax.numpy as jnp
import numpy as np

from yolov7_d2_tpu.models.backbones.darknetx import CSPDarknetX
from yolov7_d2_tpu.utils.parity_check import (
    capture_activations,
    diff_report,
    first_divergence,
    to_nhwc,
)


def test_capture_activations_yields_layers():
    bb = CSPDarknetX(dep_mul=0.33, wid_mul=0.125)
    x = jnp.ones((1, 64, 64, 3))
    v = bb.init(jax.random.PRNGKey(0), x)
    acts = capture_activations(bb, v, x)
    assert len(acts) > 10
    assert any("stem" in k for k in acts)


def test_to_nhwc_transposes_4d():
    nchw = np.zeros((1, 3, 8, 8))
    assert to_nhwc(nchw).shape == (1, 8, 8, 3)
    # non-4D passes through
    assert to_nhwc(np.zeros((5, 7))).shape == (5, 7)


def test_diff_report_self_comparison_passes():
    bb = CSPDarknetX(dep_mul=0.33, wid_mul=0.125)
    x = jnp.ones((1, 64, 64, 3))
    v = bb.init(jax.random.PRNGKey(0), x)
    acts = capture_activations(bb, v, x)
    rows = diff_report(acts, acts)
    assert all(ok for _, _, _, ok in rows)
    assert first_divergence(rows) is None


def test_diff_report_nchw_reference():
    ours = {"l": np.arange(24.0).reshape(1, 2, 3, 4)}
    ref_nchw = {"l": np.transpose(np.arange(24.0).reshape(1, 2, 3, 4),
                                  (0, 3, 1, 2))}
    rows = diff_report(ours, ref_nchw, ref_is_nchw=True)
    assert all(ok for *_, ok in rows)


def test_diff_report_catches_divergence():
    a = {"layer1": np.ones((1, 4, 4, 2)), "layer2": np.ones((1, 4, 4, 2))}
    b = {"layer1": np.ones((1, 4, 4, 2)),
         "layer2": np.ones((1, 4, 4, 2)) * 5.0}
    rows = diff_report(a, b)
    assert first_divergence(rows) == "layer2"
    # missing layer reported as failure
    rows2 = diff_report(a, {"layer3": np.ones((2, 2))})
    assert first_divergence(rows2) == "layer3"
