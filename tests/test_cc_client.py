"""C++ PJRT serving client: build + export-artifact integration.

The on-TPU execution path is exercised manually (deploy/cc/README.md) since
tests run on the CPU platform where no standalone PJRT plugin .so exists;
here we verify the client builds and the MLIR export artifacts are valid.
"""

import os
import subprocess

import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CC_DIR = os.path.join(REPO, "deploy", "cc")


def _toolchain_available():
    try:
        subprocess.run(["g++", "--version"], capture_output=True, check=True)
        return True
    except Exception:
        return False


@pytest.mark.skipif(not _toolchain_available(), reason="no g++")
def test_client_builds():
    r = subprocess.run(["make", "-C", CC_DIR], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert os.path.exists(os.path.join(CC_DIR, "pjrt_infer"))


def test_mlir_export_artifacts(tmp_path):
    from yolov7_d2_tpu.deploy.export import export_mlir

    def f(x):
        return jnp.tanh(x) + 1.0

    paths = export_mlir(f, (jnp.zeros(4),), str(tmp_path))
    mlir = open(paths["mlir"]).read()
    assert "stablehlo" in mlir or "mhlo" in mlir or "func.func" in mlir
    assert os.path.getsize(paths["compile_options"]) > 100


def test_client_usage_message():
    exe = os.path.join(CC_DIR, "pjrt_infer")
    if not os.path.exists(exe):
        pytest.skip("client not built")
    r = subprocess.run([exe], capture_output=True, text=True)
    assert r.returncode == 2
    assert "usage" in r.stderr
