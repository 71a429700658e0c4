"""Test environment: force an 8-virtual-device CPU platform BEFORE jax import.

This is the TPU analogue of a fake distributed backend (the reference has
none — SURVEY.md §4): every multi-chip sharding test runs on a CPU mesh of 8
XLA host devices, so ``pjit`` partitioning and collectives are exercised
without hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "float32")
