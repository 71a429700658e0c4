"""Package install (parity with the reference's pip package
/root/reference/setup.py, renamed for the TPU-native framework)."""

import os

from setuptools import find_packages, setup


def read_version():
    with open(
        os.path.join(os.path.dirname(__file__), "yolov7_d2_tpu", "__init__.py")
    ) as f:
        for line in f:
            if line.startswith("__version__"):
                return line.split("=")[1].strip().strip('"')
    return "0.0.0"


setup(
    name="yolov7_d2_tpu",
    version=read_version(),
    description=(
        "TPU-native (JAX/XLA/Pallas) detection, instance segmentation and "
        "keypoint framework with the capability surface of yolov7_d2"
    ),
    packages=find_packages(exclude=("tests", "tools", "deploy")),
    python_requires=">=3.10",
    install_requires=[
        "jax", "flax", "optax", "orbax-checkpoint", "numpy",
        "opencv-python", "pyyaml",
    ],
)
