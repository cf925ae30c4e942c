#!/usr/bin/env python
from setuptools import find_packages, setup

setup(
    name="detectron2_tpu",
    version="0.1.0",
    description="TPU-native detection & instance-segmentation framework (JAX/XLA/Pallas)",
    packages=find_packages(exclude=("tests", "tests.*", "configs", "tools", "demo")),
    package_data={"detectron2_tpu": ["csrc/*.cpp", "csrc/*.so"]},
    python_requires=">=3.10",
    # jax/flax/optax etc. are provided by the environment; no install_requires
    # so editable installs never touch the network.
    install_requires=[],
)
