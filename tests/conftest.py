"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes its backends, so this conftest is
imported before any test module imports jax.
"""

import os

# FORCE cpu (the surrounding environment may export JAX_PLATFORMS=axon/tpu)
os.environ["JAX_PLATFORMS"] = "cpu"
prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (prev + " --xla_force_host_platform_device_count=8").strip()
# keep compilation fast & deterministic in tests
os.environ.setdefault("JAX_ENABLE_X64", "0")
