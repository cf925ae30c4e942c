"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes its backends, so this conftest is
imported before any test module imports jax.
"""

import os

# FORCE cpu (the surrounding environment may export JAX_PLATFORMS=axon/tpu;
# the axon plugin ignores JAX_PLATFORMS, so the legacy JAX_PLATFORM_NAME is
# the override that actually works)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (prev + " --xla_force_host_platform_device_count=8").strip()
# keep compilation fast & deterministic in tests
os.environ.setdefault("JAX_ENABLE_X64", "0")


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables between test modules: the full suite compiles
    dozens of large CPU programs (e2e models on an 8-device mesh) and can
    otherwise exhaust host memory late in the run."""
    yield
    import gc

    import jax

    jax.clear_caches()
    gc.collect()
