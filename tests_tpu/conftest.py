"""TPU-tier tests: run on a REAL chip, opt-in (`python -m pytest tests_tpu/`).

Unlike tests/conftest.py this does NOT force the CPU backend — these tests
gate behavior that only exists on TPU (approx_max_k recall, Pallas kernel
dispatch). Skipped wholesale when no TPU is attached so the tier is safe to
include in any runner.
"""

import jax
import pytest


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() == "tpu":
        return
    skip = pytest.mark.skip(reason=f"requires a TPU backend (got {jax.default_backend()})")
    for item in items:
        item.add_marker(skip)
