"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes its backends, so this conftest is
imported before any test module imports jax.
"""

import os

# FORCE cpu. The environment imports jax (and the axon TPU plugin) at
# interpreter startup via a .pth hook, so mutating JAX_PLATFORMS here is too
# late — only jax.config.update still takes effect (backends are initialized
# lazily on first use, which is after conftest). Without this, the whole
# suite silently runs against the single tunneled TPU chip and fails with
# FAILED_PRECONDITION contention errors.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (prev + " --xla_force_host_platform_device_count=8").strip()
# keep compilation fast & deterministic in tests
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()


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


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: full-model compiles (e2e / parity / project tests); "
        "deselect with -m 'not slow' for a fast unit tier (~5 min)",
    )


def pytest_itemcollected(item):
    """Count every collected item BEFORE -m/-k deselection: this is the same
    number `pytest --collect-only` reports, harvested for free so the
    doc-count gate (tests/test_doc_counts.py) does not need a subprocess
    re-collection. Incremented per item because deselection later removes
    items from session.items."""
    cfg = item.session.config
    cfg._d2t_collected_total = getattr(cfg, "_d2t_collected_total", 0) + 1


def pytest_collection_modifyitems(config, items):
    """Auto-mark the compile-heavy tiers: everything under tests/parity/ and
    tests/projects/, plus e2e/TTA/ViTDet model tests. The remaining fast
    tier (structures/ops/data/config/engine units) runs in a few minutes."""
    slow_dirs = (f"tests{os.sep}parity", f"tests{os.sep}projects")
    slow_files = (
        "test_rcnn_e2e.py",
        "test_meta_archs.py",
        "test_vitdet.py",
        "test_tta.py",
        "test_roi_align_pallas_bwd.py",
    )
    for item in items:
        p = str(item.fspath)
        if any(d in p for d in slow_dirs) or any(p.endswith(f) for f in slow_files):
            item.add_marker(pytest.mark.slow)
