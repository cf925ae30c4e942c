"""Doc-count gate: fails the suite when README.md / MODEL_ZOO.md quote stale
test/config counts, so drift breaks CI instead of recurring every round
(flagged rounds 2-4). The reference keeps docs honest through CI lint jobs
(reference .github/workflows/workflow.yml:23-25); here the counts themselves
are generated (dev/update_doc_counts.py) and this test enforces freshness.

The collected-test count comes from the live pytest session (counted by
tests/conftest.py::pytest_itemcollected before any -m/-k deselection), so the
gate costs nothing — no subprocess re-collection. It only enforces when the
invocation targeted the full tests/ tree; single-file runs skip.
"""

import importlib.util
import pathlib
import re

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _load_dev_module():
    spec = importlib.util.spec_from_file_location(
        "update_doc_counts", ROOT / "dev" / "update_doc_counts.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _invocation_targets_full_suite(config) -> bool:
    tests_dir = ROOT / "tests"
    invocation_dir = pathlib.Path(str(config.invocation_params.dir))
    for a in config.invocation_params.args:
        if a.startswith("-"):
            continue
        p = pathlib.Path(a)
        if not p.is_absolute():
            p = invocation_dir / p
        try:
            rp = p.resolve()
        except OSError:
            continue
        if rp in (tests_dir, ROOT):
            return True
    return False


def test_doc_counts_fresh(request):
    config = request.config
    n_tests = getattr(config, "_d2t_collected_total", 0)
    if not _invocation_targets_full_suite(config):
        pytest.skip("partial collection — doc-count gate only runs on `pytest tests/`")

    dev = _load_dev_module()
    n_cfgs = dev.count_configs()
    tests_floor = (n_tests // 10) * 10

    readme = (ROOT / "README.md").read_text()
    m = re.search(r"(\d+)\+ tests", readme)
    assert m, "README.md no longer contains the 'NNN+ tests' phrase"
    assert int(m.group(1)) == tests_floor, (
        f"README.md says '{m.group(1)}+ tests' but {n_tests} collected "
        f"(expected '{tests_floor}+'): run `python dev/update_doc_counts.py`"
    )

    zoo = (ROOT / "MODEL_ZOO.md").read_text()
    m = re.search(r"## Config families \((\d+) config files\)", zoo)
    assert m, "MODEL_ZOO.md no longer contains the config-count heading"
    assert int(m.group(1)) == n_cfgs, (
        f"MODEL_ZOO.md says {m.group(1)} config files but {n_cfgs} found: "
        f"run `python dev/update_doc_counts.py`"
    )
