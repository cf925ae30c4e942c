#!/usr/bin/env python
"""Regenerate the measured counts quoted in README.md / MODEL_ZOO.md from the
repo itself, so the docs can't drift from reality again (stale test/config
counts were flagged in rounds 2 AND 3).

Counts are injected between literal markers already present in the docs:
  README.md:    "<N>+ tests"        -> collected test count (floored to 10s)
  MODEL_ZOO.md: "(<N> config files)" -> find configs -name '*.yaml' -o '*.py'

Usage: PYTHONPATH=/root/repo python dev/update_doc_counts.py [--check]
--check exits 1 when the docs are stale instead of rewriting them (CI/test
hook).
"""

import argparse
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def collected_test_count() -> int:
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=600,
    )
    m = re.search(r"(\d+) tests collected", out.stdout)
    if not m:
        m = re.search(r"(\d+)/(\d+) tests collected", out.stdout)
        if m:
            return int(m.group(2))
        raise RuntimeError(f"could not parse pytest collect output:\n{out.stdout[-2000:]}")
    return int(m.group(1))


def config_file_count() -> int:
    n = 0
    for root, _dirs, files in os.walk(os.path.join(REPO, "configs")):
        n += sum(1 for f in files if f.endswith((".yaml", ".py")) and f != "__init__.py")
    return n


def patch(path: str, pattern: str, repl: str, check: bool) -> bool:
    with open(path) as f:
        text = f.read()
    new = re.sub(pattern, repl, text)
    if new == text:
        return False
    if check:
        print(f"STALE: {path}: /{pattern}/ -> {repl}")
        return True
    with open(path, "w") as f:
        f.write(new)
    print(f"updated {path}: {repl}")
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    tests = collected_test_count()
    tests_floor = tests // 10 * 10
    configs = config_file_count()

    changed = False
    changed |= patch(
        os.path.join(REPO, "README.md"),
        r"\d+\+ tests",
        f"{tests_floor}+ tests",
        args.check,
    )
    changed |= patch(
        os.path.join(REPO, "MODEL_ZOO.md"),
        r"\(\d+ config files\)",
        f"({configs} config files)",
        args.check,
    )
    print(f"measured: {tests} tests collected, {configs} config files")
    if args.check and changed:
        sys.exit(1)


if __name__ == "__main__":
    main()
