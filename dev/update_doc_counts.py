#!/usr/bin/env python
"""Regenerate the counts quoted in README.md / MODEL_ZOO.md from the repo
itself, so they cannot drift (rounds 2 and 3 both flagged stale hand-written
test/config counts).

Rewrites in place:
  * README.md   — the "NNN+ tests" phrase, from `pytest --collect-only`
  * MODEL_ZOO.md — the "## Config families (N config files)" heading, from
    `find configs -name '*.yaml' -o -name '*.py'`

Run from the repo root (CI-free environment: run it by hand after adding
tests/configs, or let the round driver call it):

    python dev/update_doc_counts.py [--check]

--check exits 1 if any file would change (usable as a test gate).
"""

import argparse
import pathlib
import re
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent


def count_tests() -> int:
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", "--collect-only"],
        cwd=ROOT,
        capture_output=True,
        text=True,
    )
    m = re.search(r"(\d+) tests collected", out.stdout)
    if not m:
        raise RuntimeError(f"could not parse collected-test count:\n{out.stdout[-2000:]}")
    return int(m.group(1))


def count_configs() -> int:
    return sum(1 for p in (ROOT / "configs").rglob("*") if p.suffix in (".yaml", ".py"))


def rewrite(path: pathlib.Path, pattern: str, repl: str, check: bool) -> bool:
    text = path.read_text()
    new, n = re.subn(pattern, repl, text)
    if n == 0:
        raise RuntimeError(f"{path.name}: pattern {pattern!r} not found — doc layout changed?")
    if new == text:
        return False
    if not check:
        path.write_text(new)
    return True


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true", help="exit 1 if docs are stale, change nothing")
    args = ap.parse_args()

    n_tests = count_tests()
    n_cfgs = count_configs()
    # round tests down to the nearest 10 for a stable "NNN+" phrasing
    tests_floor = (n_tests // 10) * 10

    changed = []
    if rewrite(ROOT / "README.md", r"\d+\+ tests", f"{tests_floor}+ tests", args.check):
        changed.append("README.md")
    if rewrite(
        ROOT / "MODEL_ZOO.md",
        r"## Config families \(\d+ config files\)",
        f"## Config families ({n_cfgs} config files)",
        args.check,
    ):
        changed.append("MODEL_ZOO.md")

    print(f"tests collected: {n_tests} (doc says {tests_floor}+); configs: {n_cfgs}")
    if changed:
        verb = "STALE" if args.check else "updated"
        print(f"{verb}: {', '.join(changed)}")
        return 1 if args.check else 0
    print("docs up to date")
    return 0


if __name__ == "__main__":
    sys.exit(main())
