"""Aggregate a jax profiler trace: device-op time by name-group and by source.

Usage: python tools/_parse_trace.py /tmp/jaxtrace_vitdet [topN]
Parses the newest *.trace.json.gz under the dir. Groups X events on device
(TPU) tracks; parent while-loops double-count their inner fusions (see
verify skill note), so both raw-name and source views are printed.
"""
import collections
import glob
import gzip
import json
import os
import re
import sys


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace_vitdet"
    topn = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    paths = sorted(
        glob.glob(os.path.join(root, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        print("no trace found under", root)
        return
    path = paths[-1]
    print("parsing", path)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]

    # find device pids: process_name metadata containing TPU/device
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if re.search(r"TPU|/device|Device|axon", n, re.I)}
    if not dev_pids:
        print("pids:", pid_names)
        dev_pids = set(pid_names)

    by_group = collections.Counter()
    by_source = collections.Counter()
    total = 0.0
    n = 0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        dur = e.get("dur", 0) / 1e3  # ms
        name = e.get("name", "")
        args = e.get("args") or {}
        # skip whole-program envelope events
        if name.startswith("jit_") or "program" in name:
            continue
        total += dur
        n += 1
        group = re.sub(r"[.\d]+$", "", name)
        by_group[group] += dur
        src = args.get("source") or args.get("tf_op") or ""
        if src:
            by_source[src] += dur

    print(f"\n{n} device events, {total:.1f} ms total (2 iters => /2 per iter)")
    print("\n== by op-name group ==")
    for k, v in by_group.most_common(topn):
        print(f"{v:10.2f} ms  {k}")
    print("\n== by source ==")
    for k, v in by_source.most_common(topn):
        print(f"{v:10.2f} ms  {k}")


if __name__ == "__main__":
    main()
