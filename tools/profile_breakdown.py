#!/usr/bin/env python
"""Where does the step time go? Capture a device trace of any zoo config's
inference (or train step) and print a categorized per-iteration breakdown.

The reference publishes only end-to-end s/im (reference MODEL_ZOO.md); this
tool is how we turn "fast enough" into an optimization agenda: every XLA
device event is attributed to the model stage that emitted it (via the HLO
op's source metadata), so the output is a table like

    backbone.resnet      41.2 ms/it  38.1%
    roi_heads            22.7 ms/it  21.0%
    ops.nms               9.3 ms/it   8.6%
    ...

plus an op-class view (conv/matmul vs sort/scan vs copies) and the
device-busy vs wall-clock gap (host input feed + dispatch).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_breakdown.py \
      --config COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_3x.yaml \
      --batch 16 [--train] [--iters 4] [--markdown]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_zoo import build, make_batch  # noqa: E402


# ---------------------------------------------------------------- capture


def run_and_trace(args):
    import jax

    cfg, model, is_lazy = build(args.config)
    H, W = (int(s) for s in args.hw.split(","))
    B = args.batch
    if is_lazy:
        num_classes, with_masks, with_keypoints, with_sem_seg = 80, True, False, False
    else:
        num_classes = cfg.MODEL.ROI_HEADS.NUM_CLASSES
        with_masks = cfg.MODEL.MASK_ON
        with_keypoints = cfg.MODEL.KEYPOINT_ON
        with_sem_seg = cfg.MODEL.META_ARCHITECTURE in ("PanopticFPN", "SemanticSegmentor")
        if args.paste_in_graph:
            cfg.TPU.PASTE_MASKS_IN_GRAPH = True
            model = __import__(
                "detectron2_tpu.modeling", fromlist=["build_model"]
            ).build_model(cfg)
    with_densepose = (not is_lazy) and getattr(cfg.MODEL, "DENSEPOSE_ON", False)
    batch = make_batch(B, H, W, args.train, num_classes, with_masks, with_keypoints, with_sem_seg,
                       with_densepose=with_densepose)

    init_batch = jax.tree_util.tree_map(lambda x: x[:1], batch)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        init_batch,
        train=args.train,
    )

    if args.train:
        from detectron2_tpu.parallel import TrainState, make_train_step
        from detectron2_tpu.solver import build_optimizer

        if is_lazy:
            import optax

            tx = optax.sgd(0.01, momentum=0.9)
        else:
            cfg.SOLVER.MAX_ITER = 1000
            tx = build_optimizer(cfg, params)
        state = TrainState.create(params, tx)
        step = jax.jit(make_train_step(model))
        key = jax.random.PRNGKey(3)

        state, losses = step(state, batch, key)
        float(np.asarray(losses["total_loss"]))  # warm + sync

        def loop(n):
            nonlocal state
            for i in range(n):
                state, losses = step(state, batch, jax.random.fold_in(key, i))
            return float(np.asarray(losses["total_loss"]))

    else:
        import jax.numpy as jnp

        fwd = jax.jit(lambda p, b: model.apply(p, b, train=False))

        @jax.jit
        def _digest(o):
            d = jnp.asarray(0.0, jnp.float32)
            for k in ("scores", "pred_boxes"):
                if k in o:
                    d = d + o[k].sum().astype(jnp.float32)
            if "pred_masks_full" in o:
                d = d + o["pred_masks_full"][:, :, ::37, ::53].sum(dtype=jnp.int32).astype(
                    jnp.float32
                )
            elif "pred_masks" in o:
                d = d + o["pred_masks"].sum().astype(jnp.float32)
            return d

        out = fwd(params, batch)
        float(np.asarray(_digest(out)))  # warm + sync

        def loop(n):
            for _ in range(n):
                o = fwd(params, batch)
            return float(np.asarray(_digest(o)))

    trace_dir = args.trace_dir
    os.makedirs(trace_dir, exist_ok=True)
    loop(1)  # second warm iteration (autotuner settled)
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        loop(args.iters)
    wall_ms = (time.perf_counter() - t0) / args.iters * 1e3
    return trace_dir, wall_ms


# ---------------------------------------------------------------- parse

# op-class buckets by HLO op-name prefix (fusions are classified by source
# instead; this view catches the unfused structural ops)
_OP_CLASSES = [
    (r"^(convolution|conv)", "conv"),
    (r"^(dot|gemm)", "matmul"),
    (r"^(sort)", "sort"),
    (r"^(scatter)", "scatter"),
    (r"^(gather)", "gather"),
    (r"^(copy|transpose|bitcast|reshape)", "copy/layout"),
    (r"^(dynamic-slice|dynamic_update|dynamic-update)", "dyn-slice"),
    (r"^(reduce-window|reduce)", "reduce"),
    (r"^(select-and-scatter)", "pool-bwd"),
    (r"^(custom-call|tpu_custom_call)", "custom-call(pallas)"),
    (r"^(all-reduce|all-gather|reduce-scatter|collective)", "collective"),
    (r"^(while|body|condition)", "<control>"),
    (r"^(fusion|loop_)", "fusion"),
]


def classify_op(name):
    base = name.split("%")[-1].strip()
    for pat, label in _OP_CLASSES:
        if re.match(pat, base):
            return label
    return "other"


def module_of(source):
    """Map an HLO source string to a model-stage bucket.

    Sources look like 'detectron2_tpu/modeling/backbone/resnet.py:210' or a
    ;-separated stack. Use the deepest detectron2_tpu frame; collapse to
    package-relative module path without extension.
    """
    best = None
    for frame in source.split(";"):
        m = re.search(r"detectron2_tpu/([\w/]+)\.py", frame)
        if m:
            best = m.group(1).replace("/", ".")
    if best:
        return best
    m = re.search(r"(?:^|/)(\w+)\.py", source)
    return m.group(1) if m else source[:60]


def parse(trace_dir, iters, topn):
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise SystemExit(f"no trace under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]

    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if re.search(r"TPU|/device|Device|axon", n, re.I)}
    if not dev_pids:
        dev_pids = set(pid_names)

    by_module = collections.Counter()
    by_class = collections.Counter()
    unattributed = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        if name.startswith("jit_") or "program" in name:
            continue
        cls = classify_op(name)
        if cls == "<control>":
            # while-loop envelopes double-count their inner fusions
            continue
        dur = e.get("dur", 0) / 1e3 / iters  # ms per iteration
        args = e.get("args") or {}
        total += dur
        by_class[cls] += dur
        src = args.get("source") or args.get("tf_op") or ""
        if src:
            by_module[module_of(src)] += dur
        else:
            unattributed[re.sub(r"[.\d]+$", "", name)] += dur
    return total, by_module, by_class, unattributed


# ---------------------------------------------------------------- report


def report(total, by_module, by_class, unattributed, wall_ms, iters, topn, markdown):
    unattr_total = sum(unattributed.values())
    if markdown:
        print(f"\n| stage (source module) | ms/it | % of device time |")
        print("|---|---|---|")
        for k, v in by_module.most_common(topn):
            print(f"| {k} | {v:.2f} | {100 * v / total:.1f}% |")
        if unattr_total:
            print(f"| (no source metadata) | {unattr_total:.2f} | {100 * unattr_total / total:.1f}% |")
        print(f"| **device busy total** | **{total:.2f}** | |")
        print(f"| wall clock / iter | {wall_ms:.2f} | device idle {wall_ms - total:.2f} ms |")
        print(f"\n| op class | ms/it | % |")
        print("|---|---|---|")
        for k, v in by_class.most_common(topn):
            print(f"| {k} | {v:.2f} | {100 * v / total:.1f}% |")
    else:
        print(f"\ndevice busy {total:.2f} ms/it; wall {wall_ms:.2f} ms/it "
              f"(idle/host {wall_ms - total:.2f} ms)")
        print("\n== by model stage (source module) ==")
        for k, v in by_module.most_common(topn):
            print(f"{v:9.2f} ms  {100 * v / total:5.1f}%  {k}")
        if unattr_total:
            print(f"{unattr_total:9.2f} ms  {100 * unattr_total / total:5.1f}%  (no source metadata)")
            for k, v in unattributed.most_common(8):
                print(f"          ..{v:8.2f} ms  {k}")
        print("\n== by op class ==")
        for k, v in by_class.most_common(topn):
            print(f"{v:9.2f} ms  {100 * v / total:5.1f}%  {k}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--hw", default="800,1344")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--paste-in-graph", action="store_true",
                    help="bench.py parity: full-frame mask paste inside the jit")
    ap.add_argument("--trace-dir", default="/tmp/jaxtrace_breakdown")
    ap.add_argument("--topn", type=int, default=25)
    ap.add_argument("--markdown", action="store_true")
    ap.add_argument("--parse-only", action="store_true",
                    help="skip the run; parse the newest trace in --trace-dir")
    args = ap.parse_args()

    if args.parse_only:
        trace_dir, wall_ms = args.trace_dir, float("nan")
    else:
        trace_dir, wall_ms = run_and_trace(args)
        print(f"trace captured to {trace_dir}; wall {wall_ms:.2f} ms/it")
    total, by_module, by_class, unattr = parse(trace_dir, args.iters, args.topn)
    report(total, by_module, by_class, unattr, wall_ms, args.iters, args.topn, args.markdown)


if __name__ == "__main__":
    main()
