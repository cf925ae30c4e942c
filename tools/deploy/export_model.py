#!/usr/bin/env python
"""Export a model for deployment (the role of reference
tools/deploy/export_model.py, re-targeted from torchscript/caffe2 to the
TPU-native artifacts):

- ``--format stablehlo``: serialize the jitted inference function to a
  portable StableHLO artifact loadable by any PJRT runtime (jax.export).
- ``--format aot``: ahead-of-time compile for this host's devices and report
  cost analysis (pairs with JAX's persistent compilation cache for serving).
- ``--format executable``: AOT compile AND serialize the PJRT executable
  itself (``--output model.jaxexec``) — a serving process loads it with
  ``detectron2_tpu.export.load_compiled`` and runs with zero compilation.
  Device- and compiler-version-specific; regenerate per rollout.

Example:
    python tools/deploy/export_model.py \
        --config-file configs/COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_3x.yaml \
        --output ./out.stablehlo --format stablehlo --height 800 --width 1344
"""

import argparse

import numpy as np

import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--output", default=None)
    ap.add_argument("--format", choices=["stablehlo", "aot", "executable"], default="stablehlo")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--height", type=int, default=800)
    ap.add_argument("--width", type=int, default=1344)
    ap.add_argument("--weights", default=None, help="checkpoint to load (else random init)")
    ap.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = ap.parse_args()

    import jax

    from detectron2_tpu.checkpoint import DetectionCheckpointer
    from detectron2_tpu.config import get_cfg
    from detectron2_tpu.export import aot_compile, export_stablehlo, save_compiled
    from detectron2_tpu.modeling import build_model

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    model = build_model(cfg)

    B, H, W = args.batch, args.height, args.width
    example = {
        "image": jnp.zeros((B, H, W, 3), jnp.uint8),
        "image_sizes": jnp.tile(jnp.asarray([[H, W]], jnp.int32), (B, 1)),
    }
    variables = model.init({"params": jax.random.PRNGKey(0)}, example, train=False)
    if args.weights:
        ckpt = DetectionCheckpointer(variables)
        ckpt.load(args.weights)
        variables = ckpt.model

    def infer(batch):
        return model.apply(variables, batch, train=False)

    if args.format == "stablehlo":
        blob = export_stablehlo(infer, example, path=args.output)
        print(f"exported {len(blob)} bytes of StableHLO" + (f" to {args.output}" if args.output else ""))
    else:
        compiled = aot_compile(infer, example)
        print("AOT compiled for", jax.devices()[0].platform)
        cost = compiled.cost_analysis()
        if cost:
            print("estimated flops:", cost.get("flops"))
        if args.format == "executable":
            out = args.output or "model.jaxexec"
            save_compiled(compiled, out)
            print("serialized executable to", out)


if __name__ == "__main__":
    main()
