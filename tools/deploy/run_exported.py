#!/usr/bin/env python
"""Load and run a StableHLO artifact produced by export_model.py — the
deploy-side half (the role of reference tools/deploy/torchscript_mask_rcnn.cpp,
on the PJRT runtime instead of libtorch).

    python tools/deploy/run_exported.py out.stablehlo --height 800 --width 1344

.jaxexec artifacts are pickles: loading one executes arbitrary code. Only
run executables you exported yourself.
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("artifact")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--height", type=int, default=800)
    ap.add_argument("--width", type=int, default=1344)
    args = ap.parse_args()

    import jax.numpy as jnp

    if args.artifact.endswith(".jaxexec"):
        # persistent-executable artifact: zero compilation at load
        from detectron2_tpu.export import load_compiled

        call = load_compiled(args.artifact)
    else:
        from jax import export as jax_export

        with open(args.artifact, "rb") as f:
            call = jax_export.deserialize(bytearray(f.read())).call

    B, H, W = args.batch, args.height, args.width
    batch = {
        "image": jnp.zeros((B, H, W, 3), jnp.uint8),
        "image_sizes": jnp.tile(jnp.asarray([[H, W]], jnp.int32), (B, 1)),
    }
    out = call(batch)
    for k, v in out.items():
        print(k, getattr(v, "shape", type(v)))


if __name__ == "__main__":
    main()
