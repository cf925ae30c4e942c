#!/usr/bin/env python
"""Analyze flops / parameters / structure of a model
(reference tools/analyze_model.py)."""

import numpy as np

import detectron2_tpu.data.datasets  # noqa
from detectron2_tpu.config import get_cfg
from detectron2_tpu.engine import default_argument_parser
from detectron2_tpu.modeling import build_model
from detectron2_tpu.utils.analysis import FlopCountAnalysis, parameter_count_table


def setup(args):
    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.freeze()
    return cfg


def main():
    parser = default_argument_parser()
    parser.add_argument("--tasks", choices=["flop", "param", "structure"], nargs="+", default=["param"])
    parser.add_argument("--image-size", type=int, nargs=2, default=[800, 1344])
    args = parser.parse_args()

    import jax

    cfg = setup(args)
    model = build_model(cfg)
    H, W = args.image_size
    batch = {
        "image": np.zeros((1, H, W, 3), np.float32),
        "image_sizes": np.asarray([[H, W]], np.int32),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, batch, train=False
    )

    for task in args.tasks:
        if task == "param":
            print(parameter_count_table(params))
        elif task == "flop":
            fca = FlopCountAnalysis(lambda p, b: model.apply(p, b, train=False), (params, batch))
            print(f"total inference flops: {fca.total() / 1e9:.2f} GFLOPs")
            print(f"bytes accessed: {fca.bytes_accessed() / 1e9:.2f} GB")
        elif task == "structure":
            import jax

            print(model)
            print(
                jax.tree_util.tree_map(lambda x: tuple(x.shape), params)
            )


if __name__ == "__main__":
    main()
