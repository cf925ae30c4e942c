#!/usr/bin/env python
"""Convert a torchvision ResNet checkpoint into a d2-style .pkl that this
framework's checkpoint converter can ingest
(reference tools/convert-torchvision-to-d2.py).

Usage:
    python tools/convert_torchvision_to_d2t.py r50.pth r50.pkl

Then use MODEL.WEIGHTS=r50.pkl with
MODEL.PIXEL_MEAN=[123.675, 116.280, 103.530], PIXEL_STD=[58.395, 57.120, 57.375],
INPUT.FORMAT=RGB, MODEL.RESNETS.STRIDE_IN_1X1=False.
"""

import pickle as pkl
import sys

import numpy as np


def convert(obj: dict) -> dict:
    newmodel = {}
    for k in list(obj.keys()):
        old_k = k
        if "layer" not in k:
            k = "stem." + k
        for t in [1, 2, 3, 4]:
            k = k.replace(f"layer{t}", f"res{t + 1}")
        for t in [1, 2, 3]:
            k = k.replace(f"bn{t}", f"conv{t}.norm")
        k = k.replace("downsample.0", "shortcut")
        k = k.replace("downsample.1", "shortcut.norm")
        print(old_k, "->", k)
        newmodel[k] = np.asarray(obj.pop(old_k)).copy()
    return newmodel


if __name__ == "__main__":
    input_path, output_path = sys.argv[1], sys.argv[2]
    if input_path.endswith(".pth"):
        import torch

        obj = torch.load(input_path, map_location="cpu")
        obj = {k: v.numpy() for k, v in obj.items()}
    else:
        with open(input_path, "rb") as f:
            obj = pkl.load(f)
            obj = obj.get("model", obj)

    res = {"model": convert(obj), "__author__": "torchvision", "matching_heuristics": True}
    with open(output_path, "wb") as f:
        pkl.dump(res, f)
