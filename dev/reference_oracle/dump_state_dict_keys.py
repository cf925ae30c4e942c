#!/usr/bin/env python
"""Dump the reference model's state_dict key->shape table for every config in
OUR zoo that has a reference counterpart, vendored as a golden for
tests/test_converter_zoo_coverage.py.

The golden proves converter name coverage without torch at test time: the
test fabricates zero arrays of the dumped shapes, runs convert_d2_state_dict
against our model's (eval_shape) parameter tree, and asserts zero
unmatched/unconsumed keys — the analogue of the reference's heuristic
name matcher audit (reference checkpoint/c2_model_loading.py:208-330).

Identical architectures (e.g. 1x vs 3x schedules) share one signature entry,
so the golden stays small.

Run: python dev/reference_oracle/dump_state_dict_keys.py [--only SUBSTR]
Writes tests/goldens/reference_state_dict_keys.json.gz
"""

import argparse
import gc
import gzip
import hashlib
import json
import os
import sys
import traceback

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
OUT = os.path.join(REPO, "tests", "goldens", "reference_state_dict_keys.json.gz")

sys.path.insert(0, HERE)
import stubs  # noqa: E402

stubs.install()
sys.path.insert(0, "/root/reference")

# our-config-dir -> (reference project dir, python package to import, add_config fn)
PROJECT_MAP = {
    "Cityscapes-SemanticSegmentation": ("DeepLab", "deeplab", "add_deeplab_config"),
    "Cityscapes-PanopticSegmentation": (
        "Panoptic-DeepLab",
        "panoptic_deeplab",
        "add_panoptic_deeplab_config",
    ),
    "DensePose": ("DensePose", "densepose", "add_densepose_config"),
    "PointRend": ("PointRend", "point_rend", "add_pointrend_config"),
    # PointSup configs _BASE_ into PointRend and need both add-config fns
    # (reference projects/PointSup/train_net.py:17-70)
    "PointSup": ("PointSup", "point_sup", "add_point_sup_config"),
    "TensorMask": ("TensorMask", "tensormask", "add_tensormask_config"),
    "TridentNet": ("TridentNet", "tridentnet", "add_tridentnet_config"),
    # lazy-config projects need no add_config
    "MViTv2": ("MViTv2", None, None),
    "ViTDet": ("ViTDet", None, None),
    "Rethinking-BatchNorm": ("Rethinking-BatchNorm", None, None),
}

# Panoptic-DeepLab's COCO config lives in our COCO-PanopticSegmentation dir
SPECIAL = {
    "COCO-PanopticSegmentation/panoptic_deeplab_R_52_os16_mg124_poly_200k_bs64_crop_640_640_coco_dsconv.yaml": (
        "Panoptic-DeepLab",
        "panoptic_deeplab",
        "add_panoptic_deeplab_config",
        "/root/reference/projects/Panoptic-DeepLab/configs/COCO-PanopticSegmentation/"
        "panoptic_deeplab_R_52_os16_mg124_poly_200k_bs64_crop_640_640_coco_dsconv.yaml",
    ),
}


def find_reference(rel: str):
    """our configs/<rel> -> (ref_path, project_tuple or None), or None."""
    if rel in SPECIAL:
        proj, pkg, addfn, path = SPECIAL[rel]
        return path, (proj, pkg, addfn)
    core = os.path.join("/root/reference/configs", rel)
    if os.path.exists(core):
        return core, None
    top = rel.split("/", 1)
    if len(top) == 2 and top[0] in PROJECT_MAP:
        proj, pkg, addfn = PROJECT_MAP[top[0]]
        cfg_root = os.path.join("/root/reference/projects", proj, "configs")
        for sub in (rel, top[1]):  # projects keep or drop the top dir
            p = os.path.join(cfg_root, sub)
            if os.path.exists(p):
                return p, (proj, pkg, addfn)
        # the reference groups some projects into subdirs ours flattens
        # (PointRend/InstanceSegmentation, DensePose/HRNet, ViTDet/COCO...):
        # a unique basename match is the same config
        base = os.path.basename(rel)
        hits = []
        for root, _, files in os.walk(cfg_root):
            if base in files:
                hits.append(os.path.join(root, base))
        if len(hits) == 1:
            return hits[0], (proj, pkg, addfn)
    return None


EXTRA_DEPS = {
    # project -> projects whose package must also be importable/added first
    "PointSup": [("PointRend", "point_rend", "add_pointrend_config")],
}


def ensure_project(proj, pkg, addfn, cfg):
    for dep in EXTRA_DEPS.get(proj, []):
        ensure_project(*dep, cfg)
    path = os.path.join("/root/reference/projects", proj)
    if path not in sys.path:
        sys.path.insert(0, path)
    if pkg is not None and cfg is not None:
        mod = __import__(pkg, fromlist=[addfn])
        getattr(mod, addfn)(cfg)


def _neuter_cse_loads():
    """Zero-egress shims for CSE model *construction*: embedder INIT_FILE /
    MODEL.WEIGHTS loads only fill values (vertex_feature_embedder.py:63-77,
    embedder.py:95-115); the state_dict keys+shapes we dump are static."""
    dp = "/root/reference/projects/DensePose"
    if dp not in sys.path:
        sys.path.insert(0, dp)
    from densepose.modeling import cse as _cse

    _cse.vertex_direct_embedder.VertexDirectEmbedder.load = lambda self, fpath: None
    _cse.vertex_feature_embedder.VertexFeatureEmbedder.load = lambda self, fpath: None
    _cse.embedder.Embedder.load_from_model_checkpoint = (
        lambda self, fpath, prefix=None: None
    )


def build_yaml(ref_path, project):
    from detectron2.config import get_cfg
    from detectron2.modeling import build_model

    cfg = get_cfg()
    if project is not None:
        ensure_project(*project, cfg)
    cfg.merge_from_file(ref_path)
    cfg.MODEL.DEVICE = "cpu"
    return build_model(cfg)


def build_lazy(ref_path, project):
    from detectron2.config import LazyConfig, instantiate

    if project is not None:
        ensure_project(project[0], None, None, None)
    cfg = LazyConfig.load(ref_path)
    model = instantiate(cfg.model)
    return model


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="", help="substring filter on config relpath")
    args = ap.parse_args()

    our_configs = []
    for root, _, files in os.walk(os.path.join(REPO, "configs")):
        for f in sorted(files):
            if f.endswith((".yaml", ".py")) and "common" not in root:
                our_configs.append(os.path.relpath(os.path.join(root, f), os.path.join(REPO, "configs")))
    our_configs.sort()

    signatures = {}
    config_to_sig = {}
    if os.path.exists(OUT):  # merge into previous runs (supports --only)
        with gzip.open(OUT, "rt") as f:
            prev = json.load(f)
        signatures.update(prev.get("signatures", {}))
        config_to_sig.update(prev.get("configs", {}))
    failures = []
    skipped = []
    for rel in our_configs:
        if args.only and args.only not in rel:
            continue
        found = find_reference(rel)
        if found is None:
            skipped.append(rel)
            continue
        ref_path, project = found
        if "/cse/" in rel:
            # CSE embedder parameter SHAPES are fully static from the config
            # (NUM_VERTICES/FEATURE_DIM/EMBED_SIZE); only the INIT_FILE /
            # WEIGHTS *values* live in unfetchable pickles — no-op the loads
            _neuter_cse_loads()
        try:
            model = (build_lazy if rel.endswith(".py") else build_yaml)(ref_path, project)
            sd = {k: list(v.shape) for k, v in model.state_dict().items()}
            del model
            gc.collect()
        except Exception:
            failures.append((rel, traceback.format_exc(limit=8)))
            continue
        payload = json.dumps(sorted(sd.items()), sort_keys=True)
        sig = hashlib.sha1(payload.encode()).hexdigest()[:16]
        signatures.setdefault(sig, sd)
        config_to_sig[rel] = sig
        print(f"{rel}: {len(sd)} keys, sig {sig}")

    golden = {"signatures": signatures, "configs": config_to_sig}
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with gzip.open(OUT, "wt") as f:
        json.dump(golden, f)
    print(
        f"\nwrote {OUT}: {len(config_to_sig)} configs, {len(signatures)} unique "
        f"signatures, {len(skipped)} without reference counterpart, {len(failures)} failures"
    )
    for rel, tb in failures:
        print(f"\nFAILED {rel}\n{tb}")
    if skipped:
        print("no reference counterpart:", *skipped, sep="\n  ")


if __name__ == "__main__":
    main()
