"""Zoo-wide converter name-coverage audit (the analogue of the reference's
heuristic name-matcher audit, reference checkpoint/c2_model_loading.py:208-330).

tests/goldens/reference_state_dict_keys.json.gz holds, for every config in
OUR zoo with a reference counterpart, the reference model's real
state_dict key -> shape table (vendored by
dev/reference_oracle/dump_state_dict_keys.py, which builds each reference
model on CPU torch). This test fabricates zero tensors of those shapes and
runs our d2 converter against OUR model's parameter tree (jax.eval_shape —
no weights materialized), asserting a perfect bipartite match:

- every one of our parameter leaves is loaded from the reference checkpoint
  (no "Randomly initialized" leftovers),
- every reference key is consumed (no "Unused checkpoint keys"),
- no shape mismatches.

Configs sharing a state_dict signature (e.g. 1x vs 3x schedules) are tested
once through a representative, so the sweep covers every unique architecture
in the zoo rather than every schedule variant.
"""

import gc
import gzip
import json
import os

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.slow

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_GOLDEN = os.path.join(_REPO, "tests", "goldens", "reference_state_dict_keys.json.gz")

if os.path.exists(_GOLDEN):
    with gzip.open(_GOLDEN, "rt") as f:
        _DATA = json.load(f)
else:  # pragma: no cover
    _DATA = {"signatures": {}, "configs": {}}


def _representatives():
    """One (config, signature) per unique reference state_dict signature;
    prefer the shortest config path as the representative."""
    by_sig = {}
    for rel, sig in sorted(_DATA["configs"].items(), key=lambda kv: (len(kv[0]), kv[0])):
        by_sig.setdefault(sig, rel)
    return sorted((rel, sig) for sig, rel in by_sig.items())


# our-config-dir -> add-config functions to apply before merge (mirrors
# dev/reference_oracle/dump_state_dict_keys.py PROJECT_MAP)
def _add_cfg_fns(rel):
    top = rel.split("/", 1)[0]
    fns = []
    if top == "DensePose":
        from detectron2_tpu.projects.densepose import add_densepose_config

        fns = [add_densepose_config]
    elif top == "Cityscapes-SemanticSegmentation":
        from detectron2_tpu.projects.deeplab import add_deeplab_config

        fns = [add_deeplab_config]
    elif top == "Cityscapes-PanopticSegmentation" or "panoptic_deeplab" in rel:
        from detectron2_tpu.projects.panoptic_deeplab import add_panoptic_deeplab_config

        fns = [add_panoptic_deeplab_config]
    elif top == "PointRend":
        from detectron2_tpu.projects.point_rend import add_pointrend_config

        fns = [add_pointrend_config]
    elif top == "PointSup":
        from detectron2_tpu.projects.point_rend import add_pointrend_config
        from detectron2_tpu.projects.point_sup import add_point_sup_config

        fns = [add_pointrend_config, add_point_sup_config]
    elif top == "TensorMask":
        from detectron2_tpu.projects.tensormask import add_tensormask_config

        fns = [add_tensormask_config]
    elif top == "TridentNet":
        from detectron2_tpu.projects.tridentnet import add_tridentnet_config

        fns = [add_tridentnet_config]
    return fns


def _build_our_model(rel):
    path = os.path.join(_REPO, "configs", rel)
    if rel.endswith(".py"):
        from detectron2_tpu.config import LazyConfig, instantiate

        cfg = LazyConfig.load(path)
        return instantiate(cfg.model)
    from detectron2_tpu.config import get_cfg
    from detectron2_tpu.modeling import build_model

    cfg = get_cfg()
    for fn in _add_cfg_fns(rel):
        fn(cfg)
    cfg.merge_from_file(path)
    return build_model(cfg)


def _param_zeros(model):
    """Our variables pytree as zero arrays, via eval_shape (no compile)."""
    # 256x256: eval_shape never materializes compute, and HRFPN's stride-16
    # reduction level needs >= ~256px inputs to keep every pyramid level
    # non-empty (the reference's AvgPool2d(16) has the same constraint)
    batch = {
        "image": np.zeros((1, 256, 256, 3), np.float32),
        "image_sizes": np.asarray([[256, 256]], np.int32),
        # precomputed-proposal fields for RPN-less Fast R-CNN configs
        # (rcnn.py:105-107); models with a proposal generator ignore them
        "proposal_boxes": np.zeros((1, 8, 4), np.float32),
        "proposal_logits": np.zeros((1, 8), np.float32),
        "proposal_valid": np.zeros((1, 8), bool),
    }
    rngs = {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}
    shapes = jax.eval_shape(lambda r, b: model.init(r, b, train=False), rngs, batch)
    return jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype), shapes)


@pytest.mark.skipif(not _DATA["configs"], reason="reference key golden not generated")
@pytest.mark.parametrize("rel,sig", _representatives(), ids=lambda v: v if isinstance(v, str) and "/" in v else "")
def test_converter_covers_reference_keys(rel, sig):
    from detectron2_tpu.checkpoint.d2_converter import convert_d2_state_dict

    sd_shapes = _DATA["signatures"][sig]
    fake_sd = {k: np.zeros(shape, np.float32) for k, shape in sd_shapes.items()}

    model = _build_our_model(rel)
    params = _param_zeros(model)
    _, report = convert_d2_state_dict(fake_sd, params)
    del model, params, fake_sd
    gc.collect()

    others = sorted(_c for _c, s in _DATA["configs"].items() if s == sig and _c != rel)
    ctx = f"config {rel} (also covers {len(others)} same-signature configs)"
    assert "Randomly initialized" not in report, f"{ctx}:\n{report}"
    assert "Unused checkpoint keys" not in report, f"{ctx}:\n{report}"
    assert "Shape mismatches" not in report, f"{ctx}:\n{report}"
