"""End-to-end SemanticSegmentor parity against the reference — the fully
deterministic per-pixel path (no NMS/top-k anywhere): pins SemSegFPNHead's
scale-head upsampling sums, GN conv stacks, and the final common-stride
upsample (reference modeling/meta_arch/semantic_seg.py:143-260)."""

import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

try:
    from .test_e2e_maskrcnn_golden import synth_weight_value
except ImportError:  # direct-script usage
    from test_e2e_maskrcnn_golden import synth_weight_value

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "goldens", "e2e_semseg_r18.npz")


def _our_cfg():
    from detectron2_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "SemanticSegmentor"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.OUT_CHANNELS = 64
    cfg.MODEL.SEM_SEG_HEAD.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 9
    cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM = 32
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def test_e2e_semseg_reference_weights(tmp_path):
    if not os.path.exists(GOLDEN):
        pytest.skip("semseg e2e golden not generated")
    g = np.load(GOLDEN)

    sd = {}
    for name, shape_s in zip(g["weight_names"], g["weight_shapes"]):
        shape = tuple(int(x) for x in str(shape_s).split(",") if x)
        sd[str(name)] = synth_weight_value(str(name), shape)
    pkl_path = tmp_path / "synthetic_semseg.pkl"
    with open(pkl_path, "wb") as f:
        pickle.dump({"model": sd, "__author__": "reference-oracle"}, f)

    from detectron2_tpu.checkpoint import DetectionCheckpointer
    from detectron2_tpu.modeling import build_model

    cfg = _our_cfg()
    model = build_model(cfg)
    batch = {
        "image": jnp.asarray(g["image"][None].astype(np.float32)),
        "image_sizes": jnp.asarray([[320, 320]], jnp.int32),
    }
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    ckpt = DetectionCheckpointer(variables)
    ckpt.load(str(pkl_path))
    variables = ckpt.params
    assert "Unused checkpoint keys" not in ckpt.last_report, ckpt.last_report
    assert "Randomly initialized" not in ckpt.last_report, ckpt.last_report

    out = model.apply(variables, batch, train=False)
    ours = np.asarray(out["sem_seg"][0])  # [320, 320, 9]
    ref = g["sem_seg"].transpose(1, 2, 0)  # [9, 320, 320] -> HWC
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    err = np.abs(ours - ref).max()
    assert err < 2e-3, err
    # argmax labels identical except at numerically tied boundaries
    agree = (ours.argmax(-1) == ref.argmax(-1)).mean()
    assert agree > 0.999, agree
