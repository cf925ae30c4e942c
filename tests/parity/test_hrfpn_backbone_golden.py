"""HRNet + HRFPN backbone parity against the reference
(dev/reference_oracle/make_goldens.py::golden_hrfpn_backbone, reference
projects/DensePose/densepose/modeling/hrnet.py + hrfpn.py).

Pins through our .pkl converter: the 2-conv stride-4 stem, the Bottleneck
layer1, the transitions (channel-adapting convs + new-branch downsample
chains), the HighResolutionModule branch towers and full fuse mesh
(1x1+BN+nearest-up / stride-2 conv chains), and HRFPN's padding-0 interp
deconvs + concat-crop + reduction convs + per-level fpn convs."""

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

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "goldens", "hrfpn_backbone.npz")


def test_hrfpn_backbone_reference_weights(tmp_path):
    if not os.path.exists(GOLDEN):
        pytest.skip("hrfpn golden not generated")
    g = np.load(GOLDEN)

    sd = {}
    for name, shape_s in zip(g["weight_names"], g["weight_shapes"]):
        shape = tuple(int(x) for x in str(shape_s).split(",") if x)
        sd[str(name)] = synth_weight_value(str(name), shape)
    pkl_path = tmp_path / "synthetic_hrfpn.pkl"
    with open(pkl_path, "wb") as f:
        pickle.dump({"model": sd, "__author__": "reference-oracle"}, f)

    from detectron2_tpu.checkpoint import DetectionCheckpointer
    from detectron2_tpu.config import get_cfg
    from detectron2_tpu.projects.densepose import add_densepose_config
    from detectron2_tpu.projects.densepose.hrfpn import HRFPN

    cfg = get_cfg()
    add_densepose_config(cfg)
    cfg.MODEL.HRNET.STAGE2.NUM_MODULES = 1
    cfg.MODEL.HRNET.STAGE2.NUM_BLOCKS = [2, 2]
    cfg.MODEL.HRNET.STAGE2.NUM_CHANNELS = [16, 32]
    cfg.MODEL.HRNET.STAGE3.NUM_MODULES = 2
    cfg.MODEL.HRNET.STAGE3.NUM_BLOCKS = [2, 2, 2]
    cfg.MODEL.HRNET.STAGE3.NUM_CHANNELS = [16, 32, 64]
    cfg.MODEL.HRNET.STAGE4.NUM_MODULES = 1
    cfg.MODEL.HRNET.STAGE4.NUM_BLOCKS = [2, 2, 2, 2]
    cfg.MODEL.HRNET.STAGE4.NUM_CHANNELS = [16, 32, 64, 128]
    cfg.MODEL.HRNET.HRFPN.OUT_CHANNELS = 64
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p1", "p2", "p3", "p4", "p5"]

    model = HRFPN.from_config(cfg)
    x = jnp.asarray(g["image"][None].astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    ckpt = DetectionCheckpointer(variables)
    ckpt.load(str(pkl_path))
    loaded = ckpt.params

    feats = model.apply(loaded, x, train=False)
    for i in range(5):
        key = f"p{i + 1}"
        ref = g[f"feat_{key}"][0].transpose(1, 2, 0)  # CHW -> HWC
        ours = np.asarray(feats[key][0])
        assert ours.shape == ref.shape, (key, ours.shape, ref.shape)
        err = np.abs(ours - ref).max()
        assert err < 5e-3, (key, err)
