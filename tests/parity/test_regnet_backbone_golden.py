"""RegNetY backbone parity against the reference: pins the width-ladder
parameterization, grouped SE bottleneck blocks with running-stats BN, and the
RegNet converter name mapping (reference modeling/backbone/regnet.py)."""

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

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "goldens", "regnet_backbone.npz")


def test_regnet_backbone_reference_weights(tmp_path):
    if not os.path.exists(GOLDEN):
        pytest.skip("regnet backbone golden not generated")
    g = np.load(GOLDEN)

    sd = {}
    for name, shape_s in zip(g["weight_names"], g["weight_shapes"]):
        shape = tuple(int(x) for x in str(shape_s).split(",") if x)
        sd[str(name)] = synth_weight_value(str(name), shape)
    pkl_path = tmp_path / "synthetic_regnet.pkl"
    with open(pkl_path, "wb") as f:
        pickle.dump({"model": sd, "__author__": "reference-oracle"}, f)

    from detectron2_tpu.checkpoint import DetectionCheckpointer
    from detectron2_tpu.modeling.backbone.regnet import RegNet

    bb = RegNet(
        stem_width=16,
        depth=8,
        w_a=24.48,
        w_0=24,
        w_m=2.54,
        group_width=8,
        se_ratio=0.25,
        out_features=("s1", "s2", "s3"),
    )
    x = jnp.asarray(g["image"][None])
    variables = bb.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    ckpt = DetectionCheckpointer(variables)
    ckpt.load(str(pkl_path))
    variables = ckpt.params
    assert "Unused checkpoint keys" not in ckpt.last_report, ckpt.last_report
    assert "Randomly initialized" not in ckpt.last_report, ckpt.last_report

    feats = bb.apply(variables, x, train=False)
    for name in ("s1", "s2", "s3"):
        ours = np.asarray(feats[name])
        ref = g[f"feat_{name}"].transpose(0, 2, 3, 1)
        assert ours.shape == ref.shape, (name, ours.shape, ref.shape)
        err = np.abs(ours - ref).max()
        assert err < 2e-3, (name, err)
