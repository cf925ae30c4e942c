"""Swin backbone parity against the reference: pins shifted-window attention
with relative-position bias, the cyclic-shift attention mask, patch merging
(quadrant concat order), output norms, and the Swin converter name mapping
(reference modeling/backbone/swin.py)."""

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

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "goldens", "swin_backbone.npz")


def test_swin_backbone_reference_weights(tmp_path):
    if not os.path.exists(GOLDEN):
        pytest.skip("swin backbone golden not generated")
    g = np.load(GOLDEN)

    sd = {}
    for name, shape_s in zip(g["weight_names"], g["weight_shapes"]):
        shape = tuple(int(x) for x in str(shape_s).split(",") if x)
        sd[str(name)] = synth_weight_value(str(name), shape)
    pkl_path = tmp_path / "synthetic_swin.pkl"
    with open(pkl_path, "wb") as f:
        pickle.dump({"model": sd, "__author__": "reference-oracle"}, f)

    from detectron2_tpu.checkpoint import DetectionCheckpointer
    from detectron2_tpu.modeling.backbone.swin import SwinTransformer

    bb = SwinTransformer(
        patch_size=4,
        embed_dim=32,
        depths=(2, 2),
        num_heads=(2, 4),
        window_size=7,
        out_features=("p0", "p1"),
    )
    x = jnp.asarray(g["image"][None])
    variables = bb.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    ckpt = DetectionCheckpointer(variables)
    ckpt.load(str(pkl_path))
    variables = ckpt.params
    assert "Unused checkpoint keys" not in ckpt.last_report, ckpt.last_report
    assert "Randomly initialized" not in ckpt.last_report, ckpt.last_report

    feats = bb.apply(variables, x, train=False)
    for name in ("p0", "p1"):
        ours = np.asarray(feats[name])
        ref = g[f"feat_{name}"].transpose(0, 2, 3, 1)
        assert ours.shape == ref.shape, (name, ours.shape, ref.shape)
        err = np.abs(ours - ref).max()
        assert err < 2e-3, (name, err)
