"""MViTv2 backbone parity against the reference: pins pooled multiscale
attention (shared per-head depthwise pool convs + post-pool LN), the hybrid
window/global schedule, adaptive kv strides, runtime-interpolated rel-pos,
residual pooling, and the MViT converter name mapping
(reference modeling/backbone/mvit.py)."""

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

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "goldens", "mvit_backbone.npz")


def test_mvit_backbone_reference_weights(tmp_path):
    if not os.path.exists(GOLDEN):
        pytest.skip("mvit backbone golden not generated")
    g = np.load(GOLDEN)

    sd = {}
    for name, shape_s in zip(g["weight_names"], g["weight_shapes"]):
        shape = tuple(int(x) for x in str(shape_s).split(",") if x)
        sd[str(name)] = synth_weight_value(str(name), shape)
    pkl_path = tmp_path / "synthetic_mvit.pkl"
    with open(pkl_path, "wb") as f:
        pickle.dump({"model": sd, "__author__": "reference-oracle"}, f)

    from detectron2_tpu.checkpoint import DetectionCheckpointer
    from detectron2_tpu.modeling.backbone.mvit import MViT

    bb = MViT(
        img_size=224,
        embed_dim=32,
        depths=(1, 2, 2, 1),  # last_block_indexes (0, 2, 4, 5)
        num_heads=(1, 2, 4, 8),
        use_rel_pos=True,
        out_features=("scale2", "scale3", "scale4", "scale5"),
    )
    x = jnp.asarray(g["image"][None])
    variables = bb.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    ckpt = DetectionCheckpointer(variables)
    ckpt.load(str(pkl_path))
    variables = ckpt.params
    assert "Unused checkpoint keys" not in ckpt.last_report, ckpt.last_report
    assert "Randomly initialized" not in ckpt.last_report, ckpt.last_report

    feats = bb.apply(variables, x, train=False)
    for name in ("scale2", "scale3", "scale4", "scale5"):
        ours = np.asarray(feats[name])
        ref = g[f"feat_{name}"].transpose(0, 2, 3, 1)
        assert ours.shape == ref.shape, (name, ours.shape, ref.shape)
        err = np.abs(ours - ref).max()
        assert err < 3e-3, (name, err)
