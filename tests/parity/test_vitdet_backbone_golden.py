"""ViTDet backbone (ViT + SimpleFeaturePyramid) parity against the reference:
pins windowed + global attention with decomposed rel-pos, patch embed,
pre-norm blocks, and the SFP deconv/LN/lateral towers — plus the converter's
ViT/SFP name + layout mapping (reference modeling/backbone/vit.py)."""

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

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "goldens", "vitdet_backbone.npz")


def test_vitdet_backbone_reference_weights(tmp_path):
    if not os.path.exists(GOLDEN):
        pytest.skip("vitdet backbone golden not generated")
    g = np.load(GOLDEN)

    sd = {}
    for name, shape_s in zip(g["weight_names"], g["weight_shapes"]):
        shape = tuple(int(x) for x in str(shape_s).split(",") if x)
        sd[str(name)] = synth_weight_value(str(name), shape)
    pkl_path = tmp_path / "synthetic_vitdet.pkl"
    with open(pkl_path, "wb") as f:
        pickle.dump({"model": sd, "__author__": "reference-oracle"}, f)

    from detectron2_tpu.checkpoint import DetectionCheckpointer
    from detectron2_tpu.modeling.backbone.vit import ViT, SimpleFeaturePyramid

    net = ViT(
        img_size=256,
        patch_size=16,
        embed_dim=64,
        depth=4,
        num_heads=2,
        window_size=8,
        mlp_ratio=4,
        qkv_bias=True,
        window_block_indexes=(0, 2),
        use_rel_pos=True,
        pretrain_img_size=256,
        out_feature="last_feat",
        name="net",
    )
    bb = SimpleFeaturePyramid(
        net=net,
        in_feature="last_feat",
        out_channels=48,
        scale_factors=(4.0, 2.0, 1.0, 0.5),
        top_block_levels=1,
        norm="LN",
    )
    x = jnp.asarray(g["image"][None])  # [1, 256, 256, 3], already normalized
    variables = bb.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    ckpt = DetectionCheckpointer(variables)
    ckpt.load(str(pkl_path))
    variables = ckpt.params
    assert "Unused checkpoint keys" not in ckpt.last_report, ckpt.last_report
    assert "Randomly initialized" not in ckpt.last_report, ckpt.last_report

    feats = bb.apply(variables, x, train=False)
    for name in ("p2", "p3", "p4", "p5", "p6"):
        ours = np.asarray(feats[name])  # [1, H, W, 48]
        ref = g[f"feat_{name}"].transpose(0, 2, 3, 1)  # NCHW -> NHWC
        assert ours.shape == ref.shape, (name, ours.shape, ref.shape)
        err = np.abs(ours - ref).max()
        assert err < 2e-3, (name, err)
