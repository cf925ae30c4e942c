"""DensePose chart head
(reference projects/DensePose/densepose/modeling/predictors/chart.py +
v1convx head).

8 stacked 3x3 convs on pooled person features, then four 1x1 predictors on a
2x-deconvolved map: coarse segmentation (fg/bg), part index I (25 = 24 parts +
bg), and per-part U, V chart coordinates.
"""

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from detectron2_tpu.layers.wrappers import Conv2d, ConvTranspose2d
from detectron2_tpu.utils.registry import Registry

ROI_DENSEPOSE_HEAD_REGISTRY = Registry("ROI_DENSEPOSE_HEAD")

__all__ = [
    "ROI_DENSEPOSE_HEAD_REGISTRY",
    "DensePoseChartHead",
    "DensePoseCSEHead",
    "build_densepose_head",
]


@ROI_DENSEPOSE_HEAD_REGISTRY.register()
class DensePoseChartHead(nn.Module):
    """The V1ConvX tower + chart (IUV) predictors; with ``uv_confidence`` set
    it also emits per-pixel sigma (and kappa for the anisotropic model)
    channels (reference densepose_head.py DensePoseV1ConvXHead +
    DensePoseChartConfidencePredictorMixin)."""

    num_patches: int = 24
    num_coarse_segm_channels: int = 2
    conv_dims: int = 512
    num_convs: int = 8
    kernel: int = 3
    uv_confidence: str = "none"  # none | iid_iso | indep_aniso

    @classmethod
    def from_config(cls, cfg, input_shape=None):
        h = cfg.MODEL.ROI_DENSEPOSE_HEAD
        conf = h.UV_CONFIDENCE
        return cls(
            num_patches=h.NUM_PATCHES,
            num_coarse_segm_channels=h.NUM_COARSE_SEGM_CHANNELS,
            conv_dims=h.CONV_HEAD_DIM,
            num_convs=h.NUM_STACKED_CONVS,
            kernel=h.CONV_HEAD_KERNEL,
            uv_confidence=conf.TYPE if conf.ENABLED else "none",
        )

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [R, h, w, C] -> dict of [R, 2h, 2w, *] IUV maps."""
        for i in range(self.num_convs):
            x = Conv2d(
                features=self.conv_dims,
                kernel_size=self.kernel,
                padding=self.kernel // 2,
                activation=nn.relu,
                name=f"body_conv_fcn{i + 1}",
            )(x, train=train)
        x = ConvTranspose2d(
            features=self.conv_dims, kernel_size=2, strides=2,
            activation=nn.relu, name="deconv",
        )(x, train=train)
        K = self.num_patches + 1
        out = {
            "coarse_segm": Conv2d(
                features=self.num_coarse_segm_channels, kernel_size=1, name="ann_index_lowres"
            )(x, train=train),
            "fine_segm": Conv2d(features=K, kernel_size=1, name="index_uv_lowres")(x, train=train),
            "u": Conv2d(features=K, kernel_size=1, name="u_lowres")(x, train=train),
            "v": Conv2d(features=K, kernel_size=1, name="v_lowres")(x, train=train),
        }
        if self.uv_confidence != "none":
            out["sigma_2"] = Conv2d(features=K, kernel_size=1, name="sigma_2_lowres")(
                x, train=train
            )
            if self.uv_confidence == "indep_aniso":
                out["kappa_u"] = Conv2d(features=K, kernel_size=1, name="kappa_u_lowres")(
                    x, train=train
                )
                out["kappa_v"] = Conv2d(features=K, kernel_size=1, name="kappa_v_lowres")(
                    x, train=train
                )
        return {k: v.astype(jnp.float32) for k, v in out.items()}


@ROI_DENSEPOSE_HEAD_REGISTRY.register()
class DensePoseCSEHead(nn.Module):
    """The V1ConvX tower + CSE predictors: a D-dim embedding per pixel and a
    2-channel coarse segmentation (reference modeling/predictors/cse.py
    DensePoseEmbeddingPredictor)."""

    embed_dim: int = 16
    num_coarse_segm_channels: int = 2
    conv_dims: int = 512
    num_convs: int = 8
    kernel: int = 3

    @classmethod
    def from_config(cls, cfg, input_shape=None):
        h = cfg.MODEL.ROI_DENSEPOSE_HEAD
        return cls(
            embed_dim=h.CSE.EMBED_SIZE,
            num_coarse_segm_channels=h.NUM_COARSE_SEGM_CHANNELS,
            conv_dims=h.CONV_HEAD_DIM,
            num_convs=h.NUM_STACKED_CONVS,
            kernel=h.CONV_HEAD_KERNEL,
        )

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [R, h, w, C] -> {"coarse_segm": [R, 2h, 2w, 2],
        "embedding": [R, 2h, 2w, D]}."""
        for i in range(self.num_convs):
            x = Conv2d(
                features=self.conv_dims,
                kernel_size=self.kernel,
                padding=self.kernel // 2,
                activation=nn.relu,
                name=f"body_conv_fcn{i + 1}",
            )(x, train=train)
        x = ConvTranspose2d(
            features=self.conv_dims, kernel_size=2, strides=2,
            activation=nn.relu, name="deconv",
        )(x, train=train)
        out = {
            "coarse_segm": Conv2d(
                features=self.num_coarse_segm_channels, kernel_size=1, name="coarse_segm_lowres"
            )(x, train=train),
            "embedding": Conv2d(features=self.embed_dim, kernel_size=1, name="embed_lowres")(
                x, train=train
            ),
        }
        return {k: v.astype(jnp.float32) for k, v in out.items()}


def build_densepose_head(cfg, input_shape=None):
    name = cfg.MODEL.ROI_DENSEPOSE_HEAD.NAME
    return ROI_DENSEPOSE_HEAD_REGISTRY.get(name).from_config(cfg, input_shape)
