"""DensePose heads, predictors and the FPN decoder.

Reference structure (projects/DensePose/densepose/modeling/):
- ``DensePoseV1ConvXHead`` (roi_heads/v1convx.py): N stacked 3x3 convs named
  ``body_conv_fcn{i}``; NO upsampling — the head output stays at the pooled
  resolution.
- predictors (predictors/chart.py, chart_confidence.py, cse.py): four
  independent 4x4-stride-2 ``ConvTranspose2d`` layers named ``*_lowres``
  (no activation), each followed by a bilinear x``UP_SCALE`` upscale
  (``interp2d``, align_corners=False). The confidence mixin adds
  ``sigma_2_lowres`` (+ ``kappa_u/v_lowres`` for the anisotropic model).
- ``Decoder`` (roi_heads/roi_head.py:28-89): a SemSegFPNHead-style scale-head
  tower over the FPN levels summed at the common stride, then a 1x1
  predictor producing the 256-channel map the densepose pooler pools from.
"""

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from detectron2_tpu.layers.batch_norm import get_norm
from detectron2_tpu.layers.wrappers import Conv2d, ConvTranspose2d
from detectron2_tpu.utils.registry import Registry

ROI_DENSEPOSE_HEAD_REGISTRY = Registry("ROI_DENSEPOSE_HEAD")
DENSEPOSE_PREDICTOR_REGISTRY = Registry("DENSEPOSE_PREDICTOR")

__all__ = [
    "ROI_DENSEPOSE_HEAD_REGISTRY",
    "DENSEPOSE_PREDICTOR_REGISTRY",
    "DensePoseV1ConvXHead",
    "DensePoseChartPredictor",
    "DensePoseEmbeddingPredictor",
    "DensePoseDecoder",
    "build_densepose_head",
    "build_densepose_predictor",
]


@ROI_DENSEPOSE_HEAD_REGISTRY.register()
class DensePoseV1ConvXHead(nn.Module):
    """The fully-convolutional tower (reference v1convx.py): NUM_STACKED_CONVS
    3x3 convs at CONV_HEAD_DIM channels with relu, torch names
    ``body_conv_fcn{i+1}``."""

    conv_dims: int = 512
    num_convs: int = 8
    kernel: int = 3

    @classmethod
    def from_config(cls, cfg, input_shape=None):
        h = cfg.MODEL.ROI_DENSEPOSE_HEAD
        return cls(
            conv_dims=h.CONV_HEAD_DIM,
            num_convs=h.NUM_STACKED_CONVS,
            kernel=h.CONV_HEAD_KERNEL,
        )

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [R, h, w, C] -> [R, h, w, conv_dims]."""
        for i in range(self.num_convs):
            x = Conv2d(
                features=self.conv_dims,
                kernel_size=self.kernel,
                padding=self.kernel // 2,
                activation=nn.relu,
                name=f"body_conv_fcn{i + 1}",
            )(x, train=train)
        return x


@ROI_DENSEPOSE_HEAD_REGISTRY.register()
class DensePoseDeepLabHead(nn.Module):
    """DeepLabV3-style DensePose head (reference roi_heads/deeplab.py):
    a GN-normalized ASPP (torchvision deeplabv3 layout — 1x1 + three atrous
    3x3 branches at rates (6, 12, 56) + image pooling, 5-way concat projected
    by a bias-free 1x1+relu) followed by the stacked body_conv_fcn tower
    (GN-normalized when DEEPLAB.NORM == "GN"). The optional NONLocalBlock2D
    is unused by every zoo config and not implemented."""

    conv_dims: int = 512
    num_convs: int = 8
    kernel: int = 3
    norm: str = "GN"
    aspp_rates: Tuple[int, int, int] = (6, 12, 56)

    @classmethod
    def from_config(cls, cfg, input_shape=None):
        h = cfg.MODEL.ROI_DENSEPOSE_HEAD
        assert not h.DEEPLAB.NONLOCAL_ON, "NONLocalBlock2D is not implemented (no zoo config uses it)"
        return cls(
            conv_dims=h.CONV_HEAD_DIM,
            num_convs=h.NUM_STACKED_CONVS,
            kernel=h.CONV_HEAD_KERNEL,
            norm=h.DEEPLAB.NORM,
        )

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [R, h, w, C] -> [R, h, w, conv_dims]."""
        C = x.shape[-1]  # reference: ASPP out_channels = input_channels

        def gn(name, y):
            return nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=y.dtype, name=name)(y)

        # branch 0: 1x1 conv + GN + relu (Sequential indices 0, 1)
        branches = []
        y = Conv2d(features=C, kernel_size=1, use_bias=False, name="convs_0_0")(x, train=train)
        branches.append(nn.relu(gn("convs_0_1", y)))
        # branches 1..3: atrous 3x3 + GN + relu
        for i, rate in enumerate(self.aspp_rates, start=1):
            y = Conv2d(
                features=C,
                kernel_size=3,
                padding=rate,
                dilation=rate,
                use_bias=False,
                name=f"convs_{i}_0",
            )(x, train=train)
            branches.append(nn.relu(gn(f"convs_{i}_1", y)))
        # branch 4: image pooling (pool@0, conv@1, GN@2) broadcast back
        pooled = x.mean(axis=(1, 2), keepdims=True)
        y = Conv2d(features=C, kernel_size=1, use_bias=False, name="convs_4_1")(
            pooled, train=train
        )
        y = nn.relu(gn("convs_4_2", y))
        branches.append(jnp.broadcast_to(y, x.shape[:3] + (C,)))

        y = jnp.concatenate(branches, axis=-1)
        y = Conv2d(features=C, kernel_size=1, use_bias=False, name="project_0")(y, train=train)
        x = nn.relu(y)

        for i in range(self.num_convs):
            x = Conv2d(
                features=self.conv_dims,
                kernel_size=self.kernel,
                padding=self.kernel // 2,
                use_bias=not self.norm,
                norm=get_norm(self.norm, self.conv_dims),
                activation=nn.relu,
                name=f"body_conv_fcn{i + 1}",
            )(x, train=train)
        return x


def _interp2d(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Bilinear x``scale`` upsample, torch interpolate(align_corners=False)
    semantics (reference chart.py:68-81 interp2d)."""
    R, H, W, C = x.shape
    return jax.image.resize(x, (R, H * scale, W * scale, C), method="bilinear")


@DENSEPOSE_PREDICTOR_REGISTRY.register()
class DensePoseChartPredictor(nn.Module):
    """Chart (IUV) predictor (reference predictors/chart.py): four independent
    stride-2 deconvs from the head output, each bilinearly upscaled by
    UP_SCALE. With ``uv_confidence`` set, the confidence mixin's extra
    ``sigma_2``(+``kappa_u/v``) deconvs are added
    (reference predictors/chart_confidence.py:49-121)."""

    num_patches: int = 24
    num_coarse_segm_channels: int = 2
    deconv_kernel: int = 4
    up_scale: int = 2
    uv_confidence: str = "none"  # none | iid_iso | indep_aniso
    segm_confidence: bool = False  # the *M variants (chart_confidence.py:82-148)
    segm_confidence_epsilon: float = 0.01

    @classmethod
    def from_config(cls, cfg, input_shape=None):
        h = cfg.MODEL.ROI_DENSEPOSE_HEAD
        conf = h.UV_CONFIDENCE
        sconf = h.SEGM_CONFIDENCE
        return cls(
            num_patches=h.NUM_PATCHES,
            num_coarse_segm_channels=h.NUM_COARSE_SEGM_CHANNELS,
            deconv_kernel=h.DECONV_KERNEL,
            up_scale=h.UP_SCALE,
            uv_confidence=conf.TYPE if conf.ENABLED else "none",
            segm_confidence=sconf.ENABLED,
            segm_confidence_epsilon=sconf.EPSILON,
        )

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        """x: [R, h, w, C] head outputs -> dict of [R, h*2*up, w*2*up, *]."""

        def lowres(name, channels):
            # torch ConvTranspose2d(k, stride=2, padding=k/2-1): our wrapper's
            # "SAME" padding matches (verified bit-exact vs torch for k=4/s=2)
            return ConvTranspose2d(
                features=channels,
                kernel_size=self.deconv_kernel,
                strides=2,
                name=name,
            )(x, train=train)

        K = self.num_patches + 1
        out = {
            "coarse_segm": _interp2d(lowres("ann_index_lowres", self.num_coarse_segm_channels), self.up_scale),
            "fine_segm": _interp2d(lowres("index_uv_lowres", K), self.up_scale),
            "u": _interp2d(lowres("u_lowres", K), self.up_scale),
            "v": _interp2d(lowres("v_lowres", K), self.up_scale),
        }
        if self.uv_confidence != "none":
            out["sigma_2"] = _interp2d(lowres("sigma_2_lowres", K), self.up_scale)
            if self.uv_confidence == "indep_aniso":
                out["kappa_u"] = _interp2d(lowres("kappa_u_lowres", K), self.up_scale)
                out["kappa_v"] = _interp2d(lowres("kappa_v_lowres", K), self.up_scale)
        if self.segm_confidence:
            # per-pixel positive scale on the segmentation logits
            # (reference chart_confidence.py:125-148); 1-channel conf
            # broadcasts over the class dim = torch repeat_interleave
            eps = self.segm_confidence_epsilon
            fconf = jax.nn.softplus(
                _interp2d(lowres("fine_segm_confidence_lowres", 1), self.up_scale)
            ) + eps
            cconf = jax.nn.softplus(
                _interp2d(lowres("coarse_segm_confidence_lowres", 1), self.up_scale)
            ) + eps
            out["fine_segm_confidence"] = fconf
            out["coarse_segm_confidence"] = cconf
            out["fine_segm"] = out["fine_segm"] * fconf
            out["coarse_segm"] = out["coarse_segm"] * cconf
        return {k: v.astype(jnp.float32) for k, v in out.items()}


@DENSEPOSE_PREDICTOR_REGISTRY.register()
class DensePoseEmbeddingPredictor(nn.Module):
    """CSE predictor (reference predictors/cse.py): per-pixel D-dim embedding
    + 2-channel coarse segmentation, same deconv+interp structure."""

    embed_dim: int = 16
    num_coarse_segm_channels: int = 2
    deconv_kernel: int = 4
    up_scale: int = 2

    @classmethod
    def from_config(cls, cfg, input_shape=None):
        h = cfg.MODEL.ROI_DENSEPOSE_HEAD
        return cls(
            embed_dim=h.CSE.EMBED_SIZE,
            num_coarse_segm_channels=h.NUM_COARSE_SEGM_CHANNELS,
            deconv_kernel=h.DECONV_KERNEL,
            up_scale=h.UP_SCALE,
        )

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        def lowres(name, channels):
            return ConvTranspose2d(
                features=channels,
                kernel_size=self.deconv_kernel,
                strides=2,
                name=name,
            )(x, train=train)

        out = {
            "coarse_segm": _interp2d(
                lowres("coarse_segm_lowres", self.num_coarse_segm_channels), self.up_scale
            ),
            "embedding": _interp2d(lowres("embed_lowres", self.embed_dim), self.up_scale),
        }
        return {k: v.astype(jnp.float32) for k, v in out.items()}


# The reference's "WithConfidence" predictors are the base predictors plus the
# confidence mixin, whose extra layers only exist when the confidence cfg is
# enabled (chart_confidence.py:49) — config-driven channels make the classes
# identical here, so the names alias.
DENSEPOSE_PREDICTOR_REGISTRY._do_register(
    "DensePoseChartWithConfidencePredictor", DensePoseChartPredictor
)
DENSEPOSE_PREDICTOR_REGISTRY._do_register(
    "DensePoseEmbeddingWithConfidencePredictor", DensePoseEmbeddingPredictor
)


class DensePoseDecoder(nn.Module):
    """FPN decoder ahead of the densepose pooler (reference
    roi_heads/roi_head.py:28-89 Decoder): per-level scale heads (3x3 conv +
    x2 upsample until the common stride) summed, then a 1x1 predictor.
    Scale-head convs are flax-named ``{f}_conv{k}`` mapping to the d2
    Sequential indices ``decoder.{f}.{2k}``."""

    in_features: Tuple[str, ...] = ("p2", "p3", "p4", "p5")
    feature_strides: Tuple[int, ...] = (4, 8, 16, 32)
    conv_dims: int = 256
    num_classes: int = 256
    common_stride: int = 4
    norm: str = ""

    @classmethod
    def from_config(cls, cfg, input_shape, in_features):
        h = cfg.MODEL.ROI_DENSEPOSE_HEAD
        return cls(
            in_features=tuple(in_features),
            feature_strides=tuple(input_shape[f].stride for f in in_features),
            conv_dims=h.DECODER_CONV_DIMS,
            num_classes=h.DECODER_NUM_CLASSES,
            common_stride=h.DECODER_COMMON_STRIDE,
            norm=h.DECODER_NORM,
        )

    @nn.compact
    def __call__(self, features, train: bool = False) -> jnp.ndarray:
        """features: list of [B, Hi, Wi, Ci] aligned with in_features ->
        [B, H/cs, W/cs, num_classes]."""
        import math

        out = None
        for i, (f, stride) in enumerate(zip(self.in_features, self.feature_strides)):
            x = features[i]
            head_length = max(1, int(math.log2(stride) - math.log2(self.common_stride)))
            for k in range(head_length):
                x = Conv2d(
                    features=self.conv_dims,
                    kernel_size=3,
                    padding=1,
                    use_bias=not self.norm,
                    norm=get_norm(self.norm, self.conv_dims),
                    activation=nn.relu,
                    name=f"{f}_conv{k}",
                )(x, train=train)
                if stride != self.common_stride:
                    B, H, W, C = x.shape
                    x = jax.image.resize(x, (B, H * 2, W * 2, C), method="bilinear")
                    stride //= 2
            out = x if out is None else out + x
        return Conv2d(features=self.num_classes, kernel_size=1, name="predictor")(
            out, train=train
        )


def build_densepose_head(cfg, input_shape=None):
    name = cfg.MODEL.ROI_DENSEPOSE_HEAD.NAME
    return ROI_DENSEPOSE_HEAD_REGISTRY.get(name).from_config(cfg, input_shape)


def build_densepose_predictor(cfg, input_shape=None):
    name = cfg.MODEL.ROI_DENSEPOSE_HEAD.PREDICTOR_NAME
    return DENSEPOSE_PREDICTOR_REGISTRY.get(name).from_config(cfg, input_shape)
