"""Point head (reference projects/PointRend/point_rend/point_head.py):
a per-point MLP over fine-grained + coarse features, and the Implicit
PointRend variant whose MLP weights are predicted per instance."""

import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from detectron2_tpu.utils.registry import Registry

POINT_HEAD_REGISTRY = Registry("POINT_HEAD")

__all__ = [
    "POINT_HEAD_REGISTRY",
    "StandardPointHead",
    "ImplicitPointHead",
    "build_point_head",
    "roi_mask_point_loss",
]


@POINT_HEAD_REGISTRY.register()
class StandardPointHead(nn.Module):
    """FC layers applied pointwise; the coarse prediction is re-concatenated
    to every layer's input when coarse_pred_each_layer is set."""

    num_classes: int
    fc_dims: Tuple[int, ...] = (256, 256, 256)
    coarse_pred_each_layer: bool = True
    cls_agnostic: bool = False

    @classmethod
    def from_config(cls, cfg, input_shape=None):
        return cls(
            num_classes=cfg.MODEL.POINT_HEAD.NUM_CLASSES,
            fc_dims=tuple([cfg.MODEL.POINT_HEAD.FC_DIM] * cfg.MODEL.POINT_HEAD.NUM_FC),
            coarse_pred_each_layer=cfg.MODEL.POINT_HEAD.COARSE_PRED_EACH_LAYER,
            cls_agnostic=cfg.MODEL.POINT_HEAD.CLS_AGNOSTIC_MASK,
        )

    @nn.compact
    def __call__(self, fine: jnp.ndarray, coarse: jnp.ndarray, train: bool = False):
        """fine: [R, P, Cf]; coarse: [R, P, Cc] -> point logits [R, P, C]."""
        x = jnp.concatenate([fine, coarse], axis=-1)
        for i, dim in enumerate(self.fc_dims):
            x = nn.relu(nn.Dense(dim, name=f"fc{i + 1}")(x))
            if self.coarse_pred_each_layer:
                x = jnp.concatenate([x, coarse], axis=-1)
        num_out = 1 if self.cls_agnostic else self.num_classes
        return nn.Dense(num_out, name="predictor")(x).astype(jnp.float32)


@POINT_HEAD_REGISTRY.register()
class ImplicitPointHead(nn.Module):
    """A per-point MLP whose weights/biases come from a per-INSTANCE parameter
    vector (reference point_head.py:133-274, Implicit PointRend): each layer
    is one batched einsum over the instance dim — the dynamic MLP is exactly
    the fixed-shape batched-matmul formulation the MXU wants.

    Point coordinates are (optionally) Fourier-encoded with a fixed random
    Gaussian matrix and concatenated to the (optional) image features.
    """

    num_classes: int
    num_fc: int = 3
    channels: int = 256
    image_feature_channels: int = 256
    image_feature_enabled: bool = True
    positional_encoding_enabled: bool = True
    cls_agnostic: bool = False

    @classmethod
    def from_config(cls, cfg, input_shape=None):
        imp = cfg.MODEL.IMPLICIT_POINTREND
        # point features come from the FPN levels in POINT_HEAD.IN_FEATURES
        # (channel count 256 for every FPN config; pass an int to override)
        in_ch = input_shape if isinstance(input_shape, int) else 256
        return cls(
            num_classes=cfg.MODEL.POINT_HEAD.NUM_CLASSES,
            num_fc=cfg.MODEL.POINT_HEAD.NUM_FC,
            channels=cfg.MODEL.POINT_HEAD.FC_DIM,
            image_feature_channels=in_ch,
            image_feature_enabled=imp.IMAGE_FEATURE_ENABLED,
            positional_encoding_enabled=imp.POS_ENC_ENABLED,
            cls_agnostic=cfg.MODEL.POINT_HEAD.CLS_AGNOSTIC_MASK,
        )

    @property
    def num_outputs(self) -> int:
        return 1 if self.cls_agnostic else self.num_classes

    @property
    def in_channels(self) -> int:
        c = self.image_feature_channels if self.image_feature_enabled else 0
        if self.positional_encoding_enabled:
            c += 256
        assert c > 0
        return c

    def _layer_sizes(self) -> Tuple[List[int], List[int]]:
        """Per-layer weight/bias parameter counts (reference :169-185)."""
        n_layers = self.num_fc + 1
        assert n_layers >= 2
        w, b = [], []
        for l in range(n_layers):
            cin = self.in_channels if l == 0 else self.channels
            cout = self.num_outputs if l == n_layers - 1 else self.channels
            w.append(cin * cout)
            b.append(cout)
        return w, b

    @property
    def num_params(self) -> int:
        w, b = self._layer_sizes()
        return sum(w) + sum(b)

    @nn.compact
    def __call__(
        self,
        fine: jnp.ndarray,  # [R, P, Cf] point-sampled image features
        point_coords: jnp.ndarray,  # [R, P, 2] box-relative in [0, 1]
        parameters: jnp.ndarray,  # [R, num_params] per-instance MLP params
        train: bool = False,
    ) -> jnp.ndarray:
        R, P = point_coords.shape[:2]
        feats = []
        if self.positional_encoding_enabled:
            # fixed random Fourier features (a non-trainable buffer, like the
            # reference's registered positional_encoding_gaussian_matrix)
            gauss = self.variable(
                "buffers",
                "positional_encoding_gaussian_matrix",
                lambda: jax.random.normal(self.make_rng("params"), (2, 128), jnp.float32),
            ).value
            loc = (2.0 * point_coords.reshape(-1, 2) - 1.0) @ gauss
            loc = 2.0 * math.pi * loc
            feats.append(
                jnp.concatenate([jnp.sin(loc), jnp.cos(loc)], axis=-1).reshape(R, P, 256)
            )
        if self.image_feature_enabled:
            feats.append(fine)
        x = jnp.concatenate(feats, axis=-1)  # [R, P, Cin]
        assert x.shape[-1] == self.in_channels, (x.shape, self.in_channels)

        # split the flat parameter vector: all weights first, then all biases
        # (reference _parse_params: torch.split over w_sizes + b_sizes)
        w_sizes, b_sizes = self._layer_sizes()
        n_layers = len(w_sizes)
        offsets = [0]
        for s in w_sizes + b_sizes:
            offsets.append(offsets[-1] + s)
        for l in range(n_layers):
            cin = self.in_channels if l == 0 else self.channels
            cout = self.num_outputs if l == n_layers - 1 else self.channels
            w = parameters[:, offsets[l] : offsets[l + 1]].reshape(R, cout, cin)
            b = parameters[:, offsets[n_layers + l] : offsets[n_layers + l + 1]].reshape(
                R, 1, cout
            )
            # torch: einsum("nck,ndc->ndk", x[R,C,K], w[R,D,C]); ours is point-major
            x = jnp.einsum("rpc,rdc->rpd", x, w) + b
            if l < n_layers - 1:
                x = nn.relu(x)
        return x.astype(jnp.float32)  # [R, P, num_outputs]


def roi_mask_point_loss(
    point_logits: jnp.ndarray,  # [R, P, C or 1]
    gt_classes: jnp.ndarray,  # [R]
    gt_point_labels: jnp.ndarray,  # [R, P] in {0, 1}
    valid: jnp.ndarray,  # [R] bool
) -> jnp.ndarray:
    """BCE at sampled points, averaged over valid rois' points
    (reference point_head.py roi_mask_point_loss)."""
    from detectron2_tpu.layers.losses import binary_cross_entropy_with_logits

    C = point_logits.shape[-1]
    if C == 1:
        sel = point_logits[..., 0]
    else:
        cls = jnp.clip(gt_classes, 0, C - 1).astype(jnp.int32)
        sel = jnp.take_along_axis(point_logits, cls[:, None, None], axis=-1)[..., 0]
    bce = binary_cross_entropy_with_logits(sel, gt_point_labels.astype(jnp.float32))
    w = valid.astype(jnp.float32)[:, None]
    P = point_logits.shape[1]
    return (bce * w).sum() / jnp.maximum(w.sum() * P, 1.0)


def build_point_head(cfg, input_shape=None):
    return POINT_HEAD_REGISTRY.get(cfg.MODEL.POINT_HEAD.NAME).from_config(cfg, input_shape)
