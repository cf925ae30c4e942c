"""PointRend semantic segmentation head
(reference projects/PointRend/point_rend/semantic_seg.py).

A coarse per-pixel head (any SEM_SEG_HEADS_REGISTRY entry exposing
``layers``/``losses``, e.g. SemSegFPNHead) refined by a point head:

- training: the ``TRAIN_NUM_POINTS`` most uncertain (top-2 logit margin)
  points are re-predicted by an MLP over fine-grained + coarse point
  features and supervised with point-sampled CE;
- inference: ``SUBDIVISION_STEPS`` rounds of 2x upsample -> re-predict the
  ``SUBDIVISION_NUM_POINTS`` most uncertain grid cells -> scatter.

TPU design: all point budgets are static, so the whole refinement compiles
to fixed-shape top-k + gather + scatter; the scatter uses one
``.at[].set`` per step on a [B, HW, C] view.
"""

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from detectron2_tpu.layers.losses import cross_entropy
from detectron2_tpu.layers.shape_spec import ShapeSpec
from detectron2_tpu.modeling.meta_arch.semantic_seg import SEM_SEG_HEADS_REGISTRY
from detectron2_tpu.projects.point_rend.point_features import (
    get_uncertain_point_coords_on_grid,
    point_sample,
)
from detectron2_tpu.projects.point_rend.point_head import build_point_head

__all__ = ["PointRendSemSegHead", "calculate_uncertainty_sem_seg"]


def calculate_uncertainty_sem_seg(logits: jnp.ndarray) -> jnp.ndarray:
    """Uncertainty = -(top1 - top2) logit margin, channels-last
    (reference semantic_seg.py calculate_uncertainty)."""
    top2 = jax.lax.top_k(logits, 2)[0]
    return top2[..., 1] - top2[..., 0]  # [..., H, W]


@SEM_SEG_HEADS_REGISTRY.register()
class PointRendSemSegHead(nn.Module):
    """Coarse head + point-rendering refinement."""

    coarse_head: nn.Module
    point_head: nn.Module
    in_features: Tuple[str, ...]
    train_num_points: int = 1024
    oversample_ratio: int = 3
    importance_sample_ratio: float = 0.75
    subdivision_steps: int = 2
    subdivision_num_points: int = 8192
    common_stride: int = 4
    ignore_value: int = 255

    @classmethod
    def from_config(cls, cfg, input_shape: Dict[str, ShapeSpec]):
        assert cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES == cfg.MODEL.POINT_HEAD.NUM_CLASSES
        coarse = SEM_SEG_HEADS_REGISTRY.get(
            cfg.MODEL.POINT_HEAD.COARSE_SEM_SEG_HEAD_NAME
        ).from_config(cfg, input_shape)
        return cls(
            coarse_head=coarse,
            point_head=build_point_head(cfg),
            in_features=tuple(cfg.MODEL.POINT_HEAD.IN_FEATURES),
            train_num_points=cfg.MODEL.POINT_HEAD.TRAIN_NUM_POINTS,
            oversample_ratio=cfg.MODEL.POINT_HEAD.OVERSAMPLE_RATIO,
            importance_sample_ratio=cfg.MODEL.POINT_HEAD.IMPORTANCE_SAMPLE_RATIO,
            subdivision_steps=cfg.MODEL.POINT_HEAD.SUBDIVISION_STEPS,
            subdivision_num_points=cfg.MODEL.POINT_HEAD.SUBDIVISION_NUM_POINTS,
            common_stride=cfg.MODEL.SEM_SEG_HEAD.COMMON_STRIDE,
            ignore_value=cfg.MODEL.SEM_SEG_HEAD.IGNORE_VALUE,
        )

    def _sample_uncertain_with_randomness(self, rng, coarse_logits):
        """Biased point sampling (reference get_uncertain_point_coords_with_
        randomness, with the semseg top-2-margin uncertainty)."""
        B = coarse_logits.shape[0]
        n_sampled = int(self.train_num_points * self.oversample_ratio)
        k1, k2 = jax.random.split(rng)
        cand = jax.random.uniform(k1, (B, n_sampled, 2))
        logits_at = point_sample(coarse_logits, cand)  # [B, n, C]
        unc = calculate_uncertainty_sem_seg(logits_at)  # [B, n]
        n_unc = int(self.importance_sample_ratio * self.train_num_points)
        n_rand = self.train_num_points - n_unc
        _, idx = jax.lax.top_k(unc, n_unc)
        picked = jnp.take_along_axis(cand, idx[..., None], axis=1)
        if n_rand > 0:
            picked = jnp.concatenate([picked, jax.random.uniform(k2, (B, n_rand, 2))], axis=1)
        return picked

    @nn.compact
    def __call__(
        self,
        features: Dict[str, jnp.ndarray],
        targets: Optional[jnp.ndarray] = None,
        train: bool = False,
    ):
        coarse_logits = self.coarse_head.layers(features, train=train)  # [B, h, w, C]

        if train:
            assert targets is not None
            losses = self.coarse_head.losses(coarse_logits, targets)

            rng = self.make_rng("sampling")
            coords = jax.lax.stop_gradient(
                self._sample_uncertain_with_randomness(rng, coarse_logits)
            )  # [B, P, 2]

            coarse_feats = point_sample(coarse_logits, coords)  # [B, P, C]
            fine_feats = jnp.concatenate(
                [point_sample(features[f], coords) for f in self.in_features], axis=-1
            )
            point_logits = self.point_head(fine_feats, coarse_feats, train=train)  # [B, P, C]

            point_targets = point_sample(
                targets[..., None].astype(jnp.float32), coords, mode="nearest"
            )[..., 0].astype(jnp.int32)  # [B, P]
            losses["loss_sem_seg_point"] = cross_entropy(
                point_logits, point_targets, reduction="mean", ignore_index=self.ignore_value
            )
            return None, losses

        # inference: subdivision refinement
        logits = coarse_logits
        for _ in range(self.subdivision_steps):
            B, H, W, C = logits.shape
            logits = jax.image.resize(logits, (B, H * 2, W * 2, C), method="bilinear")
            H, W = H * 2, W * 2
            unc = calculate_uncertainty_sem_seg(logits)  # [B, H, W]
            idx, coords = get_uncertain_point_coords_on_grid(unc, self.subdivision_num_points)
            coarse_feats = point_sample(coarse_logits, coords)
            fine_feats = jnp.concatenate(
                [point_sample(features[f], coords) for f in self.in_features], axis=-1
            )
            point_logits = self.point_head(fine_feats, coarse_feats, train=train)  # [B, N, C]
            flat = logits.reshape(B, H * W, C)
            bidx = jnp.arange(B)[:, None]
            flat = flat.at[bidx, idx].set(point_logits.astype(flat.dtype))
            logits = flat.reshape(B, H, W, C)

        # upsample the rest of the way to input resolution
        B, H, W, C = logits.shape
        remaining = self.common_stride // (2**self.subdivision_steps)
        if remaining > 1:
            logits = jax.image.resize(
                logits, (B, H * remaining, W * remaining, C), method="bilinear"
            )
        return logits, {}
