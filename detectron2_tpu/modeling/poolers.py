"""ROIPooler: multi-level region feature extraction.

Parity with reference detectron2/modeling/poolers.py:114-263. The FPN-paper
level assignment (eqn. 1, reference poolers.py:23-59) is computed in-graph;
instead of the reference's per-level scatter loop (:245-263, dynamic), all
rois go through ONE fused gather via ops.roi_align.roi_align_multilevel.
"""

import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from detectron2_tpu.ops.roi_align import roi_align, roi_align_multilevel

__all__ = ["ROIPooler", "assign_boxes_to_levels"]


def assign_boxes_to_levels(
    boxes: jnp.ndarray,
    min_level: int,
    max_level: int,
    canonical_box_size: int = 224,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """Map each box to an FPN level: floor(canonical_level + log2(sqrt(area)
    / canonical_box_size)), clamped (reference poolers.py:23-59).

    Args:
        boxes: [..., 4]
    Returns:
        int32 [...] of level offsets in [0, max_level - min_level].
    """
    area = jnp.clip(
        (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1]), 1e-8, None
    )
    box_sizes = jnp.sqrt(area)
    level = jnp.floor(canonical_level + jnp.log2(box_sizes / canonical_box_size + 1e-8))
    level = jnp.clip(level, min_level, max_level)
    return (level - min_level).astype(jnp.int32)


class ROIPooler:
    """Region-of-interest feature map pooler supporting multi-scale features."""

    def __init__(
        self,
        output_size,
        scales: Tuple[float, ...],
        sampling_ratio: int,
        pooler_type: str,
        canonical_box_size: int = 224,
        canonical_level: int = 4,
    ):
        """
        Args:
            output_size: (h, w) of pooled output.
            scales: per-level 1/stride, finest first.
            sampling_ratio: RoIAlign sampling ratio (0 -> static 2, see ops).
            pooler_type: "ROIAlign" (aligned=False) or "ROIAlignV2"
                (aligned=True). ROIPool is intentionally unsupported —
                RoIAlign strictly dominates it on TPU.
        """
        if isinstance(output_size, int):
            output_size = (output_size, output_size)
        self.output_size = output_size
        self.scales = tuple(scales)
        self.sampling_ratio = sampling_ratio
        if pooler_type == "ROIAlignV2":
            self.aligned = True
        elif pooler_type == "ROIAlign":
            self.aligned = False
        else:
            raise ValueError(f"Unsupported pooler type: {pooler_type}")

        self.min_level = -int(math.log2(scales[0]))
        self.max_level = -int(math.log2(scales[-1]))
        assert math.isclose(scales[0], 2**-self.min_level) and math.isclose(
            scales[-1], 2**-self.max_level
        ), "Feature map scales are not log2 contiguous"
        assert self.max_level - self.min_level + 1 == len(scales)
        assert 0 <= self.min_level <= self.max_level
        self.canonical_level = canonical_level
        assert canonical_box_size > 0
        self.canonical_box_size = canonical_box_size

    def __call__(
        self,
        x: List[jnp.ndarray],
        boxes: jnp.ndarray,
        batch_indices: jnp.ndarray,
    ) -> jnp.ndarray:
        """
        Args:
            x: per-level features [B, Hl, Wl, C], finest first (matching scales).
            boxes: [R, 4] boxes in image coords (padding rows may be zeros).
            batch_indices: [R] int image index of each roi.

        Returns:
            [R, out_h, out_w, C]
        """
        assert len(x) == len(self.scales)
        if len(x) == 1:
            # route through the multilevel entry point so the single-level
            # case also hits the pallas kernel on TPU
            return roi_align_multilevel(
                {"0": x[0]},
                boxes,
                batch_indices,
                jnp.zeros((boxes.shape[0],), jnp.int32),
                ("0",),
                (self.scales[0],),
                self.output_size,
                sampling_ratio=self.sampling_ratio,
                aligned=self.aligned,
            )
        levels = assign_boxes_to_levels(
            boxes, self.min_level, self.max_level, self.canonical_box_size, self.canonical_level
        )
        names = tuple(str(i) for i in range(len(x)))
        features = {n: f for n, f in zip(names, x)}
        return roi_align_multilevel(
            features,
            boxes,
            batch_indices,
            levels,
            names,
            self.scales,
            self.output_size,
            sampling_ratio=self.sampling_ratio,
            aligned=self.aligned,
        )
