"""Keypoints structure + heatmap encode/decode.

Parity with reference detectron2/structures/keypoints.py. Encode
(``to_heatmap``) matches the reference bin math exactly. Decode
(``heatmaps_to_keypoints``) is re-formulated for fixed shapes: the reference
bilinearly resizes each K x S x S heatmap to the *per-roi* pixel size before
the argmax (keypoints.py:165-222) which is a dynamic shape per box; here each
heatmap is upsampled by a fixed factor (default 4) and the argmax is mapped
back through the roi transform — sub-bin behaviour matches to within the
upsample quantum.
"""

from typing import Any, List, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["Keypoints", "heatmaps_to_keypoints"]


@jax.tree_util.register_pytree_node_class
class Keypoints:
    """Stores keypoint annotation data: (N, K, 3) array of N instances, K
    keypoints, and (x, y, visibility) per keypoint (reference keypoints.py:8)."""

    def __init__(self, keypoints: Union[np.ndarray, jnp.ndarray]):
        keypoints = jnp.asarray(keypoints, dtype=jnp.float32) if not isinstance(
            keypoints, (np.ndarray, jnp.ndarray)
        ) else keypoints
        assert keypoints.ndim == 3 and keypoints.shape[2] == 3, keypoints.shape
        self.tensor = keypoints

    def tree_flatten(self):
        return (self.tensor,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.tensor = children[0]
        return obj

    def __len__(self) -> int:
        return self.tensor.shape[0]

    def to(self, *args: Any, **kwargs: Any) -> "Keypoints":
        return self

    @property
    def device(self):
        return getattr(self.tensor, "devices", lambda: None)()

    def to_heatmap(self, boxes, heatmap_size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Convert keypoint annotations to a flattened one-hot heatmap index
        per (instance, keypoint), for the keypoint softmax-CE loss.

        Returns:
            heatmaps: (N, K) int32 flattened spatial index into S*S
            valid: (N, K) bool — keypoint is labeled and inside the box
        """
        from detectron2_tpu.structures.boxes import Boxes

        rois = boxes.tensor if isinstance(boxes, Boxes) else boxes
        return _keypoints_to_heatmap(self.tensor, rois, heatmap_size)

    def __getitem__(self, item) -> "Keypoints":
        if isinstance(item, int):
            return Keypoints(self.tensor[item][None])
        return Keypoints(self.tensor[item])

    def __repr__(self) -> str:
        return f"{self.__class__.__name__}(num_instances={self.tensor.shape[0]})"

    @staticmethod
    def cat(keypoints_list: List["Keypoints"]) -> "Keypoints":
        assert isinstance(keypoints_list, (list, tuple))
        assert len(keypoints_list) > 0
        assert all(isinstance(k, Keypoints) for k in keypoints_list)
        return Keypoints(jnp.concatenate([jnp.asarray(k.tensor) for k in keypoints_list], axis=0))


def _keypoints_to_heatmap(
    keypoints: jnp.ndarray, rois: jnp.ndarray, heatmap_size: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Encode keypoint locations into heatmap bin indices (exact port of the
    bin arithmetic in reference keypoints.py:105-162).

    Args:
        keypoints: (N, K, 3) — x, y, visibility
        rois: (N, 4)
    Returns:
        heatmaps: (N, K) int32 index in [0, heatmap_size**2)
        valid: (N, K) bool
    """
    keypoints = jnp.asarray(keypoints, jnp.float32)
    rois = jnp.asarray(rois, jnp.float32)

    offset_x = rois[:, 0][:, None]  # [N,1]
    offset_y = rois[:, 1][:, None]
    scale_x = heatmap_size / jnp.maximum(rois[:, 2] - rois[:, 0], 1e-6)[:, None]
    scale_y = heatmap_size / jnp.maximum(rois[:, 3] - rois[:, 1], 1e-6)[:, None]

    x = keypoints[..., 0]
    y = keypoints[..., 1]

    x_boundary_inds = x == rois[:, 2][:, None]
    y_boundary_inds = y == rois[:, 3][:, None]

    x = (x - offset_x) * scale_x
    x = jnp.floor(x)
    y = (y - offset_y) * scale_y
    y = jnp.floor(y)

    x = jnp.where(x_boundary_inds, heatmap_size - 1, x)
    y = jnp.where(y_boundary_inds, heatmap_size - 1, y)

    valid_loc = (x >= 0) & (y >= 0) & (x < heatmap_size) & (y < heatmap_size)
    vis = keypoints[..., 2] > 0
    valid = valid_loc & vis

    lin_ind = y.astype(jnp.int32) * heatmap_size + x.astype(jnp.int32)
    heatmaps = jnp.where(valid, lin_ind, 0)

    return heatmaps, valid


def heatmaps_to_keypoints(maps: jnp.ndarray, rois: jnp.ndarray, upsample: int = 4) -> jnp.ndarray:
    """Extract predicted keypoint locations from heatmaps.

    Args:
        maps: (N, K, S, S) keypoint logit heatmaps
        rois: (N, 4)

    Returns:
        (N, K, 4) array with the last dim (x, y, logit, score). Coordinates are
        in the image frame, at the +0.5 pixel-center convention of the
        reference (keypoints.py:165-222).

    Fixed-shape design: each S x S map is bilinearly upsampled by a static
    factor instead of to the per-roi pixel size, then argmax'ed.
    """
    maps = jnp.asarray(maps, jnp.float32)
    rois = jnp.asarray(rois, jnp.float32)
    N, K, S, _ = maps.shape
    U = S * upsample

    widths = jnp.clip(rois[:, 2] - rois[:, 0], 1.0, None)
    heights = jnp.clip(rois[:, 3] - rois[:, 1], 1.0, None)

    up = jax.image.resize(maps, (N, K, U, U), method="bilinear")  # [N,K,U,U]
    flat = up.reshape(N, K, U * U)
    pos = jnp.argmax(flat, axis=-1)  # [N,K]
    max_logit = jnp.max(flat, axis=-1)

    # softmax probability of the argmax bin over the upsampled map
    probs = jax.nn.softmax(flat, axis=-1)
    max_prob = jnp.take_along_axis(probs, pos[..., None], axis=-1)[..., 0]

    x_int = (pos % U).astype(jnp.float32)
    y_int = (pos // U).astype(jnp.float32)

    x = (x_int + 0.5) / U * widths[:, None] + rois[:, 0][:, None]
    y = (y_int + 0.5) / U * heights[:, None] + rois[:, 1][:, None]

    return jnp.stack([x, y, max_logit, max_prob], axis=-1)
