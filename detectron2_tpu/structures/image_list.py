"""ImageList: a batch of variable-size images padded to one fixed-shape array.

Parity with reference detectron2/structures/image_list.py:12-136, with two
TPU-native changes:

- layout is **NHWC** (channels-last maps the channel dim onto TPU lanes and is
  the layout XLA's TPU conv emitters prefer), vs the reference's NCHW.
- padding quantization: besides ``size_divisibility``, the caller can pass a
  ``size_bucket`` so padded H/W snap to multiples of a quantum. Padded shape
  is part of the compiled program signature on XLA, so bucketing bounds the
  number of recompilations (SURVEY.md §7.1 item 1).
"""

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["ImageList"]


@jax.tree_util.register_pytree_node_class
class ImageList:
    """Structure that holds a list of images (of possibly varying sizes) as a
    single tensor, with the original sizes of each image recorded.

    Attributes:
        image_sizes (list[tuple[int, int]]): each tuple is (h, w). During
            tracing it's static python metadata, not a tensor.
    """

    def __init__(self, tensor, image_sizes: Sequence[Tuple[int, int]]):
        """
        Args:
            tensor: of shape (N, H, W, C)  [NHWC — TPU-native layout]
            image_sizes: each tuple is (h, w); can be smaller than (H, W) due
                to padding.
        """
        self.tensor = tensor
        self.image_sizes = [tuple(int(x) for x in s) for s in image_sizes]

    # pytree protocol: tensor is the leaf, sizes are static metadata
    def tree_flatten(self):
        return (self.tensor,), tuple(self.image_sizes)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.tensor = children[0]
        obj.image_sizes = [tuple(s) for s in aux]
        return obj

    def __len__(self) -> int:
        return len(self.image_sizes)

    def __getitem__(self, idx) -> Any:
        """Access the individual image in its original size (no padding)."""
        size = self.image_sizes[idx]
        return self.tensor[idx, : size[0], : size[1], :]

    def to(self, *args, **kwargs) -> "ImageList":
        return self

    @property
    def device(self):
        return getattr(self.tensor, "devices", lambda: None)()

    @staticmethod
    def from_tensors(
        tensors: List[Any],
        size_divisibility: int = 0,
        pad_value: float = 0.0,
        padding_constraints: Optional[Dict[str, int]] = None,
        size_bucket: int = 0,
    ) -> "ImageList":
        """
        Args:
            tensors: a list of (Hi, Wi, C) or (Hi, Wi) arrays (numpy or jax).
                Padded with `pad_value` to the max (H, W) over the batch.
            size_divisibility: pad H, W up to a multiple of this (e.g. the
                stride of the coarsest FPN level; reference image_list.py:71).
            pad_value: value to pad with.
            padding_constraints: optional {"size_divisibility": int,
                "square_size": int}; a positive square_size pads to a fixed
                square (used by ViT backbones for static attention shapes,
                reference image_list.py:92-98).
            size_bucket: additionally round padded H, W up to a multiple of
                this quantum to bound XLA recompilations (TPU-specific).

        Returns:
            an `ImageList`.
        """
        assert len(tensors) > 0
        assert isinstance(tensors, (tuple, list))
        image_sizes = [(int(im.shape[0]), int(im.shape[1])) for im in tensors]

        max_h = max(s[0] for s in image_sizes)
        max_w = max(s[1] for s in image_sizes)

        if padding_constraints is not None:
            square_size = padding_constraints.get("square_size", 0)
            if square_size > 0:
                # pad to square
                max_h = max_w = square_size
            if "size_divisibility" in padding_constraints:
                size_divisibility = padding_constraints["size_divisibility"]

        def _round_up(x: int, m: int) -> int:
            return ((x + m - 1) // m) * m if m > 1 else x

        if size_divisibility > 1:
            max_h = _round_up(max_h, size_divisibility)
            max_w = _round_up(max_w, size_divisibility)
        if size_bucket > 1:
            max_h = _round_up(max_h, size_bucket)
            max_w = _round_up(max_w, size_bucket)

        padded = []
        for im in tensors:
            im = jnp.asarray(im)
            if im.ndim == 2:
                im = im[:, :, None]
            pad_h = max_h - im.shape[0]
            pad_w = max_w - im.shape[1]
            padded.append(
                jnp.pad(
                    im,
                    ((0, pad_h), (0, pad_w), (0, 0)),
                    mode="constant",
                    constant_values=pad_value,
                )
            )
        batched = jnp.stack(padded, axis=0)
        return ImageList(batched, image_sizes)
