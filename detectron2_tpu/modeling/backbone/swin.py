"""Swin Transformer backbone (reference detectron2/modeling/backbone/swin.py:510-695;
shifted-window attention :79-307, PatchMerging :309).

NHWC flax: window partition/shift are reshapes/rolls (free under XLA);
attention is einsum on the MXU. Relative position bias uses the standard
(2w-1)^2 table.
"""

import math
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from detectron2_tpu.layers.batch_norm import LayerNorm
from detectron2_tpu.layers.blocks import DropPath
from detectron2_tpu.layers.shape_spec import ShapeSpec
from detectron2_tpu.modeling.backbone.backbone import Backbone
from detectron2_tpu.modeling.backbone.vit import window_partition, window_unpartition

__all__ = ["SwinTransformer"]


def _rel_pos_index(window_size: int) -> np.ndarray:
    """Pairwise relative position index inside a window: [ws^2, ws^2]."""
    coords = np.stack(np.meshgrid(np.arange(window_size), np.arange(window_size), indexing="ij"))
    coords_flat = coords.reshape(2, -1)
    rel = coords_flat[:, :, None] - coords_flat[:, None, :]  # [2, N, N]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window_size - 1
    rel[:, :, 1] += window_size - 1
    rel[:, :, 0] *= 2 * window_size - 1
    return rel.sum(-1)


class WindowAttention(nn.Module):
    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        """x: [B*nW, N, C]; mask: [nW, N, N] additive attention mask or None."""
        Bn, N, C = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim**-0.5

        rel_bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(0.02),
            ((2 * self.window_size - 1) ** 2, self.num_heads),
        )
        rel_index = jnp.asarray(_rel_pos_index(self.window_size))  # [N, N]

        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, name="qkv", dtype=x.dtype)(x)
        qkv = qkv.reshape(Bn, N, 3, self.num_heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # [Bn, nH, N, hd]

        attn = jnp.einsum("bhqc,bhkc->bhqk", q * scale, k, preferred_element_type=jnp.float32)
        bias = rel_bias_table[rel_index.reshape(-1)].reshape(N, N, self.num_heads)
        attn = attn + bias.transpose(2, 0, 1)[None].astype(attn.dtype)

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(Bn // nW, nW, self.num_heads, N, N) + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(Bn, self.num_heads, N, N)

        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkc->bhqc", attn, v, preferred_element_type=jnp.float32).astype(v.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(Bn, N, self.dim)
        return nn.Dense(self.dim, name="proj", dtype=x.dtype)(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [B, H, W, C]"""
        drop_path = DropPath(self.drop_path, name="drop_path")
        B, H, W, C = x.shape
        # the reference never shrinks the window for small inputs — feature
        # maps are padded up to window multiples (swin.py:261-266), which
        # also keeps the bias-table parameter shape independent of the
        # runtime grid ((2*ws-1)^2 rows in every checkpoint)
        ws = self.window_size
        shift = self.shift_size

        shortcut = x
        x = LayerNorm(self.dim, eps=1e-5, name="norm1")(x)

        if shift > 0:
            x = jnp.roll(x, shift=(-shift, -shift), axis=(1, 2))

        windows, pad_hw = window_partition(x, ws)  # [B*nW, ws, ws, C]
        Hp, Wp = pad_hw
        windows = windows.reshape(-1, ws * ws, C)

        attn_mask = None
        if shift > 0:
            # mask so attention never crosses the original window boundaries
            img_mask = np.zeros((1, Hp, Wp, 1), np.float32)
            h_slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
            w_slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
            cnt = 0
            for h in h_slices:
                for w in w_slices:
                    img_mask[:, h, w, :] = cnt
                    cnt += 1
            mask_windows, _ = window_partition(jnp.asarray(img_mask), ws)
            mask_windows = mask_windows.reshape(-1, ws * ws)
            attn_mask = jnp.where(
                mask_windows[:, None, :] != mask_windows[:, :, None], -100.0, 0.0
            )

        attn_out = WindowAttention(
            dim=self.dim, window_size=ws, num_heads=self.num_heads, qkv_bias=self.qkv_bias, name="attn"
        )(windows, mask=attn_mask)

        attn_out = attn_out.reshape(-1, ws, ws, C)
        x = window_unpartition(attn_out, ws, pad_hw, (H, W))

        if shift > 0:
            x = jnp.roll(x, shift=(shift, shift), axis=(1, 2))

        x = shortcut + drop_path(x, deterministic=not train)
        y = LayerNorm(self.dim, eps=1e-5, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=x.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="mlp_fc2", dtype=x.dtype)(y)
        return x + drop_path(y, deterministic=not train)


class PatchMerging(nn.Module):
    """2x2 patch concat + linear reduction (reference swin.py:309)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        pad_h = H % 2
        pad_w = W % 2
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            H, W = H + pad_h, W + pad_w
        # quadrant concat order matches the reference (swin.py:322-326:
        # cat([x0(h0,w0), x1(h1,w0), x2(h0,w1), x3(h1,w1)]) — wsub major,
        # hsub minor) so pretrained reduction weights load correctly
        x = x.reshape(B, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 4, 2, 5).reshape(
            B, H // 2, W // 2, 4 * C
        )
        x = LayerNorm(4 * C, eps=1e-5, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, name="reduction", dtype=x.dtype)(x)


class SwinTransformer(Backbone):
    """Hierarchical Swin backbone producing multi-scale features."""

    patch_size: int = 4
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    out_features: Tuple[str, ...] = ("p0", "p1", "p2", "p3")
    drop_path_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        x = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=x.dtype,
            name="patch_embed",
        )(x)
        x = LayerNorm(self.embed_dim, eps=1e-5, name="patch_norm")(x)

        outs = {}
        dim = self.embed_dim
        total = sum(self.depths)
        blk = 0
        for i, depth in enumerate(self.depths):
            for d in range(depth):
                x = SwinBlock(
                    dim=dim,
                    num_heads=self.num_heads[i],
                    window_size=self.window_size,
                    shift_size=0 if d % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio,
                    qkv_bias=self.qkv_bias,
                    drop_path=self.drop_path_rate * blk / max(total - 1, 1),
                    name=f"stage{i}_block{d}",
                )(x, train)
                blk += 1
            name = f"p{i}"
            if name in self.out_features:
                outs[name] = LayerNorm(dim, eps=1e-5, name=f"out_norm{i}")(x)
            if i < len(self.depths) - 1:
                x = PatchMerging(dim=dim, name=f"merge{i}")(x)
                dim *= 2
        return outs

    def output_shape(self) -> Dict[str, ShapeSpec]:
        shapes = {}
        dim = self.embed_dim
        stride = self.patch_size
        for i in range(len(self.depths)):
            name = f"p{i}"
            if name in self.out_features:
                shapes[name] = ShapeSpec(channels=dim, stride=stride)
            dim *= 2
            stride *= 2
        return shapes

    @property
    def size_divisibility(self) -> int:
        return self.patch_size * (2 ** (len(self.depths) - 1))
