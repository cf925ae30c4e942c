"""ViT backbone with windowed attention + SimpleFeaturePyramid (ViTDet).

Parity with reference detectron2/modeling/backbone/vit.py:232-503 and
backbone/utils.py (window partition :16-61, decomposed relative position
:63-127, abs-pos interpolation :128): a plain ViT whose blocks use windowed
attention except a few global blocks; the SimpleFeaturePyramid builds p2..p6
from the single stride-16 map.

TPU notes: window partitioning is pure reshape/transpose (free for XLA);
attention is jnp einsum (MXU) in the compute dtype; square padding makes all
attention shapes static (the backbone declares padding_constraints).
"""

import math
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from detectron2_tpu.layers.batch_norm import LayerNorm, get_norm
from detectron2_tpu.layers.blocks import DropPath
from detectron2_tpu.layers.shape_spec import ShapeSpec
from detectron2_tpu.layers.wrappers import Conv2d, ConvTranspose2d
from detectron2_tpu.modeling.backbone.backbone import Backbone

__all__ = ["ViT", "SimpleFeaturePyramid", "get_vit_lr_decay_rate", "window_partition", "window_unpartition"]


def window_partition(x: jnp.ndarray, window_size: int):
    """[B, H, W, C] -> ([B*nW, ws, ws, C], (Hp, Wp)) with padding."""
    B, H, W, C = x.shape
    pad_h = (window_size - H % window_size) % window_size
    pad_w = (window_size - W % window_size) % window_size
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(B, Hp // window_size, window_size, Wp // window_size, window_size, C)
    windows = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window_size, window_size, C)
    return windows, (Hp, Wp)


def window_unpartition(windows: jnp.ndarray, window_size: int, pad_hw, hw):
    """Inverse of window_partition, removing padding."""
    Hp, Wp = pad_hw
    H, W = hw
    B = windows.shape[0] // (Hp * Wp // window_size // window_size)
    x = windows.reshape(B, Hp // window_size, Wp // window_size, window_size, window_size, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


def get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """Relative positional embeddings per relative distance, interpolated to
    the needed range (reference backbone/utils.py:63-96)."""
    max_rel_dist = int(2 * max(q_size, k_size) - 1)
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(
            rel_pos, (max_rel_dist, rel_pos.shape[1]), method="linear"
        )
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    relative_coords = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[relative_coords.astype(jnp.int32)]


def decomposed_rel_pos_factors(q, rel_pos_h, rel_pos_w, q_size, k_size, transposed=False):
    """The two factors of the decomposed relative-position bias
    (mvitv2-style; reference utils.py:98-127):
    bias[q=(h,w), k=(h2,w2)] = rel_h[q, h2] + rel_w[q, w2].

    Returns rel_h [B, q_h*q_w, k_h] and rel_w [B, q_h*q_w, k_w] — the full
    [S, S] bias is never materialized (the flash kernel rebuilds tiles).

    transposed=True emits the v2 flash kernel's native layout instead:
    rel_h [B, k_h, q_h*q_w] / rel_w [B, k_w, q_h*q_w] — produced directly by
    the einsum (no relayout of the standard-layout output, which at ViT-B
    global scale is a ~100 MB lane-crossing copy per block)."""
    q_h, q_w = q_size
    k_h, k_w = k_size
    Rh = get_rel_pos(q_h, k_h, rel_pos_h)  # [q_h, k_h, dim]
    Rw = get_rel_pos(q_w, k_w, rel_pos_w)

    B, _, dim = q.shape
    r_q = q.reshape(B, q_h, q_w, dim)
    if transposed:
        rel_ht = jnp.einsum("bhwc,hkc->bkhw", r_q, Rh.astype(q.dtype))
        rel_wt = jnp.einsum("bhwc,wkc->bkhw", r_q, Rw.astype(q.dtype))
        return rel_ht.reshape(B, k_h, q_h * q_w), rel_wt.reshape(B, k_w, q_h * q_w)
    rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, Rh.astype(q.dtype))
    rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, Rw.astype(q.dtype))
    return rel_h.reshape(B, q_h * q_w, k_h), rel_w.reshape(B, q_h * q_w, k_w)


def add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w, q_size, k_size):
    """Decomposed relative position added to materialized scores."""
    q_h, q_w = q_size
    k_h, k_w = k_size
    B = q.shape[0]
    rel_h, rel_w = decomposed_rel_pos_factors(q, rel_pos_h, rel_pos_w, q_size, k_size)
    attn = attn.reshape(B, q_h * q_w, k_h, k_w)
    attn = attn + rel_h[:, :, :, None] + rel_w[:, :, None, :]
    return attn.reshape(B, q_h * q_w, k_h * k_w)


class Attention(nn.Module):
    """Multi-head attention with optional decomposed relative position."""

    dim: int
    num_heads: int = 8
    qkv_bias: bool = True
    use_rel_pos: bool = False
    input_size: Optional[Tuple[int, int]] = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim**-0.5

        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, dtype=x.dtype, name="qkv")(
            x.reshape(B, H * W, C)
        )
        qkv = qkv.reshape(B, H * W, 3, self.num_heads, head_dim).transpose(2, 0, 3, 1, 4)
        # [3, B, nHeads, HW, hd] -> merge batch and heads
        q, k, v = (t.reshape(B * self.num_heads, H * W, head_dim) for t in qkv)

        from detectron2_tpu.ops.attention import attention_plan, attention_with_rel_pos

        rel_h = rel_w = None
        # both the global blocks (S = 4096) and the windowed blocks (S = 196)
        # take the Pallas flash path on TPU; elsewhere the XLA einsum runs.
        # The plan is queried up front so the bias factors are produced in the
        # chosen kernel's native layout (v2 wants them transposed).
        plan = attention_plan(H * W, self.use_rel_pos, H, W)
        if self.use_rel_pos:
            rel_pos_h = self.param(
                "rel_pos_h", nn.initializers.zeros, (2 * self.input_size[0] - 1, head_dim)
            )
            rel_pos_w = self.param(
                "rel_pos_w", nn.initializers.zeros, (2 * self.input_size[1] - 1, head_dim)
            )
            rel_h, rel_w = decomposed_rel_pos_factors(
                q, rel_pos_h, rel_pos_w, (H, W), (H, W), transposed=plan == "v2"
            )

        x = attention_with_rel_pos(
            q, k, v, rel_h, rel_w, scale=scale, factors_transposed=plan == "v2"
        )
        x = x.reshape(B, self.num_heads, H * W, head_dim).transpose(0, 2, 1, 3).reshape(B, H, W, self.dim)
        return nn.Dense(self.dim, dtype=x.dtype, name="proj")(x)


class Mlp(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=x.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, dtype=x.dtype, name="fc2")(x)


class Block(nn.Module):
    """Transformer block with optional windowed attention
    (reference vit.py:232-330)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    window_size: int = 0
    use_rel_pos: bool = False
    input_size: Optional[Tuple[int, int]] = None
    use_residual_block: bool = False
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        drop_path = DropPath(self.drop_path, name="drop_path")
        shortcut = x
        x = LayerNorm(self.dim, eps=1e-5, name="norm1")(x)
        if self.window_size > 0:
            H, W = x.shape[1], x.shape[2]
            x, pad_hw = window_partition(x, self.window_size)
            attn_size = (self.window_size, self.window_size)
        else:
            # rel-pos table size is pinned by the CONFIG's input_size (the
            # reference sizes global blocks' tables by img_size//patch_size,
            # vit.py:138-141) so checkpoint shapes don't depend on the init
            # batch; get_rel_pos interpolates when the runtime grid differs
            attn_size = self.input_size or (x.shape[1], x.shape[2])

        x = Attention(
            dim=self.dim,
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            use_rel_pos=self.use_rel_pos,
            input_size=attn_size,
            name="attn",
        )(x)

        if self.window_size > 0:
            x = window_unpartition(x, self.window_size, pad_hw, (H, W))

        x = shortcut + drop_path(x, deterministic=not train)
        x = x + drop_path(
            Mlp(int(self.dim * self.mlp_ratio), self.dim, name="mlp")(
                LayerNorm(self.dim, eps=1e-5, name="norm2")(x)
            ),
            deterministic=not train,
        )

        if self.use_residual_block:
            # ViTDet's optional bottleneck residual after some blocks
            from detectron2_tpu.modeling.backbone.resnet import BottleneckBlock

            x = BottleneckBlock(
                in_channels=self.dim,
                out_channels=self.dim,
                bottleneck_channels=self.dim // 2,
                norm="LN",
                name="residual",
            )(x)
        return x


class ViT(Backbone):
    """Plain ViT detector backbone (reference vit.py:232-360)."""

    img_size: int = 1024
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    use_abs_pos: bool = True
    use_rel_pos: bool = False
    window_size: int = 0
    window_block_indexes: Tuple[int, ...] = ()
    residual_block_indexes: Tuple[int, ...] = ()
    drop_path_rate: float = 0.0
    pretrain_img_size: int = 224
    pretrain_use_cls_token: bool = True
    out_feature: str = "last_feat"
    use_checkpoint: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        # patch embed: conv stride 16
        x = nn.Conv(
            features=self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=x.dtype,
            name="patch_embed",
        )(x)
        B, H, W, C = x.shape

        if self.use_abs_pos:
            num_patches = (self.pretrain_img_size // self.patch_size) ** 2
            num_positions = num_patches + 1 if self.pretrain_use_cls_token else num_patches
            pos_embed = self.param(
                "pos_embed", nn.initializers.normal(0.02), (1, num_positions, self.embed_dim)
            )
            # interpolate the (grid part of the) pretrained table to (H, W)
            grid = pos_embed[:, 1:] if self.pretrain_use_cls_token else pos_embed
            side = int(math.sqrt(grid.shape[1]))
            grid = grid.reshape(1, side, side, self.embed_dim)
            if (side, side) != (H, W):
                grid = jax.image.resize(grid, (1, H, W, self.embed_dim), method="bicubic")
            x = x + grid.astype(x.dtype)

        block_fn = Block
        if self.use_checkpoint:
            # train flag (arg 2, after self) must be static under remat
            block_fn = nn.checkpoint(Block, static_argnums=(2,))

        for i in range(self.depth):
            # linearly increasing stochastic-depth rate (reference vit.py:383)
            dp = self.drop_path_rate * i / max(self.depth - 1, 1)
            x = block_fn(
                dim=self.embed_dim,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                window_size=self.window_size if i in self.window_block_indexes else 0,
                use_rel_pos=self.use_rel_pos,
                input_size=(self.img_size // self.patch_size,) * 2,
                use_residual_block=i in self.residual_block_indexes,
                drop_path=dp,
                name=f"blocks_{i}",
            )(x, train)

        return {self.out_feature: x}

    def output_shape(self) -> Dict[str, ShapeSpec]:
        return {self.out_feature: ShapeSpec(channels=self.embed_dim, stride=self.patch_size)}

    @property
    def size_divisibility(self) -> int:
        return self.patch_size

    @property
    def padding_constraints(self) -> Dict[str, int]:
        # square static shapes keep the global-attention blocks compile-stable
        # (reference vit.py:470-475)
        return {"size_divisibility": self.patch_size, "square_size": self.img_size}


class SimpleFeaturePyramid(Backbone):
    """Build p2..p6 from the single stride-16 ViT map
    (reference vit.py:363-503)."""

    net: Backbone
    in_feature: str = "last_feat"
    out_channels: int = 256
    scale_factors: Tuple[float, ...] = (4.0, 2.0, 1.0, 0.5)
    top_block_levels: int = 1  # p6 via maxpool
    norm: str = "LN"

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        bottom_up_features = self.net(x, train=train)
        features = bottom_up_features[self.in_feature]
        dim = features.shape[-1]
        stride = self.net.output_shape()[self.in_feature].stride

        results = []
        strides = []
        for idx, scale in enumerate(self.scale_factors):
            out_dim = dim
            y = features
            if scale == 4.0:
                y = ConvTranspose2d(features=dim // 2, kernel_size=2, strides=2, name=f"up4_deconv1_{idx}")(y, train=train)
                y = get_norm(self.norm, dim // 2)(name=f"up4_norm_{idx}")(y)
                y = nn.gelu(y, approximate=False)
                y = ConvTranspose2d(features=dim // 4, kernel_size=2, strides=2, name=f"up4_deconv2_{idx}")(y, train=train)
                out_dim = dim // 4
            elif scale == 2.0:
                y = ConvTranspose2d(features=dim // 2, kernel_size=2, strides=2, name=f"up2_deconv_{idx}")(y, train=train)
                out_dim = dim // 2
            elif scale == 1.0:
                pass
            elif scale == 0.5:
                y = nn.max_pool(y, (2, 2), strides=(2, 2))
            else:
                raise NotImplementedError(f"scale_factor={scale} is not supported yet.")

            y = Conv2d(
                features=self.out_channels,
                kernel_size=1,
                use_bias=False,
                norm=get_norm(self.norm, self.out_channels),
                name=f"lateral_{idx}",
            )(y, train=train)
            y = Conv2d(
                features=self.out_channels,
                kernel_size=3,
                padding=1,
                use_bias=False,
                norm=get_norm(self.norm, self.out_channels),
                name=f"output_{idx}",
            )(y, train=train)
            results.append(y)
            strides.append(int(stride / scale))

        names = [f"p{int(math.log2(s))}" for s in strides]
        out = dict(zip(names, results))
        # top block: p6 (or more) via stride-2 maxpool on the coarsest
        last = results[-1]
        last_stride = strides[-1]
        for i in range(self.top_block_levels):
            last = nn.max_pool(last, (1, 1), strides=(2, 2))
            last_stride *= 2
            out[f"p{int(math.log2(last_stride))}"] = last
        return out

    def output_shape(self) -> Dict[str, ShapeSpec]:
        stride = self.net.output_shape()[self.in_feature].stride
        strides = [int(stride / s) for s in self.scale_factors]
        for i in range(self.top_block_levels):
            strides.append(strides[-1] * 2)
        return {
            f"p{int(math.log2(s))}": ShapeSpec(channels=self.out_channels, stride=s)
            for s in strides
        }

    @property
    def size_divisibility(self) -> int:
        return max(
            int(self.net.output_shape()[self.in_feature].stride / min(self.scale_factors)),
            self.net.size_divisibility,
        )

    @property
    def padding_constraints(self) -> Dict[str, int]:
        return self.net.padding_constraints


def get_vit_lr_decay_rate(name: str, lr_decay_rate: float = 1.0, num_layers: int = 12) -> float:
    """Layer-wise lr decay for ViT fine-tuning (reference vit.py:506-530).
    `name` is a flax param path string (e.g. 'backbone/net/blocks_3/...')."""
    layer_id = num_layers + 1
    if "net" in name or "backbone" in name:
        if "pos_embed" in name or "patch_embed" in name:
            layer_id = 0
        elif "blocks_" in name:
            # extract the index after 'blocks_'
            seg = name.split("blocks_")[1]
            layer_id = int(seg.split("/")[0].split(".")[0]) + 1
    return lr_decay_rate ** (num_layers + 1 - layer_id)
