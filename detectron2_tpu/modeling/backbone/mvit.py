"""MViTv2 backbone (reference detectron2/modeling/backbone/mvit.py).

Multi-scale ViT: attention pools Q (stride 2 at stage transitions) and K/V
(adaptive stride), hybrid window attention (windowed except each stage's last
block from stage 3 on), decomposed relative positions interpolated to the
window extent, and residual pooled-Q connections. NHWC flax; the per-head
depthwise pooling convs are shared across heads exactly like the reference
(pool weights have head_dim channels), so zoo checkpoints load verbatim.
"""

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from detectron2_tpu.layers.batch_norm import LayerNorm
from detectron2_tpu.layers.blocks import DropPath
from detectron2_tpu.layers.shape_spec import ShapeSpec
from detectron2_tpu.modeling.backbone.backbone import Backbone
from detectron2_tpu.modeling.backbone.vit import (
    add_decomposed_rel_pos,
    window_partition,
    window_unpartition,
)

__all__ = ["MViT"]


def _attention_pool(x, stride: int, kernel: int, head_dim: int, name: str):
    """Shared-across-heads depthwise pool conv on [B*nh, H, W, head_dim]
    (reference mvit.py:21-30 attention_pool + the pool_q/k/v convs)."""
    p = kernel // 2
    return nn.Conv(
        head_dim,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(p, p)] * 2,
        feature_group_count=head_dim,
        use_bias=False,
        dtype=x.dtype,
        name=name,
    )(x)


class MultiScaleAttention(nn.Module):
    """Pooled multiscale attention (reference mvit.py:33-176)."""

    dim: int
    dim_out: int
    num_heads: int
    qkv_bias: bool = True
    pool_kernel: int = 3
    stride_q: int = 1
    stride_kv: int = 1
    residual_pooling: bool = True
    window_size: int = 0
    use_rel_pos: bool = False
    input_size: Tuple[int, int] = (56, 56)

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, dim] -> [B, H/stride_q, W/stride_q, dim_out]"""
        B, H, W, _ = x.shape
        head_dim = self.dim_out // self.num_heads
        scale = head_dim**-0.5

        qkv = nn.Dense(3 * self.dim_out, use_bias=self.qkv_bias, name="qkv", dtype=x.dtype)(x)
        qkv = qkv.reshape(B, H, W, 3, self.num_heads, head_dim).transpose(3, 0, 4, 1, 2, 5)
        q, k, v = (t.reshape(B * self.num_heads, H, W, head_dim) for t in qkv)

        q = _attention_pool(q, self.stride_q, self.pool_kernel, head_dim, "pool_q")
        q = LayerNorm(head_dim, eps=1e-5, name="norm_q")(q)
        k = _attention_pool(k, self.stride_kv, self.pool_kernel, head_dim, "pool_k")
        k = LayerNorm(head_dim, eps=1e-5, name="norm_k")(k)
        v = _attention_pool(v, self.stride_kv, self.pool_kernel, head_dim, "pool_v")
        v = LayerNorm(head_dim, eps=1e-5, name="norm_v")(v)

        ori_q = q
        if self.window_size:
            q_win = self.window_size // self.stride_q
            kv_win = self.window_size // self.stride_kv
            q, q_hw_pad = window_partition(q, q_win)
            k, _ = window_partition(k, kv_win)
            v, _ = window_partition(v, kv_win)
            q_hw = (q_win, q_win)
            kv_hw = (kv_win, kv_win)
        else:
            q_hw = q.shape[1:3]
            kv_hw = k.shape[1:3]

        qf = q.reshape(q.shape[0], q_hw[0] * q_hw[1], head_dim)
        kf = k.reshape(k.shape[0], kv_hw[0] * kv_hw[1], head_dim)
        vf = v.reshape(v.shape[0], kv_hw[0] * kv_hw[1], head_dim)

        attn = jnp.einsum(
            "bqc,bkc->bqk", qf * scale, kf, preferred_element_type=jnp.float32
        )

        if self.use_rel_pos:
            size = self.input_size[0]
            rel_dim = 2 * max(size // self.stride_q, size // self.stride_kv) - 1
            rel_pos_h = self.param("rel_pos_h", nn.initializers.zeros, (rel_dim, head_dim))
            rel_pos_w = self.param("rel_pos_w", nn.initializers.zeros, (rel_dim, head_dim))
            attn = add_decomposed_rel_pos(attn, qf, rel_pos_h, rel_pos_w, q_hw, kv_hw)

        attn = jax.nn.softmax(attn, axis=-1).astype(vf.dtype)
        out = jnp.einsum(
            "bqk,bkc->bqc", attn, vf, preferred_element_type=jnp.float32
        ).astype(vf.dtype)
        out = out.reshape(out.shape[0], q_hw[0], q_hw[1], head_dim)

        if self.window_size:
            out = window_unpartition(out, q_win, q_hw_pad, ori_q.shape[1:3])

        if self.residual_pooling:
            out = out + ori_q

        Hq, Wq = out.shape[1], out.shape[2]
        out = (
            out.reshape(B, self.num_heads, Hq, Wq, head_dim)
            .transpose(0, 2, 3, 1, 4)
            .reshape(B, Hq, Wq, self.dim_out)
        )
        return nn.Dense(self.dim_out, name="proj", dtype=x.dtype)(out)


class MultiScaleBlock(nn.Module):
    """Pre-norm transformer block with pooled attention
    (reference mvit.py:177-269). The residual projection reuses norm1's
    output and the residual path is max-pooled when Q is strided."""

    dim: int
    dim_out: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    pool_kernel: int = 3
    stride_q: int = 1
    stride_kv: int = 1
    residual_pooling: bool = True
    window_size: int = 0
    use_rel_pos: bool = False
    input_size: Tuple[int, int] = (56, 56)
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        drop_path = DropPath(self.drop_path, name="drop_path")
        x_norm = LayerNorm(self.dim, eps=1e-5, name="norm1")(x)
        x_block = MultiScaleAttention(
            dim=self.dim,
            dim_out=self.dim_out,
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            pool_kernel=self.pool_kernel,
            stride_q=self.stride_q,
            stride_kv=self.stride_kv,
            residual_pooling=self.residual_pooling,
            window_size=self.window_size,
            use_rel_pos=self.use_rel_pos,
            input_size=self.input_size,
            name="attn",
        )(x_norm)

        if self.dim != self.dim_out:
            x = nn.Dense(self.dim_out, name="proj", dtype=x.dtype)(x_norm)
        if self.stride_q > 1:
            k = self.stride_q + 1
            p = k // 2
            x = nn.max_pool(
                x, (k, k), strides=(self.stride_q, self.stride_q), padding=[(p, p)] * 2
            )

        x = x + drop_path(x_block, deterministic=not train)
        y = LayerNorm(self.dim_out, eps=1e-5, name="norm2")(x)
        y = nn.Dense(int(self.dim_out * self.mlp_ratio), dtype=x.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim_out, name="mlp_fc2", dtype=x.dtype)(y)
        return x + drop_path(y, deterministic=not train)


class MViT(Backbone):
    """MViTv2 (reference mvit.py:271-448).

    ``depths`` is the per-stage block count (the reference's
    ``last_block_indexes`` = cumsum(depths)-1); ``num_heads`` is per stage
    and must double each stage to match the reference schedule.
    """

    img_size: int = 224
    patch_kernel: int = 7
    patch_stride: int = 4
    patch_padding: int = 3
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 3, 16, 3)
    num_heads: Tuple[int, ...] = (1, 2, 4, 8)
    qkv_pool_kernel: int = 3
    adaptive_kv_stride: int = 4
    adaptive_window_size: int = 56
    residual_pooling: bool = True
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    use_abs_pos: bool = False
    use_rel_pos: bool = True
    pretrain_img_size: int = 224
    pretrain_use_cls_token: bool = True
    out_features: Tuple[str, ...] = ("scale2", "scale3", "scale4", "scale5")
    drop_path_rate: float = 0.0
    use_checkpoint: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        p = self.patch_kernel
        x = nn.Conv(
            self.embed_dim,
            (p, p),
            strides=(self.patch_stride, self.patch_stride),
            padding=[(self.patch_padding, self.patch_padding)] * 2,
            dtype=x.dtype,
            name="patch_embed",
        )(x)

        if self.use_abs_pos:
            num_patches = (self.pretrain_img_size // self.patch_stride) ** 2
            num_positions = num_patches + 1 if self.pretrain_use_cls_token else num_patches
            pos_embed = self.param(
                "pos_embed", nn.initializers.normal(0.02), (1, num_positions, self.embed_dim)
            )
            grid = pos_embed[:, 1:] if self.pretrain_use_cls_token else pos_embed
            side = int(math.sqrt(grid.shape[1]))
            grid = grid.reshape(1, side, side, self.embed_dim)
            if (side, side) != (x.shape[1], x.shape[2]):
                grid = jax.image.resize(
                    grid, (1, x.shape[1], x.shape[2], self.embed_dim), method="bicubic"
                )
            x = x + grid.astype(x.dtype)

        last_block_indexes = []
        acc = 0
        for d in self.depths:
            acc += d
            last_block_indexes.append(acc - 1)

        outs = {}
        dim = self.embed_dim
        dim_out = self.embed_dim
        stride_kv = self.adaptive_kv_stride
        window_size = self.adaptive_window_size
        input_size = (self.img_size // self.patch_stride,) * 2
        stage = 2
        for i in range(sum(self.depths)):
            stage_idx = next(s for s, lb in enumerate(last_block_indexes) if i <= lb)
            # last blocks of stage 2 and 3 double their kv stride; last three
            # stages end with a global-attention block (reference :366-374)
            stride_kv_ = stride_kv * 2 if i in last_block_indexes[1:3] else stride_kv
            window_size_ = 0 if i in last_block_indexes[1:] else window_size
            block_fn = MultiScaleBlock
            if self.use_checkpoint:
                # train flag (arg 2, after self) must be static under remat
                block_fn = nn.checkpoint(MultiScaleBlock, static_argnums=(2,))
            x = block_fn(
                dim=dim,
                dim_out=dim_out,
                num_heads=self.num_heads[stage_idx],
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                pool_kernel=self.qkv_pool_kernel,
                stride_q=2 if i - 1 in last_block_indexes else 1,
                stride_kv=stride_kv_,
                residual_pooling=self.residual_pooling,
                window_size=window_size_,
                use_rel_pos=self.use_rel_pos,
                input_size=input_size,
                drop_path=self.drop_path_rate * i / max(sum(self.depths) - 1, 1),
                name=f"blocks_{i}",
            )(x, train)
            dim = dim_out
            if i in last_block_indexes:
                name = f"scale{stage}"
                if name in self.out_features:
                    outs[name] = LayerNorm(dim_out, eps=1e-5, name=f"{name}_norm")(x)
                dim_out *= 2
                stride_kv = max(stride_kv // 2, 1)
                stage += 1
            if i - 1 in last_block_indexes:
                window_size = window_size // 2
                input_size = (input_size[0] // 2, input_size[1] // 2)
        return outs

    def output_shape(self) -> Dict[str, ShapeSpec]:
        shapes = {}
        dim = self.embed_dim
        stride = self.patch_stride
        for stage in range(len(self.depths)):
            if stage > 0:
                dim *= 2
                stride *= 2
            name = f"scale{stage + 2}"
            if name in self.out_features:
                shapes[name] = ShapeSpec(channels=dim, stride=stride)
        return shapes

    @property
    def size_divisibility(self) -> int:
        return self.patch_stride * (2 ** (len(self.depths) - 1))
