"""MViTv2 backbone (reference detectron2/modeling/backbone/mvit.py:271-448;
pooled multiscale attention :33-176).

Multi-scale ViT: attention pools Q (stride per stage transition) and K/V
(larger stride), with decomposed relative positions and residual pooled-Q
connections. NHWC flax; poolings are strided depthwise convs (MXU-friendly).
"""

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from detectron2_tpu.layers.batch_norm import LayerNorm
from detectron2_tpu.layers.shape_spec import ShapeSpec
from detectron2_tpu.modeling.backbone.backbone import Backbone
from detectron2_tpu.modeling.backbone.vit import add_decomposed_rel_pos

__all__ = ["MViT"]


class _PoolConv(nn.Module):
    """Depthwise strided conv pooling applied per attention head."""

    dim: int
    stride: int

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, C] -> [B, H/s, W/s, C]"""
        if self.stride == 1:
            k = 3
            return nn.Conv(
                self.dim, (k, k), strides=(1, 1), padding=[(1, 1)] * 2,
                feature_group_count=self.dim, use_bias=False, dtype=x.dtype, name="pool",
            )(x)
        k = self.stride + 1
        p = k // 2
        return nn.Conv(
            self.dim, (k, k), strides=(self.stride, self.stride), padding=[(p, p)] * 2,
            feature_group_count=self.dim, use_bias=False, dtype=x.dtype, name="pool",
        )(x)


class MultiScaleAttention(nn.Module):
    dim: int
    dim_out: int
    num_heads: int
    q_stride: int = 1
    kv_stride: int = 1
    use_rel_pos: bool = True
    input_size: Tuple[int, int] = (56, 56)
    residual_pooling: bool = True

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, C] -> [B, H/q_stride, W/q_stride, dim_out]"""
        B, H, W, _ = x.shape
        head_dim = self.dim_out // self.num_heads
        scale = head_dim**-0.5

        qkv = nn.Dense(3 * self.dim_out, name="qkv", dtype=x.dtype)(x)  # [B,H,W,3*dim_out]
        q, k, v = jnp.split(qkv, 3, axis=-1)

        q = _PoolConv(self.dim_out, self.q_stride, name="pool_q")(q)
        k = _PoolConv(self.dim_out, self.kv_stride, name="pool_k")(k)
        v = _PoolConv(self.dim_out, self.kv_stride, name="pool_v")(v)

        qh, qw = q.shape[1], q.shape[2]
        kh, kw = k.shape[1], k.shape[2]

        def heads(t, h_, w_):
            return (
                t.reshape(B, h_ * w_, self.num_heads, head_dim)
                .transpose(0, 2, 1, 3)
                .reshape(B * self.num_heads, h_ * w_, head_dim)
            )

        qf, kf, vf = heads(q, qh, qw), heads(k, kh, kw), heads(v, kh, kw)
        attn = jnp.einsum("bqc,bkc->bqk", qf * scale, kf, preferred_element_type=jnp.float32)

        if self.use_rel_pos:
            rel_h = self.param("rel_pos_h", nn.initializers.zeros, (2 * max(qh, kh) - 1, head_dim))
            rel_w = self.param("rel_pos_w", nn.initializers.zeros, (2 * max(qw, kw) - 1, head_dim))
            attn = add_decomposed_rel_pos(attn, qf, rel_h, rel_w, (qh, qw), (kh, kw))

        attn = jax.nn.softmax(attn, axis=-1).astype(vf.dtype)
        out = jnp.einsum("bqk,bkc->bqc", attn, vf, preferred_element_type=jnp.float32).astype(vf.dtype)
        out = out.reshape(B, self.num_heads, qh * qw, head_dim).transpose(0, 2, 1, 3).reshape(B, qh, qw, self.dim_out)

        if self.residual_pooling:
            out = out + q

        return nn.Dense(self.dim_out, name="proj", dtype=x.dtype)(out)


class MViTBlock(nn.Module):
    dim: int
    dim_out: int
    num_heads: int
    q_stride: int = 1
    kv_stride: int = 1
    mlp_ratio: float = 4.0
    use_rel_pos: bool = True
    input_size: Tuple[int, int] = (56, 56)

    @nn.compact
    def __call__(self, x):
        shortcut = x
        x = LayerNorm(self.dim, name="norm1")(x)
        x = MultiScaleAttention(
            dim=self.dim,
            dim_out=self.dim_out,
            num_heads=self.num_heads,
            q_stride=self.q_stride,
            kv_stride=self.kv_stride,
            use_rel_pos=self.use_rel_pos,
            input_size=self.input_size,
            name="attn",
        )(x)
        if self.q_stride > 1 or self.dim != self.dim_out:
            # pool + project the residual path
            shortcut = nn.max_pool(
                shortcut, (self.q_stride, self.q_stride), strides=(self.q_stride, self.q_stride)
            ) if self.q_stride > 1 else shortcut
            shortcut = nn.Dense(self.dim_out, name="proj_residual", dtype=x.dtype)(
                LayerNorm(self.dim, name="norm_residual")(shortcut)
            )
        x = shortcut + x
        y = LayerNorm(self.dim_out, name="norm2")(x)
        y = nn.Dense(int(self.dim_out * self.mlp_ratio), dtype=x.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim_out, name="mlp_fc2", dtype=x.dtype)(y)
        return x + y


class MViT(Backbone):
    """MViTv2; depths per stage with Q-pooling at stage transitions."""

    patch_size: int = 7
    patch_stride: int = 4
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 3, 16, 3)
    num_heads: Tuple[int, ...] = (1, 2, 4, 8)
    mlp_ratio: float = 4.0
    use_rel_pos: bool = True
    out_features: Tuple[str, ...] = ("scale2", "scale3", "scale4", "scale5")

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        p = self.patch_size
        x = nn.Conv(
            self.embed_dim, (p, p), strides=(self.patch_stride, self.patch_stride),
            padding=[(p // 2, p // 2)] * 2, dtype=x.dtype, name="patch_embed",
        )(x)

        outs = {}
        dim = self.embed_dim
        for stage, depth in enumerate(self.depths):
            for b in range(depth):
                first = b == 0 and stage > 0
                x = MViTBlock(
                    dim=dim * 2 if False else (dim if not first else dim),
                    dim_out=dim * 2 if first else dim,
                    num_heads=self.num_heads[stage],
                    q_stride=2 if first else 1,
                    kv_stride=max(1, 2 ** (len(self.depths) - stage - 2)) if self.use_rel_pos else 1,
                    mlp_ratio=self.mlp_ratio,
                    use_rel_pos=self.use_rel_pos,
                    input_size=(x.shape[1], x.shape[2]),
                    name=f"stage{stage}_block{b}",
                )(x)
                if first:
                    dim *= 2
            name = f"scale{stage + 2}"
            if name in self.out_features:
                outs[name] = LayerNorm(dim, name=f"out_norm{stage}")(x)
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
