"""Normalization layers as flax modules (NHWC).

Parity with reference detectron2/layers/batch_norm.py, re-designed for jax:

- FrozenBatchNorm2d: affine-only BN with frozen statistics; parameters are
  wrapped in stop_gradient so they never train (the reference's default
  ResNet norm, batch_norm.py:13-134).
- NaiveSyncBatchNorm -> :class:`SyncBatchNorm`: cross-replica BN. Under the
  pjit/GSPMD step the batch is one global array, so plain batch statistics
  already span every replica (XLA inserts the cross-chip reduction from the
  sharding) — no explicit collective call, replacing the reference's
  differentiable_all_reduce (batch_norm.py:200-283). ``axis_name`` exists
  for pmap/shard_map contexts.
- get_norm: the string -> norm factory (batch_norm.py:169).
"""

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "FrozenBatchNorm2d",
    "BatchNorm",
    "SyncBatchNorm",
    "NaiveSyncBatchNorm",
    "GroupNorm",
    "LayerNorm",
    "get_norm",
    "CycleBatchNormList",
]


class FrozenBatchNorm2d(nn.Module):
    """BatchNorm2d where the batch statistics and affine parameters are fixed.

    Holds the same 4 arrays as the reference (weight, bias, running_mean,
    running_var) so d2 checkpoints convert 1:1; the output is computed with
    precomputed scale/bias arithmetic and all parameters pass through
    ``stop_gradient``.
    """

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        running_mean = self.param("running_mean", nn.initializers.zeros, (self.features,))
        running_var = self.param("running_var", nn.initializers.ones, (self.features,))

        weight = jax.lax.stop_gradient(weight)
        bias = jax.lax.stop_gradient(bias)
        running_mean = jax.lax.stop_gradient(running_mean)
        running_var = jax.lax.stop_gradient(running_var)

        scale = weight * jax.lax.rsqrt(running_var + self.eps)
        shift = bias - running_mean * scale
        return x * scale.astype(x.dtype) + shift.astype(x.dtype)


class BatchNorm(nn.Module):
    """Standard BatchNorm over NHWC with running statistics in the
    ``batch_stats`` collection. Set ``axis_name`` to sync across a mesh axis."""

    features: int
    eps: float = 1e-5
    momentum: float = 0.9
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.eps,
            axis_name=self.axis_name,
            dtype=x.dtype,
        )
        return bn(x)


class SyncBatchNorm(BatchNorm):
    """Cross-replica BN (TPU-native replacement for the reference's
    NaiveSyncBatchNorm, batch_norm.py:200).

    Under the production pjit/GSPMD step the batch is ONE global array, so
    plain batch statistics are already computed over every replica's
    examples — no explicit pmean is needed (XLA inserts the cross-chip
    reduction from the sharding). Set ``axis_name`` only when running under
    ``pmap``/``shard_map``, where per-shard views need an explicit pmean."""

    axis_name: Optional[str] = None


# the reference exposes this name; same implementation on TPU
NaiveSyncBatchNorm = SyncBatchNorm


class GroupNorm(nn.Module):
    features: int
    num_groups: int = 32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.GroupNorm(num_groups=self.num_groups, epsilon=self.eps, dtype=x.dtype)(x)


class LayerNorm(nn.Module):
    """LayerNorm over the channel dimension only (the "channels-first
    LayerNorm" of reference batch_norm.py:333, expressed channels-last)."""

    features: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x, train: bool = False):
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return y * weight.astype(y.dtype) + bias.astype(y.dtype)


class CycleBatchNormList(nn.Module):
    """A list of BN layers cycled by call index (domain-specific BN,
    reference batch_norm.py:286). The active index is given at call time."""

    length: int
    features: int

    @nn.compact
    def __call__(self, x, index: int = 0, train: bool = False):
        outs = [BatchNorm(self.features)(x, train=train) for _ in range(self.length)]
        return outs[index]


def get_norm(norm: Any, out_channels: int):
    """
    Args:
        norm (str or callable): one of "BN", "SyncBN", "FrozenBN", "GN",
            "nnSyncBN", "naiveSyncBN", "LN", or "" / None (no norm);
            or a callable taking the channel count.

    Returns:
        a norm-module FACTORY (call with optional flax kwargs, e.g.
        ``get_norm("GN", c)(name="norm")``), or None
        (reference batch_norm.py:169).

    Returning a factory instead of an instance matters for parameter paths:
    flax registers a module under the scope where it is INSTANTIATED, so a
    norm constructed at block level and passed into Conv2d would land at
    ``block/FrozenBatchNorm2d_N`` (ambiguous between the block's convs) —
    Conv2d instantiates the factory inside its own scope as ``conv*/norm``,
    matching the reference's ``convN.norm`` checkpoint names.
    """
    import functools

    if norm is None:
        return None
    if isinstance(norm, str):
        if len(norm) == 0:
            return None
        norm_map = {
            "BN": BatchNorm,
            "SyncBN": SyncBatchNorm,
            "FrozenBN": FrozenBatchNorm2d,
            "GN": GroupNorm,
            "nnSyncBN": SyncBatchNorm,
            "naiveSyncBN": SyncBatchNorm,
            "LN": LayerNorm,
        }
        if norm not in norm_map:
            raise KeyError(f"Unknown norm type: {norm}")
        return functools.partial(norm_map[norm], features=out_channels)
    return functools.partial(norm, out_channels)
