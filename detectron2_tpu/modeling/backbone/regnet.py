"""RegNet backbone (reference detectron2/modeling/backbone/regnet.py:28-452):
AnyNet with the RegNet block-width parameterization (w = w0 + wa*i quantized
by wm), X/Y bottleneck blocks with group conv and optional SE."""

from typing import Dict, Optional, Tuple

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

from detectron2_tpu.layers.batch_norm import get_norm
from detectron2_tpu.layers.shape_spec import ShapeSpec
from detectron2_tpu.layers.wrappers import Conv2d
from detectron2_tpu.modeling.backbone.backbone import Backbone

__all__ = ["RegNet", "generate_regnet_parameters"]


def generate_regnet_parameters(
    w_a: float, w_0: int, w_m: float, d: int, q: int = 8, group_width: int = 1, bot_mul: float = 1.0
):
    """RegNet width ladder (reference regnet.py:310-340): ws[i] = w0 + wa*i,
    quantized into stages by log-steps of wm; per-stage widths and group
    widths are then adjusted for compatibility like the reference's
    ``adjust_block_compatibility`` (group width capped at the bottleneck
    width, bottleneck width rounded to a multiple of it).

    Returns (ws, ds, gs): stage widths, depths, per-stage group widths.
    """
    assert w_a >= 0 and w_0 > 0 and w_m > 1 and w_0 % q == 0
    ws_cont = np.arange(d) * w_a + w_0
    ks = np.round(np.log(ws_cont / w_0) / np.log(w_m))
    ws_all = w_0 * np.power(w_m, ks)
    ws_all = np.round(np.divide(ws_all, q)).astype(int) * q
    ws, ds = np.unique(ws_all, return_counts=True)
    # preserve ladder order
    order = np.argsort([np.where(ws_all == w)[0][0] for w in ws])
    ws, ds = ws[order].tolist(), ds[order].tolist()

    gs, ws_adj = [], []
    for w in ws:
        w_b = max(1, int(round(w * bot_mul)))
        g = min(group_width, w_b)
        w_b = int(round(w_b / g)) * g
        gs.append(g)
        ws_adj.append(int(round(w_b / bot_mul)))
    return ws_adj, ds, gs


class SE(nn.Module):
    """Squeeze-and-excitation."""

    w_in: int
    w_se: int

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.w_se, (1, 1), dtype=x.dtype, name="f_ex_0")(s)
        s = nn.relu(s)
        s = nn.Conv(self.w_in, (1, 1), dtype=x.dtype, name="f_ex_2")(s)
        return x * nn.sigmoid(s)


class XBlock(nn.Module):
    """RegNet X/Y bottleneck block."""

    w_in: int
    w_out: int
    stride: int = 1
    group_width: int = 16
    bottleneck_multiplier: float = 1.0
    se_ratio: float = 0.0
    norm: str = "BN"

    @nn.compact
    def __call__(self, x, train: bool = False):
        w_b = int(round(self.w_out * self.bottleneck_multiplier))
        groups = max(w_b // self.group_width, 1)

        out = Conv2d(
            features=w_b, kernel_size=1, use_bias=False,
            norm=get_norm(self.norm, w_b), activation=nn.relu, name="a",
        )(x, train=train)
        out = Conv2d(
            features=w_b, kernel_size=3, strides=self.stride, padding=1, groups=groups,
            use_bias=False, norm=get_norm(self.norm, w_b), activation=nn.relu, name="b",
        )(out, train=train)
        if self.se_ratio > 0:
            out = SE(w_in=w_b, w_se=int(round(self.w_in * self.se_ratio)), name="se")(out)
        out = Conv2d(
            features=self.w_out, kernel_size=1, use_bias=False,
            norm=get_norm(self.norm, self.w_out), name="c",
        )(out, train=train)

        if self.w_in != self.w_out or self.stride != 1:
            shortcut = Conv2d(
                features=self.w_out, kernel_size=1, strides=self.stride, use_bias=False,
                norm=get_norm(self.norm, self.w_out), name="proj",
            )(x, train=train)
        else:
            shortcut = x
        return nn.relu(out + shortcut)


class RegNet(Backbone):
    """A RegNet{X,Y} backbone; construct with the (w_a, w_0, w_m, depth)
    parameterization (e.g. RegNetY-4GF: w_a=31.41, w_0=96, w_m=2.24, d=22,
    group_width=64, se_ratio=0.25)."""

    w_a: float = 31.41
    w_0: int = 96
    w_m: float = 2.24
    depth: int = 22
    group_width: int = 64
    se_ratio: float = 0.0
    stem_width: int = 32
    bottleneck_multiplier: float = 1.0
    norm: str = "BN"
    out_features: Tuple[str, ...] = ("s1", "s2", "s3", "s4")
    freeze_at: int = 0

    def _ladder(self):
        return generate_regnet_parameters(
            self.w_a, self.w_0, self.w_m, self.depth,
            group_width=self.group_width, bot_mul=self.bottleneck_multiplier,
        )

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        import jax

        x = Conv2d(
            features=self.stem_width, kernel_size=3, strides=2, padding=1, use_bias=False,
            norm=get_norm(self.norm, self.stem_width), activation=nn.relu, name="stem",
        )(x, train=train)
        if self.freeze_at >= 1:
            x = jax.lax.stop_gradient(x)

        ws, ds, gs = self._ladder()
        outs = {}
        w_in = self.stem_width
        for i, (w, d, g) in enumerate(zip(ws, ds, gs), start=1):
            for b in range(d):
                x = XBlock(
                    w_in=w_in if b == 0 else w,
                    w_out=w,
                    stride=2 if b == 0 else 1,
                    group_width=g,
                    bottleneck_multiplier=self.bottleneck_multiplier,
                    se_ratio=self.se_ratio,
                    norm=self.norm,
                    name=f"s{i}_b{b}",
                )(x, train=train)
            if self.freeze_at >= i + 1:
                x = jax.lax.stop_gradient(x)
            w_in = w
            name = f"s{i}"
            if name in self.out_features:
                outs[name] = x
        return outs

    def output_shape(self) -> Dict[str, ShapeSpec]:
        ws, _, _ = self._ladder()
        shapes = {}
        stride = 2
        for i, w in enumerate(ws, start=1):
            stride *= 2
            name = f"s{i}"
            if name in self.out_features:
                shapes[name] = ShapeSpec(channels=int(w), stride=stride)
        return shapes

    @property
    def size_divisibility(self) -> int:
        return 2 ** (1 + len(self._ladder()[0]))
