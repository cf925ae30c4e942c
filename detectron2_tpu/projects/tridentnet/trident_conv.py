"""Weight-shared multi-dilation convolution
(reference projects/TridentNet/tridentnet/trident_conv.py).

One kernel parameter, applied once per branch with that branch's dilation —
XLA compiles each application to its own fused conv; the parameter (and its
gradient accumulation across branches) is shared automatically because the
same ``self.param`` backs every application.
"""

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

__all__ = ["TridentConv"]


class TridentConv(nn.Module):
    features: int
    kernel_size: int = 3
    strides: int = 1
    dilations: Tuple[int, ...] = (1, 2, 3)
    use_bias: bool = False

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]):
        """inputs: one NHWC tensor per branch -> list of conv outputs."""
        assert len(inputs) == len(self.dilations)
        k = self.kernel_size
        in_ch = inputs[0].shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            (k, k, in_ch, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,)) if self.use_bias else None

        outs = []
        for x, d in zip(inputs, self.dilations):
            pad = d * (k - 1) // 2
            y = lax.conv_general_dilated(
                x,
                kernel.astype(x.dtype),
                window_strides=(self.strides, self.strides),
                padding=[(pad, pad), (pad, pad)],
                rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if bias is not None:
                y = y + bias.astype(y.dtype)
            outs.append(y)
        return outs
