"""HiFi-GAN generator in JAX/flax (TPU-native port of the architecture used by
the reference through the ``parallel_wavegan`` package — see
jatts/vocoder/vocoder.py:16-67; the reference loads
``parallel_wavegan.models.HiFiGANGenerator`` checkpoints).

Feature-last layout [B, T, C]; transposed-conv upsampling + multi-receptive-
field fusion (MRF) of dilated residual blocks. Weight norm is folded into the
kernels at import time (the reference calls remove_weight_norm() before
inference too), so inference kernels are plain convs — XLA fuses the
leaky-relu chains into them.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.lax as lax
import jax.numpy as jnp


def _conv1d(x, kernel, bias=None, stride=1, dilation=1, pad="SAME"):
    if pad == "SAME":
        k = kernel.shape[0]
        eff = (k - 1) * dilation
        pads = [(eff // 2, eff - eff // 2)]
    else:
        pads = pad
    y = lax.conv_general_dilated(
        x, kernel, (stride,), pads, rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return y if bias is None else y + bias


class HiFiGANResidualBlock(nn.Module):
    """leaky -> dilated conv -> leaky -> conv(+1 dil) residual, per dilation
    (parallel_wavegan HiFiGANResidualBlock semantics)."""

    kernel_size: int
    channels: int
    dilations: Sequence[int]
    use_additional_convs: bool = True
    alpha: float = 0.1

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            xt = nn.leaky_relu(x, self.alpha)
            xt = nn.Conv(
                self.channels, (self.kernel_size,), kernel_dilation=(d,),
                padding="SAME", name=f"convs1_{i}",
            )(xt)
            if self.use_additional_convs:
                xt = nn.leaky_relu(xt, self.alpha)
                xt = nn.Conv(
                    self.channels, (self.kernel_size,), padding="SAME",
                    name=f"convs2_{i}",
                )(xt)
            x = x + xt
        return x


class HiFiGANGenerator(nn.Module):
    in_channels: int = 80
    out_channels: int = 1
    channels: int = 512
    kernel_size: int = 7
    upsample_scales: Sequence[int] = (5, 5, 4, 3)
    upsample_kernel_sizes: Sequence[int] = (10, 10, 8, 6)
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilations: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    use_additional_convs: bool = True
    alpha: float = 0.1

    @nn.compact
    def __call__(self, c):
        """c: [B, T, in_channels] (normalized log-mel) -> [B, T*prod(scales), 1]."""
        num_k = len(self.resblock_kernel_sizes)
        x = nn.Conv(self.channels, (self.kernel_size,), padding="SAME", name="input_conv")(c)
        for i, (scale, k) in enumerate(zip(self.upsample_scales, self.upsample_kernel_sizes)):
            x = nn.leaky_relu(x, self.alpha)
            ch = self.channels // (2 ** (i + 1))
            # torch ConvTranspose1d(k, stride=s, padding=p=s//2+s%2,
            # output_padding=op=s%2) gives length T*s. flax explicit padding
            # follows the underlying dilated-conv convention, so the
            # equivalent spec is (k-1-p, k-1-p+op).
            p = scale // 2 + scale % 2
            op = scale % 2
            x = nn.ConvTranspose(
                ch, (k,), strides=(scale,),
                padding=[(k - 1 - p, k - 1 - p + op)],
                transpose_kernel=True,
                name=f"upsample_{i}",
            )(x)
            cs = 0.0
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilations)
            ):
                cs = cs + HiFiGANResidualBlock(
                    rk, ch, rd, self.use_additional_convs, self.alpha,
                    name=f"blocks_{i * num_k + j}",
                )(x)
            x = cs / num_k
        x = nn.leaky_relu(x, self.alpha)
        x = nn.Conv(self.out_channels, (self.kernel_size,), padding="SAME", name="output_conv")(x)
        return jnp.tanh(x)
