"""Non-causal WaveNet with global conditioning, feature-last
(reference jatts/modules/wavenet/wavenet.py:19-194, residual_block.py:17-167).

Conv weight normalization is implemented as the explicit reparametrization
w = g * v / ||v|| (matches torch weight_norm's weight_g/weight_v split, so
checkpoint import is mechanical).
"""

from __future__ import annotations

import flax.linen as nn
import jax.lax as lax
import jax.numpy as jnp
import numpy as np


class WNConv(nn.Module):
    """1-D conv with optional weight normalization, feature-last [B, T, C]."""

    features: int
    kernel_size: int = 1
    dilation: int = 1
    use_bias: bool = True
    use_weight_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_feat = x.shape[-1]
        k = self.kernel_size
        kernel_shape = (k, in_feat, self.features)
        if self.use_weight_norm:
            v = self.param(
                "v",
                nn.initializers.he_normal(in_axis=(0, 1), out_axis=2),
                kernel_shape,
            )
            g = self.param(
                "g",
                lambda rng: jnp.linalg.norm(v.reshape(-1, self.features), axis=0),
            )
            norm = jnp.maximum(
                jnp.linalg.norm(v.reshape(-1, self.features), axis=0), 1e-12
            )
            kernel = v * (g / norm)[None, None, :]
        else:
            kernel = self.param(
                "kernel",
                nn.initializers.he_normal(in_axis=(0, 1), out_axis=2),
                kernel_shape,
            )
        pad = (k - 1) // 2 * self.dilation
        y = lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(1,),
            padding=[(pad, pad)],
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        if self.use_bias:
            b = self.param("b", nn.initializers.zeros, (self.features,))
            y = y + b.astype(self.dtype)
        return y


class ResidualBlock(nn.Module):
    """Gated residual block (reference residual_block.py:42-167)."""

    kernel_size: int
    residual_channels: int
    gate_channels: int
    skip_channels: int
    dilation: int = 1
    global_channels: int = -1
    dropout_rate: float = 0.0
    use_weight_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_mask=None, g=None, deterministic: bool = True):
        # x: [B, T, C_res]; x_mask: [B, T, 1]; g: [B, 1, C_g]
        residual = x
        h = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        h = WNConv(
            self.gate_channels, self.kernel_size, self.dilation,
            use_weight_norm=self.use_weight_norm, dtype=self.dtype, name="conv",
        )(h)
        xa, xb = jnp.split(h, 2, axis=-1)
        if g is not None:
            gh = WNConv(
                self.gate_channels, 1, use_bias=False,
                use_weight_norm=self.use_weight_norm, dtype=self.dtype,
                name="conv1x1_glo",
            )(g)
            ga, gb = jnp.split(gh, 2, axis=-1)
            xa, xb = xa + ga, xb + gb
        h = jnp.tanh(xa) * nn.sigmoid(xb)
        h = WNConv(
            self.residual_channels + self.skip_channels, 1,
            use_weight_norm=self.use_weight_norm, dtype=self.dtype, name="conv1x1_out",
        )(h)
        if x_mask is not None:
            h = h * x_mask
        xr, s = jnp.split(h, [self.residual_channels], axis=-1)
        return xr + residual, s


class WaveNet(nn.Module):
    """Stacked gated residual blocks, skip-sum output
    (reference wavenet.py:19-194, use_first_conv=use_last_conv=False)."""

    kernel_size: int = 5
    layers: int = 16
    stacks: int = 1
    base_dilation: int = 1
    residual_channels: int = 192
    gate_channels: int = 384
    skip_channels: int = 192
    global_channels: int = -1
    dropout_rate: float = 0.0
    use_weight_norm: bool = True
    scale_skip_connect: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_mask=None, g=None, deterministic: bool = True):
        layers_per_stack = self.layers // self.stacks
        skips = 0.0
        for layer in range(self.layers):
            dilation = self.base_dilation ** (layer % layers_per_stack)
            x, s = ResidualBlock(
                self.kernel_size, self.residual_channels, self.gate_channels,
                self.skip_channels, dilation, self.global_channels,
                self.dropout_rate, self.use_weight_norm, dtype=self.dtype,
                name=f"conv_layers_{layer}",
            )(x, x_mask, g, deterministic=deterministic)
            skips = skips + s
        x = skips
        if self.scale_skip_connect:
            x = x * float(np.sqrt(1.0 / self.layers))
        return x
