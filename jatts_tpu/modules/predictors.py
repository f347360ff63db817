"""Duration / variance predictors (reference jatts/modules/duration_predictor.py,
variance_predictor.py)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class ConvReluNormStack(nn.Module):
    """Shared conv->relu->LayerNorm->dropout trunk of both predictors."""

    n_layers: int
    n_chans: int
    kernel_size: int
    dropout_rate: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, deterministic: bool = True):
        for i in range(self.n_layers):
            xs = nn.Conv(
                self.n_chans, (self.kernel_size,), padding="SAME",
                dtype=self.dtype, name=f"conv_{i}",
            )(xs)
            xs = nn.relu(xs)
            xs = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm_{i}")(xs)
            xs = nn.Dropout(self.dropout_rate)(xs, deterministic=deterministic)
        return xs


class DurationPredictor(nn.Module):
    """Log-domain duration predictor (reference duration_predictor.py:24-125).

    Training output: log(duration + offset). Use
    ``jatts_tpu.ops.upsample.predicted_durations_to_int`` (exp-round-clamp)
    at inference.
    """

    n_layers: int = 2
    n_chans: int = 384
    kernel_size: int = 3
    dropout_rate: float = 0.1
    offset: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, x_masks=None, deterministic: bool = True):
        xs = ConvReluNormStack(
            self.n_layers, self.n_chans, self.kernel_size, self.dropout_rate,
            dtype=self.dtype, name="conv",
        )(xs, deterministic=deterministic)
        xs = nn.Dense(1, dtype=self.dtype, name="linear")(xs)[..., 0]  # [B, T]
        if x_masks is not None:
            xs = xs * x_masks.astype(xs.dtype)
        return xs


class VariancePredictor(nn.Module):
    """Pitch/energy predictor, output [B, T, 1] (reference variance_predictor.py:13-86)."""

    n_layers: int = 2
    n_chans: int = 384
    kernel_size: int = 3
    dropout_rate: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, x_masks=None, deterministic: bool = True):
        xs = ConvReluNormStack(
            self.n_layers, self.n_chans, self.kernel_size, self.dropout_rate,
            dtype=self.dtype, name="conv",
        )(xs, deterministic=deterministic)
        xs = nn.Dense(1, dtype=self.dtype, name="linear")(xs)  # [B, T, 1]
        if x_masks is not None:
            # x_masks: [B, T, 1] validity
            xs = xs * x_masks.astype(xs.dtype)
        return xs
