"""Tacotron2 Prenet / Postnet (reference jatts/modules/pre_postnets.py)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class Prenet(nn.Module):
    """Always-on-dropout prenet (reference pre_postnets.py:14-66)."""

    n_layers: int = 2
    n_units: int = 256
    dropout_rate: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = False):
        # NOTE: the reference applies dropout even at inference (Tacotron2
        # convention); pass deterministic=True to disable explicitly.
        for i in range(self.n_layers):
            x = nn.relu(nn.Dense(self.n_units, dtype=self.dtype, name=f"dense_{i}")(x))
            x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return x


class Postnet(nn.Module):
    """5x conv-BN-tanh residual refiner, feature-last [B, T, odim]
    (reference pre_postnets.py:69-185)."""

    odim: int
    n_layers: int = 5
    n_chans: int = 512
    n_filts: int = 5
    dropout_rate: float = 0.5
    use_batch_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, deterministic: bool = True):
        for layer in range(self.n_layers - 1):
            xs = nn.Conv(
                self.n_chans, (self.n_filts,), padding="SAME", use_bias=False,
                dtype=self.dtype, name=f"conv_{layer}",
            )(xs)
            if self.use_batch_norm:
                xs = nn.BatchNorm(
                    use_running_average=deterministic, momentum=0.9, epsilon=1e-5,
                    dtype=self.dtype, name=f"bn_{layer}",
                )(xs)
            xs = nn.tanh(xs)
            xs = nn.Dropout(self.dropout_rate)(xs, deterministic=deterministic)
        last = self.n_layers - 1
        xs = nn.Conv(
            self.odim, (self.n_filts,), padding="SAME", use_bias=False,
            dtype=self.dtype, name=f"conv_{last}",
        )(xs)
        if self.use_batch_norm:
            xs = nn.BatchNorm(
                use_running_average=deterministic, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=f"bn_{last}",
            )(xs)
        xs = nn.Dropout(self.dropout_rate)(xs, deterministic=deterministic)
        return xs
