"""Positional encodings (reference jatts/modules/positional_encoding.py).

Sinusoidal tables are computed as static-shape jnp constants inside jit
(folded by XLA) instead of mutated buffers.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def sinusoid_table(t: int, d_model: int) -> np.ndarray:
    """``[t, d_model]`` sin/cos interleaved table (positional_encoding.py:37-52)."""
    position = np.arange(t, dtype=np.float64)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float64) * -(np.log(10000.0) / d_model)
    )
    pe = np.zeros((t, d_model))
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


def rel_sinusoid_table(t: int, d_model: int) -> np.ndarray:
    """``[2t-1, d_model]`` relative table: positions t-1 … 0 … -(t-1)
    (reference RelPositionalEncoding.extend_pe, positional_encoding.py:260-291)."""
    position = np.arange(t, dtype=np.float64)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float64) * -(np.log(10000.0) / d_model)
    )
    pe_pos = np.zeros((t, d_model))
    pe_pos[:, 0::2] = np.sin(position * div_term)
    pe_pos[:, 1::2] = np.cos(position * div_term)
    pe_neg = np.zeros((t, d_model))
    pe_neg[:, 0::2] = np.sin(-position * div_term)
    pe_neg[:, 1::2] = np.cos(-position * div_term)
    return np.concatenate([pe_pos[::-1], pe_neg[1:]], axis=0)


class PositionalEncoding(nn.Module):
    """Absolute sinusoidal PE: returns ``x*sqrt(d) + pe`` (reference :14-71)."""

    d_model: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        t = x.shape[1]
        pe = jnp.asarray(sinusoid_table(t, self.d_model), dtype=x.dtype)
        x = x * jnp.sqrt(jnp.asarray(self.d_model, x.dtype)) + pe[None]
        return nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)


class ScaledPositionalEncoding(nn.Module):
    """Learnable-alpha PE: ``x + alpha*pe`` (reference :73-107)."""

    d_model: int
    dropout_rate: float = 0.0
    init_alpha: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        t = x.shape[1]
        alpha = self.param("alpha", lambda k: jnp.array([self.init_alpha], jnp.float32))
        pe = jnp.asarray(sinusoid_table(t, self.d_model), dtype=x.dtype)
        x = x + alpha.astype(x.dtype) * pe[None]
        return nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)


class LegacyRelPositionalEncoding(nn.Module):
    """Legacy relative PE: ``(x*sqrt(d), pos_emb[1, T, d])`` with REVERSED
    positions — pos_emb[p] = PE(T-1-p) (reference positional_encoding.py:198-237,
    a PositionalEncoding with reverse=True). Used whenever a reference config
    leaves ``conformer_rel_pos_type`` at its "legacy" default — which is every
    published recipe config."""

    d_model: int
    dropout_rate: float = 0.0
    max_len: int = 5000
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        t = x.shape[1]
        # The reference builds the reversed table ONCE at max_len and slices
        # the first T rows (positional_encoding.py:39-42 + :69) — so row p is
        # PE(max_len-1-p), NOT PE(T-1-p). Faithfully reproduced.
        table = sinusoid_table(max(t, self.max_len), self.d_model)[::-1]
        pe = jnp.asarray(table[:t].copy(), dtype=x.dtype)[None]
        x = x * jnp.sqrt(jnp.asarray(self.d_model, x.dtype))
        drop = nn.Dropout(self.dropout_rate)
        return (
            drop(x, deterministic=deterministic),
            drop(pe, deterministic=deterministic),
        )


class RelPositionalEncoding(nn.Module):
    """Returns ``(x*sqrt(d), pos_emb[1, 2T-1, d])`` (reference :238-309)."""

    d_model: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        t = x.shape[1]
        pe = jnp.asarray(rel_sinusoid_table(t, self.d_model), dtype=x.dtype)[None]
        x = x * jnp.sqrt(jnp.asarray(self.d_model, x.dtype))
        drop = nn.Dropout(self.dropout_rate)
        return (
            drop(x, deterministic=deterministic),
            drop(pe, deterministic=deterministic),
        )
