"""Matcha-TTS 1-D U-Net flow estimator (reference jatts/modules/matchatts/
decoder.py:243-487, transformer.py:28-364) — feature-last [B, T, C] flax.

Structure per scale: ResnetBlock1D (conv3-GN8-mish x2 + time-emb inject) ->
n_blocks BasicTransformerBlock (self-attn + SnakeBeta FF) -> stride-2
down/up-sampling, with skip-concat between down and up paths.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

_MASK_VAL = -1e9


def mish(x):
    return x * jnp.tanh(nn.softplus(x))


def sinusoidal_pos_emb(t: jnp.ndarray, dim: int, scale: float = 1000.0) -> jnp.ndarray:
    """[B] -> [B, dim] (reference decoder.py:48-63)."""
    half = dim // 2
    emb = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -(np.log(10000.0) / (half - 1)))
    emb = scale * t[:, None] * emb[None, :]
    return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


class TimestepEmbedding(nn.Module):
    """linear-silu-linear (reference decoder.py:109-152)."""

    time_embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample):
        h = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(sample)
        h = nn.silu(h)
        return nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_2")(h)


class Block1D(nn.Module):
    """conv3 -> GroupNorm(8) -> mish, masked (reference decoder.py:66-78)."""

    dim_out: int
    groups: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        # x: [B, T, C]; mask: [B, T, 1]
        h = nn.Conv(self.dim_out, (3,), padding="SAME", dtype=self.dtype, name="conv")(
            x * mask
        )
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, dtype=self.dtype, name="norm")(h)
        return mish(h) * mask


class ResnetBlock1D(nn.Module):
    """reference decoder.py:80-97."""

    dim_out: int
    groups: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, time_emb):
        h = Block1D(self.dim_out, self.groups, dtype=self.dtype, name="block1")(x, mask)
        h = h + nn.Dense(self.dim_out, dtype=self.dtype, name="mlp")(mish(time_emb))[:, None, :]
        h = Block1D(self.dim_out, self.groups, dtype=self.dtype, name="block2")(h, mask)
        res = nn.Conv(self.dim_out, (1,), dtype=self.dtype, name="res_conv")(x * mask)
        return h + res


class SnakeBetaFF(nn.Module):
    """SnakeBeta projection + linear out (reference transformer.py:28-157).

    snakebeta(x) = x + (1/beta) * sin^2(alpha * x), log-scale learnable
    alpha/beta initialized at 0 (i.e. exp(0)=1).
    """

    dim_out: int
    inner_dim: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Dense(self.inner_dim, dtype=self.dtype, name="proj")(x)
        alpha = self.param("alpha", nn.initializers.zeros, (self.inner_dim,))
        beta = self.param("beta", nn.initializers.zeros, (self.inner_dim,))
        a, b = jnp.exp(alpha), jnp.exp(beta)
        h = h + (1.0 / (b + 1e-9)) * jnp.sin(h * a) ** 2
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(self.dim_out, dtype=self.dtype, name="out")(h)


class BasicTransformerBlock(nn.Module):
    """Self-attn + FF with pre-LN (reference transformer.py:160-364,
    norm_type=layer_norm, self-attention only)."""

    dim: int
    num_heads: int
    head_dim: int
    dropout_rate: float = 0.0
    act_fn: str = "snakebeta"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask=None, deterministic: bool = True):
        # x: [B, T, C]; attn_mask: [B, T] True on valid
        inner = self.num_heads * self.head_dim
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(h)
        b, t, _ = h.shape
        q = q.reshape(b, t, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(self.head_dim, q.dtype)
        )
        if attn_mask is not None:
            scores = jnp.where(attn_mask[:, None, None, :], scores, _MASK_VAL)
        attn = nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, inner)
        out = nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)
        # diffusers Attention's to_out = [Linear, Dropout(p)]
        # (reference transformer.py:222-230 passes dropout=dropout)
        out = nn.Dropout(self.dropout_rate)(out, deterministic=deterministic)
        x = x + out

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        ff = SnakeBetaFF(
            self.dim, self.dim * 4, self.dropout_rate, dtype=self.dtype, name="ff"
        )(h, deterministic=deterministic)
        return x + ff


class MatchaDecoder(nn.Module):
    """U-Net estimator (reference decoder.py:243-487). Inputs feature-last:
    x [B, T, C_out], mu [B, T, C_out], mask [B, T], t [B]."""

    out_channels: int
    channels: Sequence[int] = (256, 256)
    dropout_rate: float = 0.05
    attention_head_dim: int = 64
    n_blocks: int = 1
    num_mid_blocks: int = 2
    num_heads: int = 4
    act_fn: str = "snakebeta"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, mu, t, deterministic: bool = True):
        chans = tuple(self.channels)
        in_dim = 2 * self.out_channels
        temb = sinusoidal_pos_emb(t, in_dim)
        temb = TimestepEmbedding(chans[0] * 4, dtype=self.dtype, name="time_mlp")(temb)

        h = jnp.concatenate([x, mu], axis=-1)  # [B, T, 2C]
        masks = [mask[..., None]]  # feature-last [B, T, 1]
        hiddens = []
        # ---- down path ----
        for i, ch in enumerate(chans):
            is_last = i == len(chans) - 1
            m = masks[-1]
            h = ResnetBlock1D(ch, dtype=self.dtype, name=f"down_resnet_{i}")(h, m, temb)
            for j in range(self.n_blocks):
                h = BasicTransformerBlock(
                    ch, self.num_heads, self.attention_head_dim, self.dropout_rate,
                    self.act_fn, dtype=self.dtype, name=f"down_tf_{i}_{j}",
                )(h, m[..., 0] > 0, deterministic=deterministic)
            hiddens.append(h)
            if not is_last:
                h = nn.Conv(
                    ch, (3,), strides=(2,), padding=[(1, 1)], dtype=self.dtype,
                    name=f"downsample_{i}",
                )(h * m)
                masks.append(m[:, ::2])
            else:
                h = nn.Conv(
                    ch, (3,), padding="SAME", dtype=self.dtype, name=f"downsample_{i}"
                )(h * m)

        # ---- mid ----
        m = masks[-1]
        for i in range(self.num_mid_blocks):
            h = ResnetBlock1D(chans[-1], dtype=self.dtype, name=f"mid_resnet_{i}")(h, m, temb)
            for j in range(self.n_blocks):
                h = BasicTransformerBlock(
                    chans[-1], self.num_heads, self.attention_head_dim,
                    self.dropout_rate, self.act_fn, dtype=self.dtype,
                    name=f"mid_tf_{i}_{j}",
                )(h, m[..., 0] > 0, deterministic=deterministic)

        # ---- up path ----
        up_chans = chans[::-1] + (chans[0],)
        for i in range(len(up_chans) - 1):
            out_ch = up_chans[i + 1]
            is_last = i == len(up_chans) - 2
            m = masks.pop()
            h = jnp.concatenate([h, hiddens.pop()], axis=-1)
            h = ResnetBlock1D(out_ch, dtype=self.dtype, name=f"up_resnet_{i}")(h, m, temb)
            for j in range(self.n_blocks):
                h = BasicTransformerBlock(
                    out_ch, self.num_heads, self.attention_head_dim,
                    self.dropout_rate, self.act_fn, dtype=self.dtype,
                    name=f"up_tf_{i}_{j}",
                )(h, m[..., 0] > 0, deterministic=deterministic)
            if not is_last:
                # torch ConvTranspose1d(4, stride=2, padding=1) == flax
                # explicit padding (k-1-p, k-1-p+op) = (2, 2) with
                # transpose_kernel=True (see vocoder/hifigan.py)
                h = nn.ConvTranspose(
                    out_ch, (4,), strides=(2,), padding=[(2, 2)],
                    transpose_kernel=True, dtype=self.dtype,
                    name=f"upsample_{i}",
                )(h * m)
            else:
                h = nn.Conv(
                    out_ch, (3,), padding="SAME", dtype=self.dtype, name=f"upsample_{i}"
                )(h * m)

        m = mask[..., None]
        h = Block1D(up_chans[-1], dtype=self.dtype, name="final_block")(h, m)
        out = nn.Conv(self.out_channels, (1,), dtype=self.dtype, name="final_proj")(h * m)
        return out * m
