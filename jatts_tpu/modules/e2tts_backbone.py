"""E2-TTS flat U-Net transformer backbone — UNetT
(reference jatts/modules/e2tts/unett.py:30-272, e2tts/modules.py).

TPU-first deltas: per-SAMPLE CFG drop flags (arrays, not python bools) so
classifier-free guidance runs as ONE doubled-batch forward at inference; no
mutable text cache (XLA CSE dedups the text embedding between the cond/uncond
halves); rotary embedding precomputed as static tables.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

_MASK_VAL = -1e9


def mish(x):
    return x * jnp.tanh(nn.softplus(x))


def sinus_position_embedding(t: jnp.ndarray, dim: int, scale: float = 1000.0):
    half = dim // 2
    emb = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -(np.log(10000.0) / (half - 1)))
    emb = scale * t[:, None] * emb[None, :]
    return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


def rotary_freqs(seq_len: int, dim_head: int, theta: float = 10000.0) -> np.ndarray:
    """[seq_len, dim_head//2] rotation angles."""
    inv = 1.0 / (theta ** (np.arange(0, dim_head, 2, dtype=np.float64) / dim_head))
    t = np.arange(seq_len, dtype=np.float64)
    return np.outer(t, inv)


def apply_rope(x: jnp.ndarray, freqs: jnp.ndarray) -> jnp.ndarray:
    """x: [B, H, N, D]; freqs: [N, D//2] — interleaved-pair rotation."""
    cos = jnp.cos(freqs).astype(x.dtype)[None, None]
    sin = jnp.sin(freqs).astype(x.dtype)[None, None]
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    y1 = x1 * cos - x2 * sin
    y2 = x1 * sin + x2 * cos
    return jnp.stack([y1, y2], axis=-1).reshape(x.shape)


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        return (x * jnp.reciprocal(jnp.sqrt(var + self.eps)).astype(x.dtype)) * w.astype(x.dtype)


class TimestepEmbedding(nn.Module):
    dim: int
    freq_embed_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, t):
        h = sinus_position_embedding(t, self.freq_embed_dim)
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp1")(h)
        h = nn.silu(h)
        return nn.Dense(self.dim, dtype=self.dtype, name="mlp2")(h)


class ConvPositionEmbedding(nn.Module):
    dim: int
    kernel_size: int = 31
    groups: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        if mask is not None:
            x = x * mask[..., None]
        h = nn.Conv(
            self.dim, (self.kernel_size,), padding="SAME",
            feature_group_count=self.groups, dtype=self.dtype, name="conv1",
        )(x)
        h = mish(h)
        h = nn.Conv(
            self.dim, (self.kernel_size,), padding="SAME",
            feature_group_count=self.groups, dtype=self.dtype, name="conv2",
        )(h)
        h = mish(h)
        if mask is not None:
            h = h * mask[..., None]
        return h


class E2Attention(nn.Module):
    """SDPA with rope on the first pe_attn_head heads
    (reference e2tts/modules.py:443-511)."""

    dim: int
    heads: int
    dim_head: int
    pe_attn_head: Optional[int] = None
    dropout_rate: float = 0.1
    attn_backend: str = "xla"  # 'flash' = fused Pallas attention on TPU
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, freqs, mask=None, deterministic: bool = True):
        b, n, _ = x.shape
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, dtype=self.dtype, name="to_q")(x).reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        k = nn.Dense(inner, dtype=self.dtype, name="to_k")(x).reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        v = nn.Dense(inner, dtype=self.dtype, name="to_v")(x).reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        pn = self.pe_attn_head if self.pe_attn_head is not None else self.heads
        q = jnp.concatenate([apply_rope(q[:, :pn], freqs), q[:, pn:]], axis=1)
        k = jnp.concatenate([apply_rope(k[:, :pn], freqs), k[:, pn:]], axis=1)

        from jatts_tpu.modules.attention import _flash_attend, _flash_ok

        if _flash_ok(self.attn_backend, mask, n, n):
            # fused kernel (no attention-prob dropout exists on the XLA path
            # either, so no semantic delta); rope already applied to q/k
            out = _flash_attend(q, k, v, None, mask, 1.0 / np.sqrt(self.dim_head))
        else:
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
                jnp.asarray(self.dim_head, q.dtype)
            )
            if mask is not None:
                scores = jnp.where(mask[:, None, None, :], scores, _MASK_VAL)
            attn = nn.softmax(scores, axis=-1)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)
        out = nn.Dropout(self.dropout_rate)(out, deterministic=deterministic)
        if mask is not None:
            out = out * mask[..., None].astype(out.dtype)
        return out


class E2FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Dense(self.dim * self.mult, dtype=self.dtype, name="proj_in")(x)
        h = nn.gelu(h, approximate=True)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj_out")(h)


class UNetT(nn.Module):
    text_num_embeds: int
    mel_dim: int = 80
    dim: int = 1024
    depth: int = 24
    heads: int = 16
    dim_head: int = 64
    dropout_rate: float = 0.1
    ff_mult: int = 4
    text_mask_padding: bool = False
    pe_attn_head: Optional[int] = 1
    skip_connect_type: str = "concat"
    # 'flash' = fused Pallas attention on TPU: pads [time | mel] to the
    # kernel's 128-wide blocks (masked + sliced back)
    attn_backend: str = "xla"
    # compute dtype (params stay f32; RMSNorm accumulates f32; final
    # projection emits f32 for flow-matching loss stability)
    dtype: Any = jnp.float32
    # rematerialize each attention/FF block in the backward pass — trades
    # ~1/3 recompute FLOPs for O(depth) activation memory; required for the
    # full 8640-frame recipe budget at depth 24 on a 16 GB chip
    use_remat: bool = False
    # jax.checkpoint_policies name for SELECTIVE remat (e.g. 'dots_saveable'
    # keeps matmul outputs, recomputes only elementwise); None = full remat
    remat_policy: str | None = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,          # [B, N, mel] noised input
        cond: jnp.ndarray,       # [B, N, mel] masked cond audio
        text: jnp.ndarray,       # [B, N_t] token ids, -1 = pad
        time: jnp.ndarray,       # [B]
        drop_audio_cond: jnp.ndarray,  # [B] bool — per-sample CFG flags
        drop_text: jnp.ndarray,        # [B] bool
        mask: Optional[jnp.ndarray] = None,  # [B, N] bool
        deterministic: bool = True,
        text_embed: Optional[jnp.ndarray] = None,  # [B, N, mel] precomputed
        return_text_embed: bool = False,
    ) -> jnp.ndarray:
        """``text_embed``/``return_text_embed`` implement the reference's
        inference-time text-embedding cache (unett.py:223-233 ``cache=True``:
        text_cond/text_uncond computed once, reused every ODE step) the
        functional way: call once with ``return_text_embed=True`` per CFG
        branch outside the ODE scan, then pass the result back in as a
        scan-invariant — nothing mutable, nothing retraced."""
        b, n, _ = x.shape
        text_dim = self.mel_dim

        if not return_text_embed:
            t = TimestepEmbedding(
                self.dim, dtype=self.dtype, name="time_embed"
            )(time)

        # ---- text embedding (reference TextEmbedding, unett.py:45-92) ----
        if text_embed is None:
            text_ids = text + 1  # 0 is the filler token (pad was -1)
            nt = text_ids.shape[1]
            if nt < n:
                text_ids = jnp.pad(text_ids, ((0, 0), (0, n - nt)))
            else:
                text_ids = text_ids[:, :n]
            text_ids = jnp.where(drop_text[:, None], 0, text_ids)
            text_embed = nn.Embed(
                self.text_num_embeds + 1, text_dim, dtype=self.dtype,
                name="text_embed",
            )(text_ids.astype(jnp.int32))
            if self.text_mask_padding:
                text_embed = jnp.where(
                    (text_ids == 0)[..., None], 0.0, text_embed
                )
        if return_text_embed:
            return text_embed

        # ---- input embedding ----
        cond = jnp.where(drop_audio_cond[:, None, None], 0.0, cond)
        h = nn.Dense(self.dim, dtype=self.dtype, name="input_proj")(
            jnp.concatenate(
                [x.astype(self.dtype), cond.astype(self.dtype), text_embed],
                axis=-1,
            )
        )
        # reference InputEmbedding runs ConvPositionEmbedding WITHOUT the
        # mask (unett.py:109) — padded frames hold noise, and the conv sees
        # them near utterance boundaries; keep identical for import parity
        h = ConvPositionEmbedding(
            self.dim, dtype=self.dtype, name="conv_pos_embed"
        )(h, None) + h

        # prepend the time token
        h = jnp.concatenate([t[:, None, :], h], axis=1)  # [B, N+1, dim]
        if mask is not None:
            mask = jnp.concatenate(
                [jnp.ones((b, 1), mask.dtype), mask], axis=1
            )

        s_orig = h.shape[1]
        from jatts_tpu.modules.attention import flash_pad_needed

        if flash_pad_needed(self.attn_backend, s_orig):
            s_pad = -s_orig % 128
            if s_pad:
                # pad rows MUST be masked out as keys, so materialize a mask
                if mask is None:
                    mask = jnp.ones((b, s_orig), bool)
                h = jnp.pad(h, ((0, 0), (0, s_pad), (0, 0)))
                mask = jnp.pad(mask, ((0, 0), (0, s_pad)))

        freqs = jnp.asarray(rotary_freqs(h.shape[1], self.dim_head), jnp.float32)

        skips = []
        for idx in range(self.depth):
            layer = idx + 1
            is_first_half = layer <= self.depth // 2
            if is_first_half:
                skips.append(h)
            else:
                skip = skips.pop()
                if self.skip_connect_type == "concat":
                    h = nn.Dense(
                        self.dim, use_bias=False, dtype=self.dtype,
                        name=f"skip_proj_{idx}",
                    )(jnp.concatenate([h, skip], axis=-1))
                elif self.skip_connect_type == "add":
                    h = h + skip
            attn = E2Attention(
                self.dim, self.heads, self.dim_head, self.pe_attn_head,
                self.dropout_rate, attn_backend=self.attn_backend,
                dtype=self.dtype, name=f"attn_{idx}",
            )
            ff = E2FeedForward(
                self.dim, self.ff_mult, self.dropout_rate, dtype=self.dtype,
                name=f"ff_{idx}",
            )
            attn_fn, ff_fn = E2Attention.__call__, E2FeedForward.__call__
            if self.use_remat:
                remat_kw = {}
                if self.remat_policy:
                    import jax

                    remat_kw["policy"] = getattr(
                        jax.checkpoint_policies, self.remat_policy
                    )
                attn_fn = nn.remat(attn_fn, static_argnums=(4,), **remat_kw)
                ff_fn = nn.remat(ff_fn, static_argnums=(2,), **remat_kw)
            h = attn_fn(
                attn, RMSNorm(name=f"attn_norm_{idx}")(h), freqs, mask,
                deterministic,
            ) + h
            h = ff_fn(ff, RMSNorm(name=f"ff_norm_{idx}")(h), deterministic) + h

        h = RMSNorm(name="norm_out")(h)[:, 1:s_orig, :]
        # f32 output regardless of compute dtype (flow-matching MSE stability)
        return nn.Dense(self.mel_dim, dtype=jnp.float32, name="proj_out")(
            h.astype(jnp.float32)
        )
