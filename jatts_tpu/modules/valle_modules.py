"""VALL-E transformer building blocks (reference jatts/modules/valle/modules.py).

TPU re-design: variable-length "list of tensors" batches become packed padded
arrays (see ops in models/valle.py), and Attention exposes a KV-cached
single-step decode path — the reference's AR loop re-runs the full
transformer over the whole sequence per generated token
(jatts/models/valle_ar.py:77-101); here the prefix is processed once and each
step attends to a cache.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

_MASK_VAL = -1e9


class SinusoidalEmbedding(nn.Module):
    """reference valle/modules.py:42-93 (add_pe)."""

    d_model: int

    def table(self, positions: jnp.ndarray) -> jnp.ndarray:
        # positions: [...,] float/int -> [..., d_model]
        d = self.d_model
        half = d // 2
        omega = jnp.exp(
            -jnp.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
        )
        ang = positions.astype(jnp.float32)[..., None] * omega
        # reference concatenates halves: [sin(ang) | cos(ang)]
        # (valle/modules.py:71, torch.cat([x.sin(), x.cos()], dim=-1))
        return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pos = jnp.arange(x.shape[1])
        return x + self.table(pos)[None].astype(x.dtype)


class AdaLN(nn.Module):
    """Level-conditioned AdaNorm-style LN, zero-init
    (reference valle/modules.py:140-162)."""

    d_model: int
    n_levels: int
    eps: float = 1e-5
    k: float = 0.1
    c: float = 2.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, level):
        emb = nn.Embed(
            self.n_levels, self.d_model * 2, dtype=self.dtype,
            embedding_init=nn.initializers.zeros, name="emb",
        )(level)  # [B, 2d]
        log_gamma, beta = jnp.split(emb[:, None, :], 2, axis=-1)
        h = nn.LayerNorm(
            epsilon=self.eps, use_bias=False, use_scale=False, dtype=self.dtype
        )(x)
        h = self.c * (1.0 - jax.lax.stop_gradient(self.k * h)) * h
        return jnp.exp(log_gamma) * h + beta


class VALLEAttention(nn.Module):
    """Fused-QKV MHA with causal option and KV-cached decode
    (reference valle/modules.py:96-137)."""

    d_model: int
    n_heads: int
    causal: bool
    attn_backend: str = "xla"  # 'flash' = fused Pallas attention on TPU
    dtype: Any = jnp.float32

    def setup(self):
        self.to_qkv = nn.Dense(
            self.d_model * 3, use_bias=False, dtype=self.dtype, name="to_qkv"
        )
        self.to_out = nn.Dense(self.d_model, dtype=self.dtype, name="to_out")

    def _split(self, x):
        b, t, _ = x.shape
        return x.reshape(b, t, self.n_heads, self.d_model // self.n_heads)

    def __call__(self, x, m):
        """x: [B, T, D]; m: [B, T, 1] validity."""
        from jatts_tpu.modules.attention import _flash_attend, _flash_ok

        q, k, v = jnp.split(self.to_qkv(x), 3, axis=-1)
        q, k, v = self._split(q), self._split(k), self._split(v)
        scale = (self.d_model // self.n_heads) ** -0.5
        t = x.shape[1]
        valid = m[:, :, 0] > 0  # [B, T]
        if _flash_ok(self.attn_backend, valid, t, t):
            # fused kernel: the [B,H,S,S] score/prob tensors (the dominant
            # HBM cost at S~1.5k) never materialize; causal handled in-kernel
            o = _flash_attend(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), None, valid, scale,
                causal=self.causal,
            ).transpose(0, 2, 1, 3)
        else:
            e = jnp.einsum("bihd,bjhd->bhij", q, k) * scale
            kpm = (m[:, :, 0][:, None, :, None] * m[:, :, 0][:, None, None, :]) > 0
            if self.causal:
                kpm = kpm & jnp.tril(jnp.ones((t, t), bool))[None, None]
            e = jnp.where(kpm, e, _MASK_VAL)
            a = nn.softmax(e, axis=-1)
            o = jnp.einsum("bhij,bjhd->bihd", a, v)
        o = o.reshape(x.shape)
        return self.to_out(o) * m

    def prefill(self, x, m):
        """__call__'s XLA branch that ALSO returns the [B, T, H, Dh] k/v —
        AR cache priming would otherwise re-run to_qkv a second time inside
        __call__ (one wasted [B,S,D]x[D,3D] matmul per layer per decode)."""
        q, k, v = jnp.split(self.to_qkv(x), 3, axis=-1)
        q, k, v = self._split(q), self._split(k), self._split(v)
        scale = (self.d_model // self.n_heads) ** -0.5
        t = x.shape[1]
        e = jnp.einsum("bihd,bjhd->bhij", q, k) * scale
        kpm = (m[:, :, 0][:, None, :, None] * m[:, :, 0][:, None, None, :]) > 0
        if self.causal:
            kpm = kpm & jnp.tril(jnp.ones((t, t), bool))[None, None]
        e = jnp.where(kpm, e, _MASK_VAL)
        a = nn.softmax(e, axis=-1)
        o = jnp.einsum("bhij,bjhd->bihd", a, v)
        return self.to_out(o.reshape(x.shape)) * m, k, v

    def decode_step(self, x_t, pk, pv, done, dk, dv, slot, pvalid, dvalid):
        """Single-token causal step over SPLIT, CHUNKED caches.

        x_t: [B, 1, D]; pk/pv: [B, Sp, H, Dh] — the prefix K/V, computed
        once by prefill and NEVER written again (a scan invariant, so it is
        never copied); done: tuple of (k, v) pairs — COMPLETED decode
        chunks, every slot written, also scan invariants; dk/dv:
        [B, Sd, H, Dh] — the CURRENT decode chunk (the scan carry); slot:
        scalar int — the UNIFORM slot in the current chunk this step's K/V
        is written to (same for every row); pvalid [B, Sp] / dvalid
        [B, Sd]: which slots of prefix / current chunk this step's query
        may attend to (completed chunks are fully attendable). Returns
        (out [B, 1, D], new_dk, new_dv).

        Three deliberate layout choices, all measured on v5e-1 (B=32,
        12L/1024d, S=547, benchmarks/bench_ar_cache_layout.py):
        - the write slot is batch-uniform: a per-row position (rows have
          different prefix lengths) lowers to a scatter, which XLA does NOT
          alias in-place inside a scan carry — every step then pays ~two
          full cache copies (4.69 -> 3.12 ms/step on the cache+attention
          path);
        - the caches are split and the softmax merges the regions'
          SCORES (a tiny [B,H,1,S] concat) instead of concatenating the
          caches themselves: XLA copies the carry once per step even for
          the aliasable uniform update, so keeping the immutable prefix
          OUT of the carry shrinks that copy to the decode region
          (3.12 -> 2.45 ms/step);
        - the decode region itself is chunked (ar_generate unrolls an
          outer loop over chunks; finished chunks leave the carry and
          become invariants), shrinking the per-step carry copy to one
          chunk and skipping reads of unmaterialized slots
          (2.45 -> 1.71 ms/step; pure attention reads bound at 1.41).
        """
        q, k, v = jnp.split(self.to_qkv(x_t), 3, axis=-1)
        q = self._split(q)  # [B, 1, H, Dh]
        k = self._split(k)  # [B, 1, H, Dh]
        v = self._split(v)
        dh = q.shape[-1]
        dk = jax.lax.dynamic_update_slice(dk, k, (0, slot, 0, 0))
        dv = jax.lax.dynamic_update_slice(dv, v, (0, slot, 0, 0))
        scale = dh**-0.5
        ep = jnp.einsum("bqhd,bjhd->bhqj", q, pk) * scale  # q==1
        es = [jnp.where(pvalid[:, None, None, :], ep, _MASK_VAL)]
        vs = [pv]
        for fk, fv in done:  # completed chunks: every slot valid
            es.append(jnp.einsum("bqhd,bjhd->bhqj", q, fk) * scale)
            vs.append(fv)
        ed = jnp.einsum("bqhd,bjhd->bhqj", q, dk) * scale
        es.append(jnp.where(dvalid[:, None, None, :], ed, _MASK_VAL))
        vs.append(dv)
        a = nn.softmax(jnp.concatenate(es, axis=-1), axis=-1)
        o = jnp.zeros_like(q)
        off = 0
        for blk_v in vs:
            w = blk_v.shape[1]
            o = o + jnp.einsum("bhqj,bjhd->bqhd", a[..., off:off + w], blk_v)
            off += w
        return self.to_out(o.reshape(x_t.shape)), dk, dv


class VALLEBlock(nn.Module):
    """Pre-norm attention + FFN block (reference valle/modules.py:165-239)."""

    d_model: int
    n_heads: int
    p_dropout: float
    causal: bool
    norm_type: str  # "ln" | "adaln"
    n_levels: Optional[int] = None
    attn_backend: str = "xla"
    dtype: Any = jnp.float32

    def setup(self):
        self.attn = VALLEAttention(
            self.d_model, self.n_heads, self.causal,
            attn_backend=self.attn_backend, dtype=self.dtype, name="attn",
        )
        if self.norm_type == "adaln":
            self.norm_attn = AdaLN(
                self.d_model, self.n_levels, dtype=self.dtype, name="norm_attn"
            )
            self.norm_ffn = AdaLN(
                self.d_model, self.n_levels, dtype=self.dtype, name="norm_ffn"
            )
        else:
            # dtype: keep the LN output in compute dtype (stats still f32
            # internally) — an unset dtype promotes bf16 x with the f32
            # scale/bias into f32 [B,S,D] HBM writes twice per block
            self.norm_attn = nn.LayerNorm(
                epsilon=1e-5, dtype=self.dtype, name="norm_attn"
            )
            self.norm_ffn = nn.LayerNorm(
                epsilon=1e-5, dtype=self.dtype, name="norm_ffn"
            )
        self.ffn_in = nn.Dense(self.d_model * 4, dtype=self.dtype, name="ffn_in")
        self.ffn_out = nn.Dense(self.d_model, dtype=self.dtype, name="ffn_out")
        self.drop = nn.Dropout(self.p_dropout)

    def _norm(self, norm, x, level):
        return norm(x, level) if self.norm_type == "adaln" else norm(x)

    def _ffn(self, x, deterministic):
        h = nn.gelu(self.ffn_in(x), approximate=False)
        h = self.drop(h, deterministic=deterministic)
        return self.ffn_out(h)

    def __call__(self, x, m, level=None, deterministic: bool = True):
        h = self.attn(self._norm(self.norm_attn, x, level) * m, m)
        x = (x + self.drop(h, deterministic=deterministic)) * m
        h = self._ffn(self._norm(self.norm_ffn, x, level) * m, deterministic)
        x = (x + self.drop(h, deterministic=deterministic)) * m
        return x

    def prefill(self, x, m):
        """Deterministic __call__ that also returns this block's K/V
        ([B, T, H, Dh]) for AR cache priming."""
        h, k, v = self.attn.prefill(self._norm(self.norm_attn, x, None) * m, m)
        x = (x + h) * m
        h = self._ffn(self._norm(self.norm_ffn, x, None) * m, True)
        x = (x + h) * m
        return x, k, v

    def decode_step(self, x_t, pk, pv, done, dk, dv, slot, pvalid, dvalid):
        h = self._norm(self.norm_attn, x_t, None)
        h, dk, dv = self.attn.decode_step(
            h, pk, pv, done, dk, dv, slot, pvalid, dvalid
        )
        x_t = x_t + h
        x_t = x_t + self._ffn(self._norm(self.norm_ffn, x_t, None), True)
        return x_t, dk, dv
