"""Multi-head attention with (relative) positional encoding.

Behavior-compatible with the reference's ESPnet-style attention
(jatts/modules/transformer/attention.py:15-305) but TPU-native:
the Transformer-XL ``rel_shift`` pad/reshape trick is replaced by a direct
gather with a static index map (same result, XLA-friendly), and all masking
is additive with finite negatives (no NaN-prone -inf arithmetic).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

_MASK_VAL = -1e9


def _split_heads(x: jnp.ndarray, h: int) -> jnp.ndarray:
    b, t, d = x.shape
    return x.reshape(b, t, h, d // h).transpose(0, 2, 1, 3)  # [B, H, T, d_k]


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, t, dk = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dk)


class MultiHeadedAttention(nn.Module):
    """Vanilla MHA (reference attention.py:15-111)."""

    n_head: int
    n_feat: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attn_backend: str = "xla"  # 'flash' = fused Pallas kernel on TPU

    @nn.compact
    def __call__(self, query, key, value, mask=None, deterministic: bool = True):
        d_k = self.n_feat // self.n_head
        q = _split_heads(nn.Dense(self.n_feat, dtype=self.dtype, name="linear_q")(query), self.n_head)
        k = _split_heads(nn.Dense(self.n_feat, dtype=self.dtype, name="linear_k")(key), self.n_head)
        v = _split_heads(nn.Dense(self.n_feat, dtype=self.dtype, name="linear_v")(value), self.n_head)
        sm_scale = 1.0 / np.sqrt(d_k)
        if _flash_ok(self.attn_backend, mask, q.shape[2], k.shape[2]):
            x = _flash_attend(q, k, v, None, mask, sm_scale)
        else:
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * jnp.asarray(
                sm_scale, q.dtype
            )
            x = _attend(scores, v, mask, self.dropout_rate, deterministic)
        return nn.Dense(self.n_feat, dtype=self.dtype, name="linear_out")(_merge_heads(x))


def _attend(scores, v, mask, dropout_rate, deterministic):
    """Masked softmax + value contraction (reference forward_attention,
    attention.py:69-98): masked keys get zero attention weight."""
    if mask is not None:
        # mask: [B, 1, T_k] or [B, T_q, T_k] -> broadcast over heads
        m = mask[:, None] if mask.ndim == 3 else mask[:, None, None, :]
        scores = jnp.where(m, scores, _MASK_VAL)
        attn = nn.softmax(scores, axis=-1)
        attn = jnp.where(m, attn, 0.0)
    else:
        attn = nn.softmax(scores, axis=-1)
    attn = nn.Dropout(rate=dropout_rate, name="dropout")(attn, deterministic=deterministic) if dropout_rate > 0 else attn
    return jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v)


# 'auto' backend crossover, re-measured in round 4 with TUNED kernel block
# sizes (benchmarks/bench_flash_tune.py): the round-3 "8 TF/s kernel
# ceiling" was the stock BlockSizes.get_default (128 everywhere) starving
# the MXU; with q/k blocks >=512 the kernel beats XLA in the MICRO from
# S=512 up (f+b TF/s on v5e-1, b4 h16 dh64: 10.9-vs-7.7 @1024,
# 25.7-vs-17.4 @2048, 38-vs-25 @4096; XLA fails to compile at 8192 where
# flash reaches 46). But micro wins at S~1k do NOT survive real training
# steps — measured with everything else identical: VALL-E AR S=896->1024
# 226.4 flash vs 193.5 xla ms/step, E2-TTS S~1k 298.5 vs 263.3 (XLA fuses
# the materialized path into its neighbors; the kernel is an opaque call
# boundary). The threshold sits where the micro margin is decisive enough
# (1.5x @2048) to survive that fusion tax, and where [B,H,S,S]
# materialization starts to be an HBM liability anyway.
FLASH_AUTO_MIN_LEN = 2048


def _flash_block_sizes(t_q: int, t_k: int):
    """Tuned tile sizes for the Pallas flash kernel. The sweep plateaus for
    q/k blocks in {512, 1024} and collapses 4.7x at the stock 128 default;
    pick the largest sweep-validated divisor of each sequence length,
    capped at 512 (1024 was within 5% but crashes the Mosaic compile for
    some shapes — e.g. 896-wide blocks with the d=256 fused rel-pos
    operands; the backward kernels require blocks to DIVIDE the sequence,
    hence `_flash_seq_pad` below)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes

    def best(t):
        for bs in (512, 384, 256, 128):
            if bs <= t and t % bs == 0:
                return bs
        return min(t, 128)

    bq, bk = best(t_q), best(t_k)
    return BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk,
        block_q_dkv=bq, block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
    )


def _flash_seq_pad(t: int) -> int:
    """Extra sequence padding so the kernel gets >=384-wide blocks.

    The backward kernels require block sizes that divide the sequence
    length, so a 128-multiple like 896 would be stuck with 128-wide blocks
    (2-3x slower per the sweep). Padding 896 -> 1024 costs <=33% more
    attention FLOPs but keeps the fat-block kernel — a net win everywhere
    measured. Lengths already divisible by 512 or 384, or short enough to
    be a single block, pad nothing."""
    if t <= 512 or t % 512 == 0 or t % 384 == 0:
        return 0
    return -t % 512


def flash_pad_needed(backend: str, t: int) -> bool:
    """Whether a caller should pad its sequence length to a 128 multiple for
    the fused kernel: always under 'flash'; under 'auto' only beyond the
    XLA-wins region — without this gate 'auto' could never select flash for
    models that pack non-128-multiple sequences (_flash_ok requires
    t % 128 == 0), silently materializing [B,H,S,S] at exactly the long
    lengths 'auto' exists to protect."""
    return backend == "flash" or (backend == "auto" and t > FLASH_AUTO_MIN_LEN)


def _flash_ok(backend: str, mask, t_q: int, t_k: int) -> bool:
    """Trace-time gate for the fused-attention path: TPU-class backend,
    128-divisible sequence lengths (kernel block size), and a per-key
    padding mask (segment ids cannot express arbitrary [B, Tq, Tk] masks).

    backend='auto' picks XLA for S<=2048 (exact reference semantics incl.
    attention-prob dropout, and measured faster in REAL steps at S~1k
    despite micro losses) and the tuned-block flash kernel beyond, where
    the micro margin is decisive (1.5x+ at 2048/4096; XLA cannot even
    compile 8192 — benchmarks/bench_flash_tune.py, round 4)."""
    import jax

    if backend == "auto":
        if t_k <= FLASH_AUTO_MIN_LEN:
            return False
    elif backend != "flash":
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if t_q % 128 or t_k % 128:
        return False
    return mask is None or (mask.ndim == 3 and mask.shape[1] == 1) or mask.ndim == 2


def _flash_attend(q, k, v, ab, mask, sm_scale, causal=False):
    """softmax(q k^T * sm_scale + ab) v via the Pallas TPU flash-attention
    kernel (training-capable custom VJP incl. d(ab)) — the [B,H,Tq,Tk]
    attention probabilities are never materialized in HBM. Attention-prob
    dropout is NOT applied on this path (flash kernels don't support it);
    opt in via attn_backend='flash' accepts that delta vs the reference.

    q/k: [B, H, T, d_qk]; v: [B, H, T, d_v] (d_v may be narrower than d_qk —
    the rel-pos fused path concatenates positional features onto q/k only);
    ab: [B, H, Tq, Tk] additive bias (pre-scaled) or None; mask:
    [B, 1, Tk] / [B, Tk] True-on-valid or None.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention,
    )

    d_qk = q.shape[-1]
    d_v = v.shape[-1]
    # the kernel handles head_dim < 128 natively (it slices the lane dim:
    # pallas ops flash_attention `if head_dim_repeats == 0`); only head dims
    # ABOVE 128 must be padded to a multiple of 128. Unconditional 64->128
    # padding doubled the attention FLOPs for d_head 64 models.
    d = max(d_qk, d_v)
    width = d if d <= 128 else d + (-d % 128)

    def pad_to(x):
        p = width - x.shape[-1]
        return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, p))) if p else x

    q, k, v = pad_to(q), pad_to(k), pad_to(v)

    # fat-block sequence padding (see _flash_seq_pad): awkward 128-multiple
    # lengths get extended so the backward kernels can tile >=384 wide; the
    # pad key rows are masked via segment ids and pad q rows sliced off
    t_q_orig = q.shape[2]
    sp_q, sp_k = _flash_seq_pad(q.shape[2]), _flash_seq_pad(k.shape[2])
    if (sp_q or sp_k) and mask is None:
        mask = jnp.ones((q.shape[0], k.shape[2]), bool)
    if sp_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sp_q), (0, 0)))
    if sp_k:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, sp_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, sp_k), (0, 0)))
    if ab is not None and (sp_q or sp_k):
        ab = jnp.pad(ab, ((0, 0), (0, 0), (0, sp_q), (0, sp_k)))

    seg = None
    if mask is not None:
        ids = (mask[:, 0] if mask.ndim == 3 else mask).astype(jnp.int32)
        if sp_k:
            # pad rows carry id 0 like pad keys: well-defined softmax rows
            # (pads attend among themselves), q pad rows sliced off below
            ids = jnp.pad(ids, ((0, 0), (0, sp_k)))
        seg = SegmentIds(q=ids, kv=ids)  # self-attention padding mask
    out = flash_attention(
        q, k, v, ab=ab, segment_ids=seg, causal=causal,
        sm_scale=float(sm_scale),
        block_sizes=_flash_block_sizes(q.shape[2], k.shape[2]),
    )
    return out[:, :, :t_q_orig, :d_v]


def relpos_fused_features(q_v, w_pos, t: int, n_feat: int):
    """Exact low-rank decomposition of the (latest) rel-pos bias for fused
    attention: returns ``(u_tilde [B,H,T,n_feat], phi [T,n_feat])`` such that

        einsum('bhqf,kf->bhqk', u_tilde, phi)
          == rel_shift_gather(einsum('bhqd,xhpd->bhqp', q_v, p), T)

    where ``p = split_heads(pos_emb @ w_pos)`` over the signed sinusoid table
    (positions T-1 … -(T-1)). Derivation: bd[i,j] = u(i)·PE(i-j) with
    u(i) = W_posᵀ q_v[i]; the angle-addition identities split
    sin/cos(ω(i-j)) into i-only and j-only factors, so the bias becomes a
    plain dot product of augmented features and the [B,H,T,T] bias tensor is
    never materialized (the flash kernel sees concat'd q/k instead).
    Exactness is pinned by tests/test_attention_fused_relpos.py.

    Does NOT apply to the legacy variant: its rel_shift wraps rows for
    j > i (reference attention.py:141-162 keeps that region), which mixes
    other query rows into bd[i, j>i] and admits no rank-structured form.
    """
    h, dk = q_v.shape[1], q_v.shape[3]
    w = w_pos.reshape(n_feat, h, dk)
    u = jnp.einsum("bhtd,fhd->bhtf", q_v, w)  # [B,H,T,n_feat]
    # static trig tables in float64 (like the PE table in positional.py) —
    # f32 sin/cos of large angles alone costs ~1e-3 in the final output
    om = np.exp(
        np.arange(0, n_feat, 2, dtype=np.float64) * -(np.log(10000.0) / n_feat)
    )  # [F]
    ang = om[None, :] * np.arange(t, dtype=np.float64)[:, None]  # [T,F]
    sin_i = jnp.asarray(np.sin(ang), u.dtype)
    cos_i = jnp.asarray(np.cos(ang), u.dtype)
    u_e, u_o = u[..., 0::2], u[..., 1::2]
    ut = jnp.stack(
        [u_e * sin_i + u_o * cos_i, -u_e * cos_i + u_o * sin_i], axis=-1
    ).reshape(u.shape)
    phi = jnp.asarray(
        np.stack([np.cos(ang), np.sin(ang)], axis=-1).reshape(t, n_feat),
        q_v.dtype,
    )
    return ut.astype(q_v.dtype), phi


def rel_shift_gather(matrix_bd: jnp.ndarray, t_k: int) -> jnp.ndarray:
    """Map ``[B, H, T_q, 2*T_q-1]`` scores over relative positions to
    ``[B, H, T_q, T_k]`` aligned scores.

    ``pos_emb`` index ``p`` encodes relative position ``T_q-1-p``; attention
    needs relative position ``i-j``, i.e. ``p = T_q-1-i+j``. Implemented with
    the pad/reshape trick (the reference's ``rel_shift``,
    attention.py:246-260): pure static-shape pad+reshape+slice, which XLA
    lowers to data movement — a per-element gather here measured ~9x slower
    for the whole FS2 train step on TPU (round 3).
    """
    b, h, t_q, p = matrix_bd.shape  # p == 2*t_q - 1
    x = jnp.concatenate(
        [jnp.zeros((b, h, t_q, 1), matrix_bd.dtype), matrix_bd], axis=-1
    )  # [B,H,T,2T]
    x = x.reshape(b, h, 2 * t_q, t_q)[:, :, 1:].reshape(b, h, t_q, p)
    return x[:, :, :, :t_k]


def legacy_rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """Legacy Transformer-XL shift (reference attention.py:141-162): pad a
    zero column, reshape [T1, T2+1] -> [T2+1, T1], drop the first row. Static
    shapes, so the pad/reshape is free for XLA (no gather needed)."""
    b, h, t1, t2 = x.shape
    zero_pad = jnp.zeros((b, h, t1, 1), x.dtype)
    x_padded = jnp.concatenate([zero_pad, x], axis=-1)
    x_padded = x_padded.reshape(b, h, t2 + 1, t1)
    return x_padded[:, :, 1:].reshape(b, h, t1, t2)


class LegacyRelPositionMultiHeadedAttention(nn.Module):
    """Legacy rel-pos MHA (reference attention.py:114-206). pos_emb has
    length T (reversed positions), not 2T-1. This is the variant every
    published reference config actually runs (``conformer_rel_pos_type``
    defaults to "legacy", models/fastspeech2.py:247-259) — required for
    faithful checkpoint import and training parity."""

    n_head: int
    n_feat: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attn_backend: str = "xla"  # 'flash' = fused Pallas kernel on TPU

    @nn.compact
    def __call__(self, query, key, value, pos_emb, mask=None, deterministic: bool = True):
        d_k = self.n_feat // self.n_head
        q = _split_heads(nn.Dense(self.n_feat, dtype=self.dtype, name="linear_q")(query), self.n_head)
        k = _split_heads(nn.Dense(self.n_feat, dtype=self.dtype, name="linear_k")(key), self.n_head)
        v = _split_heads(nn.Dense(self.n_feat, dtype=self.dtype, name="linear_v")(value), self.n_head)

        # pos_emb: [1, T_q, n_feat], positions reversed (T-1 … 0)
        p = _split_heads(
            nn.Dense(self.n_feat, use_bias=False, dtype=self.dtype, name="linear_pos")(pos_emb),
            self.n_head,
        )  # [1, H, T_q, d_k]

        pos_bias_u = self.param(
            "pos_bias_u", nn.initializers.xavier_uniform(), (self.n_head, d_k)
        ).astype(self.dtype)
        pos_bias_v = self.param(
            "pos_bias_v", nn.initializers.xavier_uniform(), (self.n_head, d_k)
        ).astype(self.dtype)

        q_u = q + pos_bias_u[None, :, None, :]
        q_v = q + pos_bias_v[None, :, None, :]

        matrix_bd = jnp.einsum("bhqd,xhpd->bhqp", q_v, p)  # x==1 broadcast
        matrix_bd = legacy_rel_shift(matrix_bd)
        sm_scale = 1.0 / np.sqrt(d_k)

        if _flash_ok(self.attn_backend, mask, q.shape[2], k.shape[2]):
            # the kernel computes (q k^T + ab) * sm_scale -> pass bd unscaled
            x = _flash_attend(q_u, k, v, matrix_bd.astype(q.dtype), mask, sm_scale)
        else:
            matrix_ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k)
            scores = (matrix_ac + matrix_bd) * jnp.asarray(sm_scale, q.dtype)
            x = _attend(scores, v, mask, self.dropout_rate, deterministic)
        return nn.Dense(self.n_feat, dtype=self.dtype, name="linear_out")(_merge_heads(x))


class RelPositionMultiHeadedAttention(nn.Module):
    """Transformer-XL style rel-pos MHA (reference attention.py:209-305)."""

    n_head: int
    n_feat: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attn_backend: str = "xla"  # 'flash' = fused Pallas kernel on TPU

    @nn.compact
    def __call__(self, query, key, value, pos_emb, mask=None, deterministic: bool = True):
        d_k = self.n_feat // self.n_head
        q = _split_heads(nn.Dense(self.n_feat, dtype=self.dtype, name="linear_q")(query), self.n_head)
        k = _split_heads(nn.Dense(self.n_feat, dtype=self.dtype, name="linear_k")(key), self.n_head)
        v = _split_heads(nn.Dense(self.n_feat, dtype=self.dtype, name="linear_v")(value), self.n_head)
        dense_pos = nn.Dense(
            self.n_feat, use_bias=False, dtype=self.dtype, name="linear_pos"
        )

        pos_bias_u = self.param(
            "pos_bias_u", nn.initializers.xavier_uniform(), (self.n_head, d_k)
        ).astype(self.dtype)
        pos_bias_v = self.param(
            "pos_bias_v", nn.initializers.xavier_uniform(), (self.n_head, d_k)
        ).astype(self.dtype)

        q_u = q + pos_bias_u[None, :, None, :]
        q_v = q + pos_bias_v[None, :, None, :]
        sm_scale = 1.0 / np.sqrt(d_k)

        if _flash_ok(self.attn_backend, mask, q.shape[2], k.shape[2]):
            # FUSED rel-pos: bd decomposes exactly into ũ(i)·φ(j)
            # (relpos_fused_features), so the whole thing is one flash call
            # over concatenated features — no [B,H,T,T] tensor ever exists.
            # Note: bypasses positional dropout on pos_emb (exact in eval;
            # training opt-in accepts that delta, like attn-prob dropout).
            w_pos = dense_pos(jnp.eye(self.n_feat, dtype=self.dtype))
            ut, phi = relpos_fused_features(q_v, w_pos, q.shape[2], self.n_feat)
            q_cat = jnp.concatenate([q_u, ut], axis=-1)
            k_cat = jnp.concatenate(
                [k, jnp.broadcast_to(phi[None, None], (*k.shape[:3], self.n_feat))],
                axis=-1,
            )
            x = _flash_attend(q_cat, k_cat, v, None, mask, sm_scale)
        else:
            # pos_emb: [1, 2*T_q-1, n_feat]
            p = _split_heads(dense_pos(pos_emb), self.n_head)  # [1,H,2T-1,dk]
            matrix_bd = jnp.einsum("bhqd,xhpd->bhqp", q_v, p)  # x==1 broadcast
            matrix_bd = rel_shift_gather(matrix_bd, k.shape[2])
            matrix_ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k)
            scores = (matrix_ac + matrix_bd) * jnp.asarray(sm_scale, q.dtype)
            x = _attend(scores, v, mask, self.dropout_rate, deterministic)
        return nn.Dense(self.n_feat, dtype=self.dtype, name="linear_out")(_merge_heads(x))
