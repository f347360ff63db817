"""Pallas TPU kernel for Monotonic Alignment Search.

The scan-based `ops.mas` keeps the whole batch on device but issues T_feats
sequential [B, T_text] vector steps through XLA's while-loop machinery. This
kernel runs the entire DP for one batch element inside ONE Pallas program:
the lattice stays resident in VMEM, the forward recurrence is a fori_loop of
8x128-lane VPU ops (shifted max + add), and the Viterbi backtrace runs
in-kernel — no HBM round trips between frames.

Grid: one program per batch element. Falls back to `ops.mas.mas_path` when
Pallas/TPU is unavailable (tests run it with interpret=True).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9


def _mas_kernel(tl_ref, fl_ref, lp_ref, q_ref, path_ref):
    """Per-batch-element MAS.

    tl_ref/fl_ref: SMEM scalars (text_len, feats_len) via scalar prefetch.
    lp_ref: [T_text, T_feats] log probs (already masked on invalid tokens).
    q_ref:  [T_text, T_feats] DP lattice scratch/output.
    path_ref: [1, T_feats] int32 output path.
    """
    b = pl.program_id(0)
    t_text = lp_ref.shape[0]
    t_feats = lp_ref.shape[1]
    text_len = tl_ref[b]
    feats_len = fl_ref[b]

    tok_ids = jax.lax.broadcasted_iota(jnp.int32, (t_text, 1), 0)
    valid_tok = tok_ids < text_len

    # ---- forward DP over frames ----
    q0 = jnp.where(tok_ids == 0, lp_ref[:, 0:1], _NEG)
    q_ref[:, 0:1] = q0

    def fwd(j, _):
        q_prev = q_ref[:, pl.ds(j - 1, 1)]  # [T_text, 1]
        # shift down by one token: q_prev[i-1]
        shifted = pltpu.roll(q_prev, 1, 0)
        shifted = jnp.where(tok_ids == 0, _NEG, shifted)
        q_j = jnp.maximum(shifted, q_prev) + lp_ref[:, pl.ds(j, 1)]
        q_j = jnp.maximum(q_j, _NEG)
        q_ref[:, pl.ds(j, 1)] = jnp.where(valid_tok, q_j, _NEG)
        return 0

    jax.lax.fori_loop(1, t_feats, fwd, 0)

    # ---- backtrace (reverse over frames) ----
    last_tok = text_len - 1
    path_ref[0, t_feats - 1] = last_tok

    def bwd(k, a_next):
        j = t_feats - 2 - k
        i_b = a_next
        i_a = jnp.maximum(i_b - 1, 0)
        q_col = q_ref[:, pl.ds(j, 1)]  # [T_text, 1]
        q_ia = jnp.sum(jnp.where(tok_ids == i_a, q_col, 0.0))
        q_ib = jnp.sum(jnp.where(tok_ids == i_b, q_col, 0.0))
        a_j = jnp.where(i_b == 0, 0, jnp.where(q_ia >= q_ib, i_a, i_b))
        # pin frames at/after the last valid frame to the last token so the
        # recurrence restarts at j = feats_len - 2 (padded-frame handling)
        a_j = jnp.where(j >= feats_len - 1, last_tok, a_j)
        path_ref[0, j] = a_j
        return a_j

    jax.lax.fori_loop(0, t_feats - 1, bwd, last_tok)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mas_path_pallas(
    log_p_attn: jnp.ndarray,
    text_lengths: jnp.ndarray,
    feats_lengths: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for ops.mas.mas_path via the Pallas kernel."""
    b, t_feats, t_text = log_p_attn.shape
    lp = jnp.swapaxes(log_p_attn.astype(jnp.float32), 1, 2)  # [B, T_text, T_feats]
    tok_valid = jnp.arange(t_text)[None, :] < text_lengths[:, None]
    lp = jnp.where(tok_valid[:, :, None], lp, _NEG)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t_text, t_feats), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, t_text, t_feats), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_feats), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )

    def kernel(tl_ref, fl_ref, lp_blk, q_blk, path_blk):
        _mas_kernel(
            tl_ref, fl_ref, lp_blk.at[0], q_blk.at[0], path_blk.at[0]
        )

    _, path = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, t_text, t_feats), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, t_feats), jnp.int32),
        ],
        interpret=interpret,
    )(text_lengths.astype(jnp.int32), feats_lengths.astype(jnp.int32), lp)
    path = path[:, 0, :]
    # clamp padded frames like the reference wrapper
    frame_valid = jnp.arange(t_feats)[None, :] < feats_lengths[:, None]
    return jnp.where(frame_valid, path, (text_lengths - 1)[:, None]).astype(jnp.int32)
