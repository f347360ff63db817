"""Pallas TPU kernel for Monotonic Alignment Search.

The scan-based `ops.mas` keeps the whole batch on device but issues T_feats
sequential [B, T_text] vector steps through XLA's while-loop machinery. This
kernel runs the entire DP for one batch element inside ONE Pallas program:
the lattice stays resident in VMEM and the forward recurrence is a fori_loop
of full-lane row ops (token axis on the 128-lane dimension, frame axis on
sublanes, so all dynamic indexing is in the sublane dimension — a Mosaic
requirement), with the Viterbi backtrace run in-kernel writing to SMEM.

Status (v5e, B=16 x T_feats=1024 x T_text=128): verified bit-exact against
the scan version on hardware; ~5.5 ms vs ~4.2 ms for the scan (the per-sample
grid serializes batch elements — a batched-sublane variant hits current
Mosaic layout-cast limits, so the scan path remains the default in models).

Grid: one program per batch element. Tests run it with interpret=True.
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

    tl_ref/fl_ref: SMEM scalar-prefetch (text_len, feats_len per batch).
    lp_ref: [T_feats, T_text] log probs (invalid tokens pre-masked to -1e9).
    q_ref:  [T_feats, T_text] DP lattice (VMEM).
    path_ref: [1, T_feats] int32 path (SMEM — scalar stores).
    """
    b = pl.program_id(0)
    t_feats, t_text = lp_ref.shape
    text_len = tl_ref[b]
    feats_len = fl_ref[b]

    tok_ids = jax.lax.broadcasted_iota(jnp.int32, (1, t_text), 1)
    valid_tok = tok_ids < text_len

    # ---- forward DP over frames (sublane axis) ----
    q_ref[0:1, :] = jnp.where(tok_ids == 0, lp_ref[0:1, :], _NEG)

    def fwd(j, _):
        q_prev = q_ref[pl.ds(j - 1, 1), :]  # [1, T_text]
        shifted = pltpu.roll(q_prev, 1, 1)  # q_prev[i-1] along lanes
        shifted = jnp.where(tok_ids == 0, _NEG, shifted)
        q_j = jnp.maximum(shifted, q_prev) + lp_ref[pl.ds(j, 1), :]
        q_j = jnp.maximum(q_j, _NEG)
        q_ref[pl.ds(j, 1), :] = jnp.where(valid_tok, q_j, _NEG)
        return 0

    jax.lax.fori_loop(1, t_feats, fwd, 0)

    # ---- backtrace (reverse over frames) ----
    last_tok = text_len - 1
    path_ref[0, t_feats - 1] = last_tok

    def bwd(k, a_next):
        j = t_feats - 2 - k
        i_b = a_next
        i_a = jnp.maximum(i_b - 1, 0)
        q_row = q_ref[pl.ds(j, 1), :]  # [1, T_text]
        q_ia = jnp.sum(jnp.where(tok_ids == i_a, q_row, 0.0))
        q_ib = jnp.sum(jnp.where(tok_ids == i_b, q_row, 0.0))
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
    lp = log_p_attn.astype(jnp.float32)  # [B, T_feats, T_text]
    tok_valid = jnp.arange(t_text)[None, None, :] < text_lengths[:, None, None]
    lp = jnp.where(tok_valid, lp, _NEG)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t_feats, t_text), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, t_feats, t_text), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # scalar element stores are only legal in SMEM on Mosaic
            pl.BlockSpec((1, 1, t_feats), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
    )

    def kernel(tl_ref, fl_ref, lp_blk, q_blk, path_blk):
        _mas_kernel(tl_ref, fl_ref, lp_blk.at[0], q_blk.at[0], path_blk.at[0])

    _, path = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, t_feats, t_text), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, t_feats), jnp.int32),
        ],
        interpret=interpret,
    )(text_lengths.astype(jnp.int32), feats_lengths.astype(jnp.int32), lp)
    path = path[:, 0, :]
    # clamp padded frames like the reference wrapper
    frame_valid = jnp.arange(t_feats)[None, :] < feats_lengths[:, None]
    return jnp.where(frame_valid, path, (text_lengths - 1)[:, None]).astype(jnp.int32)
