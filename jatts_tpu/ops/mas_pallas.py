"""Pallas TPU kernels for Monotonic Alignment Search (batched).

Fills the role of the reference's numba CPU kernel
(jatts/modules/alignments.py:63-310) — but where the reference round-trips
GPU->CPU->numba per utterance, this runs the whole batch's DP on-chip.

Design (v2 — the round-1 kernel ran one program per batch element, which
serialized the batch and lost to the XLA scan):

* Batch rides the SUBLANE axis: every sequential DP step processes all B
  lattices as one [B, T_text] vector op (B=16, T_text=128 -> two full
  8x128 vregs per step) instead of a single [1, T_text] row.
* The forward pass streams the [T_feats, B, T_text] log-prob lattice
  through VMEM in frame blocks (grid over blocks, q-row carried in a VMEM
  scratch that persists across the sequential grid) and emits only the
  DECISION bits d[j, i] = (Q[j-1, i-1] >= Q[j-1, i]) — the full Q lattice
  never needs to be resident (VMEM could not hold it at production sizes).
* The backtrace is a second kernel running the grid in REVERSE, carrying
  the current token index a[B] and emitting the path as a one-hot
  [B, T_text] row per frame (vector stores only — Mosaic allows scalar
  stores just in SMEM; the one-hot avoids per-step transposes). A lane
  argmax outside recovers the indices.
* All refs are 2-D ([F_BLK*B, T_text] blocks): dynamic offsets stay on the
  sublane dimension, which is the Mosaic requirement that sank the round-1
  batched attempt (leading-dim dynamic slicing of 3-D refs).

Tie-breaking matches ops.mas.mas_path exactly (>= prefers the diagonal
move), including the padded-frame pinning semantics.

Tests run with interpret=True; bench_mas_pallas.py measures on hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9


def _fwd_kernel(lp_ref, d_ref, q_scr, *, f_blk: int, b: int):
    """Forward DP over one frame block.

    lp_ref: [F_BLK*B, T_text] log probs (frames-major), pre-masked.
    d_ref:  [F_BLK*B, T_text] f32 out — decision bits (1.0 = diagonal move).
    q_scr:  [B, T_text] VMEM scratch — Q row carried across grid steps.
    """
    t_text = lp_ref.shape[-1]
    pid = pl.program_id(0)
    tok_ids = jax.lax.broadcasted_iota(jnp.int32, (b, t_text), 1)

    @pl.when(pid == 0)
    def _init():
        # frame 0: only token 0 is reachable
        q_scr[...] = jnp.where(tok_ids == 0, lp_ref[0:b, :], _NEG)
        d_ref[0:b, :] = jnp.zeros((b, t_text), jnp.float32)

    def body(jj, q_prev):
        row = lp_ref[pl.ds(jj * b, b), :]
        shifted = pltpu.roll(q_prev, 1, 1)  # Q[j-1, i-1] along lanes
        shifted = jnp.where(tok_ids == 0, _NEG, shifted)
        diag = shifted >= q_prev
        q = jnp.maximum(shifted, q_prev) + row
        d_ref[pl.ds(jj * b, b), :] = diag.astype(jnp.float32)
        return q

    start = jnp.where(pid == 0, 1, 0)
    q_final = jax.lax.fori_loop(start, f_blk, body, q_scr[...])
    q_scr[...] = q_final


def _bwd_kernel(dn_ref, tl_ref, fl_ref, oh_ref, a_scr, *, f_blk: int, b: int,
                t_feats: int):
    """Backtrace over one frame block, grid iterating blocks in REVERSE.

    dn_ref: [F_BLK*B, T_text] dnext[j] = d[j+1] (frame-shifted decisions).
    tl_ref/fl_ref: [B, 1] int32 text/feats lengths (VMEM vectors).
    oh_ref: [F_BLK*B, T_text] f32 out — one-hot of the chosen token.
    a_scr:  [B, 1] int32 VMEM scratch — a[j+1] carried across grid steps.
    """
    t_text = dn_ref.shape[-1]
    pid = pl.program_id(0)
    n_blk = pl.num_programs(0)
    g0 = (n_blk - 1 - pid) * f_blk
    tok_ids = jax.lax.broadcasted_iota(jnp.int32, (b, t_text), 1)
    last_tok = tl_ref[...] - 1  # [B, 1]
    pin_from = fl_ref[...] - 1  # frames >= feats_len-1 pin to last_tok

    def body(k, a_next):
        jj = f_blk - 1 - k
        g = g0 + jj
        row = dn_ref[pl.ds(jj * b, b), :]
        sel = jnp.sum(
            jnp.where(tok_ids == a_next, row, 0.0), axis=-1, keepdims=True
        ).astype(jnp.int32)
        a = jnp.maximum(a_next - sel, 0)
        a = jnp.where(g == t_feats - 1, last_tok, a)
        a = jnp.where(g >= pin_from, last_tok, a)
        oh_ref[pl.ds(jj * b, b), :] = (tok_ids == a).astype(jnp.float32)
        return a

    a0 = jnp.where(pid == 0, last_tok, a_scr[...])
    a_final = jax.lax.fori_loop(0, f_blk, body, a0)
    a_scr[...] = a_final


def _pick_f_blk(t_feats: int, b: int, t_text: int) -> int:
    """Largest frame block keeping a block <= ~1 MiB of VMEM."""
    budget = (1 << 20) // (b * t_text * 4)
    f_blk = max(1, min(t_feats, budget))
    while t_feats % f_blk:
        f_blk -= 1
    return f_blk


@functools.partial(jax.jit, static_argnames=("interpret",))
def mas_path_pallas(
    log_p_attn: jnp.ndarray,
    text_lengths: jnp.ndarray,
    feats_lengths: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for ops.mas.mas_path via the Pallas kernels."""
    b, t_feats, t_text = log_p_attn.shape
    lp = log_p_attn.astype(jnp.float32)
    tok_valid = jnp.arange(t_text)[None, None, :] < text_lengths[:, None, None]
    lp = jnp.where(tok_valid, lp, _NEG)
    # frames-major, flattened 2-D so all kernel refs slice on sublanes
    lp2 = jnp.swapaxes(lp, 0, 1).reshape(t_feats * b, t_text)

    f_blk = _pick_f_blk(t_feats, b, t_text)
    n_blk = t_feats // f_blk
    seq = pltpu.CompilerParams(dimension_semantics=("arbitrary",))

    d2 = pl.pallas_call(
        functools.partial(_fwd_kernel, f_blk=f_blk, b=b),
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec((f_blk * b, t_text), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((f_blk * b, t_text), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_feats * b, t_text), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, t_text), jnp.float32)],
        compiler_params=seq,
        interpret=interpret,
    )(lp2)

    # dnext[j] = d[j+1]: shift one frame so the backtrace block never needs
    # its neighbor's rows (pad the last frame with zeros = "stay" moves)
    d3 = d2.reshape(t_feats, b, t_text)
    dnext = jnp.concatenate(
        [d3[1:], jnp.zeros((1, b, t_text), jnp.float32)], axis=0
    ).reshape(t_feats * b, t_text)

    onehot = pl.pallas_call(
        functools.partial(_bwd_kernel, f_blk=f_blk, b=b, t_feats=t_feats),
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec((f_blk * b, t_text), lambda i: (n_blk - 1 - i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((f_blk * b, t_text), lambda i: (n_blk - 1 - i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_feats * b, t_text), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, 1), jnp.int32)],
        compiler_params=seq,
        interpret=interpret,
    )(
        dnext,
        text_lengths.astype(jnp.int32)[:, None],
        feats_lengths.astype(jnp.int32)[:, None],
    )

    path = jnp.argmax(
        onehot.reshape(t_feats, b, t_text), axis=-1
    ).T.astype(jnp.int32)  # [B, T_feats]
    frame_valid = jnp.arange(t_feats)[None, :] < feats_lengths[:, None]
    return jnp.where(frame_valid, path, (text_lengths - 1)[:, None]).astype(jnp.int32)
