"""Monotonic Alignment Search (MAS), TPU-native.

The reference runs MAS as a per-utterance CPU numba kernel inside every MAS
training step (jatts/modules/alignments.py:63-310): a python loop over the
batch, a GPU->CPU->numba->GPU round trip, and an O(T_text*T_feats) sequential
DP. Here the whole batch runs on-device as one `lax.scan` DP over mel frames
(each step is a vectorized [B, T_text] max+add), followed by a reverse scan
for the Viterbi backtrace. No host sync, no data-dependent shapes.

Semantics match `_monotonic_alignment_search` + `viterbi_decode`
(alignments.py:63-94,281-310) exactly on the valid (cropped) region.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jatts_tpu.ops.masks import sequence_mask

_NEG = -1e9  # -inf stand-in that survives max/add without NaNs


def mas_path(
    log_p_attn: jnp.ndarray,
    text_lengths: jnp.ndarray,
    feats_lengths: jnp.ndarray,
) -> jnp.ndarray:
    """Viterbi token index per mel frame.

    Args:
        log_p_attn: ``[B, T_feats, T_text]`` log attention probabilities.
        text_lengths: ``[B]``.
        feats_lengths: ``[B]``.

    Returns:
        ``[B, T_feats]`` int32 — for each frame the aligned token index
        (frames >= feats_length clamp to text_length-1).
    """
    b, t_feats, t_text = log_p_attn.shape
    lp = jnp.swapaxes(log_p_attn.astype(jnp.float32), 1, 2)  # [B, T_text, T_feats]

    tok_valid = sequence_mask(text_lengths, t_text)  # [B, T_text]
    lp = jnp.where(tok_valid[:, :, None], lp, _NEG)

    # ---- forward DP: Q[i, j] = max(Q[i-1, j-1], Q[i, j-1]) + lp[i, j] ----
    q0 = jnp.full((b, t_text), _NEG, dtype=jnp.float32)
    q0 = q0.at[:, 0].set(lp[:, 0, 0])

    def fwd(q_prev, lp_j):
        # lp_j: [B, T_text] — column j of the lattice
        shifted = jnp.concatenate(
            [jnp.full((b, 1), _NEG, jnp.float32), q_prev[:, :-1]], axis=1
        )
        q = jnp.maximum(shifted, q_prev) + lp_j
        return q, q_prev

    lp_cols = jnp.moveaxis(lp[:, :, 1:], 2, 0)  # [T_feats-1, B, T_text]
    q_last, q_hist = jax.lax.scan(fwd, q0, lp_cols)
    # Q columns for j = 0..T_feats-1: q_hist holds j=0..T_feats-2, q_last is last.
    q_all = jnp.concatenate([q_hist, q_last[None]], axis=0)  # [T_feats, B, T_text]

    # ---- backtrace ----
    last_tok = (text_lengths - 1).astype(jnp.int32)  # [B]
    last_frame = (feats_lengths - 1).astype(jnp.int32)

    def bwd(a_next, inputs):
        j, q_j = inputs  # q_j: [B, T_text] = Q[:, :, j]
        i_b = a_next
        i_a = jnp.maximum(i_b - 1, 0)
        q_ia = jnp.take_along_axis(q_j, i_a[:, None], axis=1)[:, 0]
        q_ib = jnp.take_along_axis(q_j, i_b[:, None], axis=1)[:, 0]
        a_j = jnp.where(i_b == 0, 0, jnp.where(q_ia >= q_ib, i_a, i_b))
        # frames past the valid region pin to the last valid token so the
        # recurrence restarts correctly at j = feats_length-2
        a_j = jnp.where(j >= last_frame, last_tok, a_j)
        return a_j, a_j

    js = jnp.arange(t_feats - 2, -1, -1)
    q_cols = q_all[js.clip(0)]  # [T_feats-1, B, T_text] in reverse frame order
    a_init = last_tok
    _, a_rev = jax.lax.scan(bwd, a_init, (js, q_cols))
    # a_rev holds A[j] for j = T_feats-2 .. 0; append A[T_feats-1]
    path = jnp.concatenate([a_rev[::-1], a_init[None]], axis=0)  # [T_feats, B]
    path = jnp.moveaxis(path, 0, 1)  # [B, T_feats]
    # clamp padding frames (incl. the appended last column when t_feats > len)
    frame_valid = sequence_mask(feats_lengths, t_feats)
    path = jnp.where(frame_valid, path, last_tok[:, None])
    return path.astype(jnp.int32)


def _select_mas(backend: str):
    """Resolve the MAS implementation.

    'auto' picks the batched Pallas kernel on TPU-class backends (18x over
    the scan at 16x1024x128 on v5e, bit-exact — benchmarks/bench_mas_pallas)
    and the XLA scan elsewhere; 'scan'/'pallas' force; 'pallas_interpret' is
    the CPU-testable interpreter mode.
    """
    if backend == "auto":
        backend = (
            "pallas" if jax.default_backend() in ("tpu", "axon") else "scan"
        )
    if backend == "scan":
        return mas_path
    from jatts_tpu.ops.mas_pallas import mas_path_pallas

    if backend == "pallas":
        return mas_path_pallas
    if backend == "pallas_interpret":
        return lambda lp, tl, fl: mas_path_pallas(lp, tl, fl, interpret=True)
    raise ValueError(f"unknown MAS backend: {backend}")


def viterbi_decode(
    log_p_attn: jnp.ndarray,
    text_lengths: jnp.ndarray,
    feats_lengths: jnp.ndarray,
    backend: str = "auto",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Durations + binarization loss (reference viterbi_decode,
    alignments.py:281-310).

    Returns:
        ds: ``[B, T_text]`` float32 — frames per token.
        bin_loss: scalar — mean over batch of
            ``-mean_j log_p_attn[b, j, path[b, j]]`` over valid frames
            (differentiable w.r.t. ``log_p_attn``; the path is stopped-grad).
    """
    b, t_feats, t_text = log_p_attn.shape
    path = _select_mas(backend)(
        jax.lax.stop_gradient(log_p_attn), text_lengths, feats_lengths
    )

    frame_valid = sequence_mask(feats_lengths, t_feats, jnp.float32)  # [B, T_feats]
    onehot = jax.nn.one_hot(path, t_text, dtype=jnp.float32)  # [B, T_feats, T_text]
    ds = jnp.sum(onehot * frame_valid[:, :, None], axis=1)  # [B, T_text]

    gathered = jnp.sum(log_p_attn * onehot, axis=-1)  # [B, T_feats]
    per_utt = -jnp.sum(gathered * frame_valid, axis=1) / jnp.maximum(
        feats_lengths.astype(jnp.float32), 1.0
    )
    bin_loss = jnp.mean(per_utt)
    return ds, bin_loss
