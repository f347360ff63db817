"""Alignment losses: forward-sum (CTC) with beta-binomial prior, bin loss.

TPU-native re-design of the reference ForwardSumLoss
(jatts/losses/forward_sum_loss.py:12-116): the reference loops over the batch
calling ``F.ctc_loss`` per utterance and builds the beta-binomial prior with
scipy on the host (cached per shape). Here both are fully batched jitted ops:
the prior is computed with ``gammaln`` inside jit, and the CTC forward
recursion is one ``lax.scan`` over frames for the whole batch.

Because the CTC "vocabulary" is the text-position sequence 1..N (strictly
monotone, all labels distinct), the standard 3-way CTC transition rule applies
without same-label exclusions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from jatts_tpu.ops.masks import sequence_mask

_NEG = -1e9


def _betaln(a, b):
    return gammaln(a) + gammaln(b) - gammaln(a + b)


def beta_binomial_prior(
    text_lengths: jnp.ndarray,
    feats_lengths: jnp.ndarray,
    t_text: int,
    t_feats: int,
    w: float = 1.0,
) -> jnp.ndarray:
    """Batched beta-binomial alignment prior ``[B, T_feats, T_text]``
    (reference _generate_prior, forward_sum_loss.py:78-116).

    prior[b, t, k] = BetaBinom(k; n=N_b, a=w*(t+1), b=w*(T_b-t)) in log space,
    valid on t < T_b, k < N_b; ``-1e9`` elsewhere.
    """
    n = text_lengths.astype(jnp.float32)[:, None, None]  # [B,1,1]
    tt = feats_lengths.astype(jnp.float32)[:, None, None]
    t = jnp.arange(t_feats, dtype=jnp.float32)[None, :, None] + 1.0  # 1-indexed
    k = jnp.arange(t_text, dtype=jnp.float32)[None, None, :]
    a = w * t
    b = w * (tt - t + 1.0)
    # guard invalid regions before gammaln (negative args)
    valid = (t <= tt) & (k < n)
    a_ = jnp.where(valid, a, 1.0)
    b_ = jnp.where(valid, jnp.maximum(b, 1e-3), 1.0)
    k_ = jnp.where(valid, k, 0.0)
    logpmf = (
        gammaln(n + 1.0)
        - gammaln(k_ + 1.0)
        - gammaln(n - k_ + 1.0)
        + _betaln(k_ + a_, n - k_ + b_)
        - _betaln(a_, b_)
    )
    return jnp.where(valid, logpmf, _NEG)


def _logaddexp3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    m = jnp.maximum(m, _NEG)  # keep finite
    return m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m) + jnp.exp(c - m))


def ctc_forward_sum(
    log_probs: jnp.ndarray,
    text_lengths: jnp.ndarray,
    feats_lengths: jnp.ndarray,
) -> jnp.ndarray:
    """Batched CTC forward NLL for the monotone target sequence 1..N.

    Args:
        log_probs: ``[B, T_feats, T_text+1]`` — column 0 is the blank symbol.
        text_lengths / feats_lengths: ``[B]``.

    Returns:
        ``[B]`` negative log likelihoods (not normalized by target length).
    """
    bsz, t_feats, _ = log_probs.shape
    t_text = log_probs.shape[2] - 1
    s_max = 2 * t_text + 1

    # state s -> log prob column: even s = blank(0), odd s = token (s-1)/2 + 1
    s = jnp.arange(s_max)
    col = jnp.where(s % 2 == 0, 0, (s - 1) // 2 + 1)  # [S]
    lp_states = log_probs[:, :, col]  # [B, T_feats, S]

    # states beyond 2*N are invalid per utterance
    state_valid = s[None, :] < (2 * text_lengths[:, None] + 1)  # [B, S]
    lp_states = jnp.where(state_valid[:, None, :], lp_states, _NEG)

    alpha0 = jnp.full((bsz, s_max), _NEG)
    alpha0 = alpha0.at[:, 0].set(lp_states[:, 0, 0])
    alpha0 = alpha0.at[:, 1].set(lp_states[:, 0, 1])

    frame_valid = sequence_mask(feats_lengths, t_feats)  # [B, T_feats]

    def step(alpha, inputs):
        lp_t, valid_t = inputs  # [B, S], [B]
        shift1 = jnp.concatenate([jnp.full((bsz, 1), _NEG), alpha[:, :-1]], axis=1)
        shift2 = jnp.concatenate([jnp.full((bsz, 2), _NEG), alpha[:, :-2]], axis=1)
        # skip (s-2) transition only into label states (odd s)
        odd = (jnp.arange(s_max) % 2 == 1)[None, :]
        shift2 = jnp.where(odd, shift2, _NEG)
        new = _logaddexp3(alpha, shift1, shift2) + lp_t
        new = jnp.maximum(new, _NEG)
        return jnp.where(valid_t[:, None], new, alpha), None

    lp_seq = jnp.moveaxis(lp_states[:, 1:], 1, 0)  # [T_feats-1, B, S]
    valid_seq = jnp.moveaxis(frame_valid[:, 1:], 1, 0)
    alpha_T, _ = jax.lax.scan(step, alpha0, (lp_seq, valid_seq))

    end1 = 2 * text_lengths  # final blank state
    end2 = 2 * text_lengths - 1  # final label state
    a1 = jnp.take_along_axis(alpha_T, end1[:, None], axis=1)[:, 0]
    a2 = jnp.take_along_axis(alpha_T, end2[:, None], axis=1)[:, 0]
    return -jnp.logaddexp(a1, a2)


class ForwardSumLoss:
    """reference forward_sum_loss.py:12-77 — batched, jit-clean."""

    def __init__(self, cache_prior: bool = True):
        del cache_prior  # prior computed in-jit; no host cache needed

    def __call__(self, log_p_attn, ilens, olens, blank_prob: float = float(jnp.e) ** -1):
        bsz, t_feats, t_text = log_p_attn.shape
        prior = beta_binomial_prior(ilens, olens, t_text, t_feats)
        lp = log_p_attn + prior
        blank = jnp.full((bsz, t_feats, 1), jnp.log(blank_prob), lp.dtype)
        lp_pad = jnp.concatenate([blank, lp], axis=-1)
        nll = ctc_forward_sum(lp_pad, ilens, olens)
        # zero-length rows (pad_batch_to_devices repeats with zeroed lens)
        # must be exactly inert: excluded from numerator AND denominator.
        # Infeasible alignments (olens < ilens) are zeroed but stay in the
        # denominator — torch's zero_infinity=True semantics (reference
        # forward_sum_loss.py:72) — so one over-cropped utterance cannot
        # explode the loss.
        nonpad = (ilens > 0) & (olens > 0)
        feasible = olens >= ilens
        nll = jnp.where(nonpad & feasible, nll, 0.0)
        # torch F.ctc_loss(reduction='mean') divides by target length
        per = nll / jnp.maximum(ilens.astype(nll.dtype), 1.0)
        return jnp.sum(per) / jnp.maximum(jnp.sum(nonpad), 1).astype(per.dtype)


class BinLoss:
    """Binarization loss — computed inside ops.mas.viterbi_decode; kept for
    registry parity."""

    def __call__(self, *args, **kwargs):
        return None
