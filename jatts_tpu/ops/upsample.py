"""Duration-based length regulation, TPU-native.

The reference's ``LengthRegulator`` (jatts/modules/length_regulator.py:46-97)
does a per-utterance ``torch.repeat_interleave`` — a data-dependent-shape op
that cannot live inside a jitted program. We re-design it as a *one-hot
assignment matrix* built from the duration cumsum against a static frame grid:

    R[b, t, j] = 1  iff  cumsum(d)[j-1] <= t < cumsum(d)[j]

so the expansion is a single ``R @ hs`` batched matmul (rides the MXU), works
for any padded ``T_feats``, and differentiates cleanly.

``GaussianUpsampling`` (reference length_regulator.py:100-154) is already a
matrix-form soft attention; we reproduce its exact semantics.
"""

from __future__ import annotations

import jax.numpy as jnp

from jatts_tpu.ops.masks import sequence_mask


def duration_assignment(
    ds: jnp.ndarray,
    t_feats: int,
    d_masks: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Hard assignment matrix ``[B, T_feats, T_text]`` from integer durations.

    Frame ``t`` is assigned to token ``j`` when
    ``cumsum(ds)[j-1] <= t < cumsum(ds)[j]``. Frames beyond ``sum(ds)`` get an
    all-zero row (caller masks them anyway).
    """
    ds = ds.astype(jnp.float32)
    if d_masks is not None:
        ds = ds * d_masks.astype(jnp.float32)
    cum = jnp.cumsum(ds, axis=-1)  # [B, T_text]
    start = cum - ds
    t = jnp.arange(t_feats, dtype=jnp.float32)[None, :, None]  # [1, T_feats, 1]
    r = (t >= start[:, None, :]) & (t < cum[:, None, :])
    return r.astype(jnp.float32)


def regulate_length(
    hs: jnp.ndarray,
    ds: jnp.ndarray,
    t_feats: int,
    d_masks: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Expand ``hs [B, T_text, C]`` by durations ``ds [B, T_text]`` to
    ``[B, t_feats, C]`` (replaces reference LengthRegulator repeat_interleave)."""
    r = duration_assignment(ds, t_feats, d_masks)
    return jnp.einsum(
        "btj,bjc->btc", r, hs, preferred_element_type=jnp.float32
    ).astype(hs.dtype)


def predicted_durations_to_int(d_outs: jnp.ndarray, alpha: float = 1.0) -> jnp.ndarray:
    """Log-domain duration-predictor output -> integer durations.

    Mirrors reference DurationPredictor.inference
    (jatts/modules/duration_predictor.py:102-125): clamp(round(exp(d)-1), min=0),
    with the speed-control ``alpha`` of LengthRegulator applied as d*alpha.
    """
    d = jnp.clip(jnp.round(jnp.exp(d_outs) - 1.0), 0.0, None)
    if alpha != 1.0:
        d = jnp.round(d * alpha)
    return d.astype(jnp.int32)


def gaussian_upsampling(
    hs: jnp.ndarray,
    ds: jnp.ndarray,
    h_masks: jnp.ndarray | None = None,
    d_masks: jnp.ndarray | None = None,
    delta: float = 0.1,
    t_feats: int | None = None,
) -> jnp.ndarray:
    """Soft Gaussian upsampling (arXiv:2010.04301), exact semantics of the
    reference (jatts/modules/length_regulator.py:111-154).

    Args:
        hs: ``[B, T_text, C]`` hidden states.
        ds: ``[B, T_text]`` durations (float or int).
        h_masks: ``[B, T_feats]`` frame validity mask (required under jit —
            supplies the static output length unless ``t_feats`` given).
        d_masks: ``[B, T_text]`` token validity mask.
        delta: inverse temperature.
        t_feats: static output length; defaults to ``h_masks.shape[-1]``.
    """
    if t_feats is None:
        if h_masks is None:
            raise ValueError("need h_masks or t_feats for a static output length")
        t_feats = h_masks.shape[-1]
    ds = ds.astype(jnp.float32)

    t = jnp.arange(t_feats, dtype=jnp.float32)[None, :]  # [1, T_feats]
    if h_masks is not None:
        t = t * h_masks.astype(jnp.float32)
    c = jnp.cumsum(ds, axis=-1) - ds / 2.0  # [B, T_text]
    energy = -delta * (t[:, :, None] - c[:, None, :]) ** 2  # [B, T_feats, T_text]
    if d_masks is not None:
        # finite mask value + explicit zeroing of all-masked rows: -inf would
        # softmax a fully padded row (e.g. a pad_batch_to_devices repeat with
        # zeroed lens) to NaN, and NaN * 0 still NaNs the downstream loss
        energy = jnp.where(d_masks[:, None, :], energy, -1e9)
    p_attn = _softmax_lastaxis(energy)
    if d_masks is not None:
        p_attn = jnp.where(
            d_masks.any(axis=-1)[:, None, None], p_attn, 0.0
        )
    return jnp.einsum(
        "btj,bjc->btc", p_attn, hs, preferred_element_type=jnp.float32
    ).astype(hs.dtype)


def _softmax_lastaxis(x: jnp.ndarray) -> jnp.ndarray:
    m = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def average_by_duration(
    xs: jnp.ndarray,
    ds: jnp.ndarray,
    text_lengths: jnp.ndarray,
    feats_lengths: jnp.ndarray,
    only_positive: bool = False,
) -> jnp.ndarray:
    """Average frame-level ``xs [B, T_feats]`` into token level ``[B, T_text]``.

    Jittable, batched replacement for the reference's numba kernel
    (jatts/modules/alignments.py:458-496): segment sums via the duration
    assignment matrix. With ``only_positive=True`` it reproduces the
    preprocessing-time FastPitch averaging that only averages voiced (>0)
    frames (reference feature_extract/dio.py:148-159).
    """
    b, t_text = ds.shape
    t_feats = xs.shape[1]
    d_masks = sequence_mask(text_lengths, t_text)
    r = duration_assignment(ds, t_feats, d_masks)  # [B, T_feats, T_text]
    f_mask = sequence_mask(feats_lengths, t_feats, jnp.float32)  # [B, T_feats]
    r = r * f_mask[:, :, None]
    w = xs.astype(jnp.float32)
    if only_positive:
        pos = (w > 0.0).astype(jnp.float32)
        num = jnp.einsum("btj,bt->bj", r, w * pos)
        den = jnp.einsum("btj,bt->bj", r, pos)
    else:
        num = jnp.einsum("btj,bt->bj", r, w)
        den = jnp.sum(r, axis=1)
    avg = jnp.where(den > 0, num / jnp.maximum(den, 1.0), 0.0)
    return avg.astype(xs.dtype)
