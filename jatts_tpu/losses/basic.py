"""Masked L1/MSE losses (reference jatts/losses/l1l2_loss.py,
duration_predictor_loss.py, variance_predictor_loss.py).

All reductions are mean-over-unmasked-elements, matching the reference's
``masked_select`` + ``reduction='mean'`` semantics, but computed with
where-masking so shapes stay static under jit.
"""

from __future__ import annotations

import jax.numpy as jnp

from jatts_tpu.ops.masks import sequence_mask


def _masked_mean(err: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of ``err`` over positions where ``mask`` (broadcastable) is 1."""
    mask = jnp.broadcast_to(mask.astype(err.dtype), err.shape)
    return jnp.sum(err * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def masked_l1(pred, target, mask):
    return _masked_mean(jnp.abs(pred - target), mask)


def masked_mse(pred, target, mask):
    return _masked_mean((pred - target) ** 2, mask)


class L1Loss:
    """before+after postnet masked L1 (reference l1l2_loss.py:32-75)."""

    def __init__(self, use_masking: bool = True, reduction: str = "mean"):
        self.use_masking = use_masking

    def __call__(self, after_outs, before_outs, ys, olens):
        t = ys.shape[1]
        mask = (
            sequence_mask(olens, t, jnp.float32)[..., None]
            if self.use_masking
            else jnp.ones((ys.shape[0], t, 1), jnp.float32)
        )
        loss = masked_l1(before_outs, ys, mask)
        if after_outs is not None:
            loss = loss + masked_l1(after_outs, ys, mask)
        return loss


class MelLoss:
    """Dispatcher kept for config parity (reference l1l2_loss.py:11-29)."""

    def __init__(self, _type: str = "L1Loss", params: dict | None = None, **kw):
        if _type != "L1Loss":
            raise ValueError(f"unsupported MelLoss type {_type}")
        self.criterion = L1Loss(**(params or {}))

    def __call__(self, after_outs, before_outs, ys, olens):
        return self.criterion(after_outs, before_outs, ys, olens)


class DurationPredictorLoss:
    """Masked MSE in log domain (reference duration_predictor_loss.py:11-57)."""

    def __init__(self, use_masking: bool = True, offset: float = 1.0, reduction="mean"):
        self.use_masking = use_masking
        self.offset = offset

    def __call__(self, d_outs, ds, ilens):
        t = ds.shape[1]
        mask = (
            sequence_mask(ilens, t, jnp.float32)
            if self.use_masking
            else jnp.ones_like(d_outs)
        )
        target = jnp.log(ds.astype(jnp.float32) + self.offset)
        return masked_mse(d_outs, target, mask)


class _VarianceLoss:
    def __init__(self, use_masking: bool = True, reduction: str = "mean"):
        self.use_masking = use_masking

    def __call__(self, outs, targets, lens):
        t = targets.shape[1]
        mask = (
            sequence_mask(lens, t, jnp.float32)[..., None]
            if self.use_masking
            else jnp.ones_like(outs)
        )
        return masked_mse(outs, targets, mask)


class PitchLoss(_VarianceLoss):
    """reference variance_predictor_loss.py:11-52"""


class EnergyLoss(_VarianceLoss):
    """reference variance_predictor_loss.py:55-97"""
