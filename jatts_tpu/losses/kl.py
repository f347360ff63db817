"""VITS KL divergence losses (reference jatts/losses/kldivergence_loss.py)."""

from __future__ import annotations

import jax.numpy as jnp


class KLDivergenceLoss:
    """Flow-prior KL, mask-normalized (reference kldivergence_loss.py:15-49).

    All tensors channel-first [B, H, T_feats] like the reference; z_mask is
    [B, 1, T_feats].
    """

    def __call__(self, z_p, logs_q, m_p, logs_p, z_mask):
        z_p, logs_q = z_p.astype(jnp.float32), logs_q.astype(jnp.float32)
        m_p, logs_p = m_p.astype(jnp.float32), logs_p.astype(jnp.float32)
        z_mask = z_mask.astype(jnp.float32)
        kl = logs_p - logs_q - 0.5
        kl = kl + 0.5 * ((z_p - m_p) ** 2) * jnp.exp(-2.0 * logs_p)
        return jnp.sum(kl * z_mask) / jnp.maximum(jnp.sum(z_mask), 1.0)


class KLDivergenceLossWithoutFlow:
    """Gaussian-Gaussian KL, plain mean (reference kldivergence_loss.py:52-72)."""

    def __call__(self, m_q, logs_q, m_p, logs_p):
        v_q = jnp.exp(2.0 * logs_q)
        v_p = jnp.exp(2.0 * logs_p)
        kl = logs_p - logs_q + (v_q + (m_q - m_p) ** 2) / (2.0 * v_p) - 0.5
        return jnp.mean(kl)
