"""Flow-matching losses (reference jatts/losses/flow_matching.py)."""

from __future__ import annotations

import jax.numpy as jnp

from jatts_tpu.losses.basic import _masked_mean


class CFMLoss:
    """Dummy — the OT-CFM loss is computed inside the CFM module
    (reference flow_matching.py:13-17)."""

    def __init__(self, **kw):
        pass

    def __call__(self, *args, **kwargs):
        return None


class EncoderPriorLoss:
    """Matcha prior loss: masked 0.5*MSE(hs, ys) + log(2*pi)
    (reference flow_matching.py:60 adds the FULL log(2*pi) — upstream
    Matcha-TTS uses 0.5*log(2*pi), but parity is with the reference;
    the constant only shifts the reported value, not gradients)."""

    def __init__(self, **kw):
        pass

    def __call__(self, hs, ys, olens_mask):
        """hs/ys: [B, T, C]; olens_mask: [B, T] or [B, T, 1] validity."""
        if olens_mask.ndim == 2:
            olens_mask = olens_mask[..., None]
        err = 0.5 * (hs - ys) ** 2
        prior_loss = _masked_mean(err, olens_mask)
        return prior_loss + jnp.log(2.0 * jnp.pi)
