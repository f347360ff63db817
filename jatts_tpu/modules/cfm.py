"""Conditional flow matching (reference jatts/modules/matchatts/flow_matching.py:19-153).

OT-CFM loss: y = (1-(1-sigma)t) z + t x1, u = x1 - (1-sigma) z, masked MSE on
the estimator output. Inference: fixed-step Euler ODE from temperature-scaled
noise — a ``lax.scan``, not a python loop.

Feature-last convention: x1/mu [B, T, C], mask [B, T] float.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from jatts_tpu.modules.matcha_decoder import MatchaDecoder


class CFM(nn.Module):
    out_channels: int
    channels: Sequence[int] = (256, 256)
    dropout_rate: float = 0.05
    attention_head_dim: int = 64
    n_blocks: int = 1
    num_mid_blocks: int = 2
    num_heads: int = 2
    act_fn: str = "snakebeta"
    sigma_min: float = 1e-4
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.estimator = MatchaDecoder(
            out_channels=self.out_channels,
            channels=tuple(self.channels),
            dropout_rate=self.dropout_rate,
            attention_head_dim=self.attention_head_dim,
            n_blocks=self.n_blocks,
            num_mid_blocks=self.num_mid_blocks,
            num_heads=self.num_heads,
            act_fn=self.act_fn,
            dtype=self.dtype,
            name="estimator",
        )

    def __call__(self, x1, mask, mu, deterministic: bool = False, t=None, z=None):
        """Training loss (reference compute_loss, flow_matching.py:124-153).

        ``t``/``z`` may be injected (tests, reproducibility); by default they
        are sampled from the module's "noise" rng stream like the reference
        samples torch.rand/randn."""
        b = x1.shape[0]
        if t is None or z is None:
            rng = self.make_rng("noise")
            t_rng, z_rng = jax.random.split(rng)
            if t is None:
                t = jax.random.uniform(t_rng, (b, 1, 1), dtype=x1.dtype)
            if z is None:
                z = jax.random.normal(z_rng, x1.shape, dtype=x1.dtype)
        y = (1.0 - (1.0 - self.sigma_min) * t) * z + t * x1
        u = x1 - (1.0 - self.sigma_min) * z
        pred = self.estimator(y, mask, mu, t[:, 0, 0], deterministic=deterministic)
        # Reference-exact loss (flow_matching.py:151-153): the target u is NOT
        # masked — padded frames contribute a constant (1-sigma)^2 z^2 term
        # (the estimator masks its own output, so no gradient flows there).
        # Kept for loss-value parity with the reference/upstream Matcha-TTS.
        err = (pred - u) ** 2
        loss = jnp.sum(err) / jnp.maximum(jnp.sum(mask) * u.shape[-1], 1.0)
        return loss, y

    def inference(
        self, mu, mask, n_timesteps: int, temperature: float = 1.0,
        deterministic: bool = True, z=None,
    ):
        """Euler ODE sampler (reference inference/solve_euler,
        flow_matching.py:48-95); ``z`` injectable for parity tests."""
        if z is None:
            rng = self.make_rng("noise")
            z = jax.random.normal(rng, mu.shape, dtype=mu.dtype) * temperature
        t_span = jnp.linspace(0.0, 1.0, n_timesteps + 1)

        # lifted lax.scan over Euler steps (nn.scan broadcasts params):
        # the traced program contains ONE estimator body instead of
        # n_timesteps copies — n_timesteps-times smaller HLO, much faster
        # (remote-)compilation, no cross-step fusion worth keeping
        import flax.linen as fnn

        def body(mdl, x, tdt):
            t, dt = tdt
            dphi = mdl.estimator(
                x, mask, mu, jnp.full((x.shape[0],), t), deterministic=True
            )
            return x + dt * dphi, None

        scan = fnn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": False, "noise": False},
            in_axes=0,
            out_axes=0,
        )
        x, _ = scan(self, z, (t_span[:-1], t_span[1:] - t_span[:-1]))
        return x
