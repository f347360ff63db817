"""Matcha-TTS with implicit alignment (MAS) — reference
jatts/models/matchatts_mas.py:39-698.

Same trunk as MatchaTTS but durations come from a batched on-device
monotonic alignment search (jatts_tpu.ops.mas — no CPU/numba round trip) and
expansion uses Gaussian upsampling.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from jatts_tpu.models.matchatts import MatchaTTS
from jatts_tpu.modules.alignment import AlignmentModule
from jatts_tpu.ops.mas import viterbi_decode
from jatts_tpu.ops.masks import sequence_mask
from jatts_tpu.ops.upsample import gaussian_upsampling, predicted_durations_to_int


class MatchaTTS_MAS(MatchaTTS):
    duration_predictor_type: str = "deterministic"
    stochastic_duration_predictor_noise_scale: float = 0.8
    # 'auto' = batched Pallas MAS on TPU (18x vs scan), XLA scan elsewhere
    mas_backend: str = "auto"

    def setup(self):
        super().setup()
        if self.duration_predictor_type == "stochastic":
            from jatts_tpu.modules.flows import StochasticDurationPredictor

            self.sdp = StochasticDurationPredictor(
                channels=self.adim,
                kernel_size=self.duration_predictor_kernel_size,
            )
        self.alignment_module = AlignmentModule(
            self.adim, self.odim, dtype=self.dtype, name="alignment_module"
        )

    def __call__(
        self,
        xs: jnp.ndarray,
        ilens: jnp.ndarray,
        ys: jnp.ndarray,
        olens: jnp.ndarray,
        spembs: Optional[jnp.ndarray] = None,
        sids: Optional[jnp.ndarray] = None,
        deterministic: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """Training forward (reference matchatts_mas.py:415-550)."""
        hs, d_masks = self.encode(xs, ilens, spembs, sids, deterministic)

        log_p_attn = self.alignment_module(hs, ys, d_masks)
        ds, bin_loss = viterbi_decode(
            log_p_attn, ilens, olens, backend=self.mas_backend
        )

        dur_nll = None
        if self.duration_predictor_type == "stochastic":
            dur_nll = self.sdp(
                hs, d_masks[..., None].astype(hs.dtype), w=ds[..., None],
                deterministic=deterministic,
            ) / jnp.maximum(jnp.sum(d_masks), 1.0)
            d_outs = jnp.zeros_like(ds)
        else:
            d_outs = self.duration_predictor(hs, d_masks, deterministic=deterministic)

        t_feats = ys.shape[1]
        h_masks_frames = sequence_mask(olens, t_feats, jnp.float32)
        hs = gaussian_upsampling(hs, ds, h_masks_frames, d_masks)
        hs = self.encoder_proj(hs)

        olens_in = olens - olens % 2
        h_masks = sequence_mask(olens_in, t_feats, jnp.float32)
        cfm_loss, _ = self.decoder(
            ys * h_masks[..., None], h_masks, hs * h_masks[..., None],
            deterministic=deterministic,
        )
        return {
            "d_outs": d_outs,
            "dur_nll": dur_nll,
            "ys": ys,
            "hs": hs,
            "olens_in": olens_in,
            "cfm_loss": cfm_loss,
            "bin_loss": bin_loss,
            "log_p_attn": log_p_attn,
            "ds": ds,
        }

    def inference(
        self,
        xs: jnp.ndarray,
        ilens: jnp.ndarray,
        max_t_feats: int,
        spembs: Optional[jnp.ndarray] = None,
        sids: Optional[jnp.ndarray] = None,
        n_timesteps: int = 10,
        temperature: float = 0.667,
        alpha: float = 1.0,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """reference matchatts_mas.py:552-698 (predicted durations +
        Gaussian upsampling)."""
        hs, d_masks = self.encode(xs, ilens, spembs, sids, deterministic)
        if self.duration_predictor_type == "stochastic":
            d_outs = self.sdp(
                hs, d_masks[..., None].astype(hs.dtype), inverse=True,
                noise_scale=self.stochastic_duration_predictor_noise_scale,
            ).astype(jnp.int32) * d_masks.astype(jnp.int32)
        else:
            d_log = self.duration_predictor(hs, d_masks, deterministic=deterministic)
            d_outs = predicted_durations_to_int(d_log, alpha) * d_masks.astype(jnp.int32)
        olens = jnp.minimum(jnp.maximum(jnp.sum(d_outs, axis=-1), 1), max_t_feats)
        olens = olens - olens % 2
        h_masks = sequence_mask(olens, max_t_feats, jnp.float32)
        hs = gaussian_upsampling(hs, d_outs.astype(jnp.float32), h_masks, d_masks)
        hs = self.encoder_proj(hs)
        feat_gen = self.decoder.inference(
            hs * h_masks[..., None], h_masks, n_timesteps, temperature
        )
        return {
            "feat_gen": feat_gen * h_masks[..., None],
            "duration": d_outs,
            "olens": olens,
        }
