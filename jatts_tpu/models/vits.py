"""mel-VITS (VAE + flow + MAS, no GAN) — reference jatts/models/vits.py:34-731.

TextEncoder (conformer, m_p/logs_p) + PosteriorEncoder (WaveNet VAE) +
ResidualAffineCouplingBlock flow + batched MAS + Gaussian upsampling +
conformer decoder over z -> mel. Training returns everything the KL /
alignment losses need; inference samples z_p, inverts the flow, decodes.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from jatts_tpu.modules.alignment import AlignmentModule
from jatts_tpu.modules.conformer import ConformerEncoder, resolve_rel_pos_types
from jatts_tpu.modules.predictors import DurationPredictor
from jatts_tpu.modules.vits_modules import (
    PosteriorEncoder,
    ResidualAffineCouplingBlock,
    TextEncoder,
)
from jatts_tpu.ops.mas import viterbi_decode
from jatts_tpu.ops.masks import attn_mask, sequence_mask
from jatts_tpu.ops.upsample import gaussian_upsampling, predicted_durations_to_int


class VITS(nn.Module):
    idim: int
    odim: int = 80
    adim: int = 384
    aheads: int = 2
    text_encoder_ffn_expand: int = 4
    text_encoder_blocks: int = 6
    text_encoder_positionwise_conv_kernel_size: int = 3
    use_macaron_style_in_text_encoder: bool = True
    use_conformer_conv_in_text_encoder: bool = True
    text_encoder_kernel_size: int = 7
    text_encoder_dropout_rate: float = 0.2
    text_encoder_positional_dropout_rate: float = 0.2
    text_encoder_attention_dropout_rate: float = 0.2
    dlayers: int = 4
    dunits: int = 1536
    decoder_positionwise_layer_type: str = "conv1d"
    decoder_positionwise_conv_kernel_size: int = 3
    decoder_normalize_before: bool = True
    use_macaron_style_in_conformer: bool = True
    use_cnn_in_conformer: bool = True
    conformer_dec_kernel_size: int = 31
    transformer_dec_dropout_rate: float = 0.2
    transformer_dec_positional_dropout_rate: float = 0.2
    transformer_dec_attn_dropout_rate: float = 0.2
    conformer_rel_pos_type: str = "legacy"
    conformer_pos_enc_layer_type: str = "rel_pos"
    conformer_self_attn_layer_type: str = "rel_selfattn"
    duration_predictor_type: str = "deterministic"
    # 'auto' = batched Pallas MAS on TPU (18x vs scan), XLA scan elsewhere
    mas_backend: str = "auto"
    duration_predictor_layers: int = 2
    duration_predictor_chans: int = 256
    duration_predictor_kernel_size: int = 3
    duration_predictor_dropout_rate: float = 0.1
    stochastic_duration_predictor_noise_scale: float = 0.8
    posterior_encoder_kernel_size: int = 5
    posterior_encoder_layers: int = 16
    posterior_encoder_stacks: int = 1
    posterior_encoder_base_dilation: int = 1
    posterior_encoder_dropout_rate: float = 0.0
    use_weight_norm_in_posterior_encoder: bool = True
    flow_flows: int = 4
    flow_kernel_size: int = 5
    flow_base_dilation: int = 1
    flow_layers: int = 4
    flow_dropout_rate: float = 0.0
    use_weight_norm_in_flow: bool = True
    use_only_mean_in_flow: bool = True
    reduction_factor: int = 1
    spk_embed_dim: Optional[int] = None
    spk_embed_integration_type: str = "add"
    spks: Optional[int] = None
    use_masking: bool = True
    init_type: str = "xavier_uniform"
    dtype: Any = jnp.float32

    def setup(self):
        pos_enc_type, selfattn_type = resolve_rel_pos_types(
            self.conformer_rel_pos_type,
            self.conformer_pos_enc_layer_type,
            self.conformer_self_attn_layer_type,
        )
        self.text_encoder = TextEncoder(
            vocabs=self.idim,
            attention_dim=self.adim,
            attention_heads=self.aheads,
            linear_units=self.adim * self.text_encoder_ffn_expand,
            blocks=self.text_encoder_blocks,
            positionwise_conv_kernel_size=self.text_encoder_positionwise_conv_kernel_size,
            use_macaron_style=self.use_macaron_style_in_text_encoder,
            use_conformer_conv=self.use_conformer_conv_in_text_encoder,
            conformer_kernel_size=self.text_encoder_kernel_size,
            dropout_rate=self.text_encoder_dropout_rate,
            positional_dropout_rate=self.text_encoder_positional_dropout_rate,
            attention_dropout_rate=self.text_encoder_attention_dropout_rate,
            pos_enc_layer_type=pos_enc_type,
            selfattention_layer_type=selfattn_type,
            dtype=self.dtype,
            name="text_encoder",
        )
        if self.spk_embed_dim is not None and self.spk_embed_dim > 0:
            self.projection = nn.Dense(self.adim, dtype=self.dtype, name="projection")
        glob = self.spk_embed_dim if self.spk_embed_dim else -1
        self.posterior_encoder = PosteriorEncoder(
            out_channels=self.adim,
            hidden_channels=self.adim,
            kernel_size=self.posterior_encoder_kernel_size,
            layers=self.posterior_encoder_layers,
            stacks=self.posterior_encoder_stacks,
            base_dilation=self.posterior_encoder_base_dilation,
            global_channels=glob,
            dropout_rate=self.posterior_encoder_dropout_rate,
            use_weight_norm=self.use_weight_norm_in_posterior_encoder,
            dtype=self.dtype,
            name="posterior_encoder",
        )
        self.flow = ResidualAffineCouplingBlock(
            in_channels=self.adim,
            hidden_channels=self.adim,
            flows=self.flow_flows,
            kernel_size=self.flow_kernel_size,
            base_dilation=self.flow_base_dilation,
            layers=self.flow_layers,
            global_channels=glob,
            dropout_rate=self.flow_dropout_rate,
            use_weight_norm=self.use_weight_norm_in_flow,
            use_only_mean=self.use_only_mean_in_flow,
            dtype=self.dtype,
            name="flow",
        )
        if self.duration_predictor_type == "stochastic":
            from jatts_tpu.modules.flows import StochasticDurationPredictor

            self.duration_predictor = StochasticDurationPredictor(
                channels=self.adim,
                kernel_size=self.duration_predictor_kernel_size,
                dropout_rate=self.duration_predictor_dropout_rate,
            )
        else:
            self.duration_predictor = DurationPredictor(
                n_layers=self.duration_predictor_layers,
                n_chans=self.duration_predictor_chans,
                kernel_size=self.duration_predictor_kernel_size,
                dropout_rate=self.duration_predictor_dropout_rate,
                dtype=self.dtype,
            )
        self.alignment_module = AlignmentModule(
            self.adim, self.odim, dtype=self.dtype, name="alignment_module"
        )
        self.decoder = ConformerEncoder(
            attention_dim=self.adim,
            attention_heads=self.aheads,
            linear_units=self.dunits,
            num_blocks=self.dlayers,
            dropout_rate=self.transformer_dec_dropout_rate,
            positional_dropout_rate=self.transformer_dec_positional_dropout_rate,
            attention_dropout_rate=self.transformer_dec_attn_dropout_rate,
            input_layer=None,
            normalize_before=self.decoder_normalize_before,
            positionwise_layer_type=self.decoder_positionwise_layer_type,
            positionwise_conv_kernel_size=self.decoder_positionwise_conv_kernel_size,
            macaron_style=self.use_macaron_style_in_conformer,
            use_cnn_module=self.use_cnn_in_conformer,
            cnn_module_kernel=self.conformer_dec_kernel_size,
            pos_enc_layer_type=pos_enc_type,
            selfattention_layer_type=selfattn_type,
            dtype=self.dtype,
            name="decoder",
        )
        self.feat_out = nn.Dense(
            self.odim * self.reduction_factor, dtype=self.dtype, name="feat_out"
        )

    def _integrate_spembs(self, hs, spembs):
        spembs = spembs / jnp.maximum(
            jnp.linalg.norm(spembs, axis=-1, keepdims=True), 1e-12
        )
        if self.spk_embed_integration_type == "add":
            return hs + self.projection(spembs)[:, None, :]
        spembs_e = jnp.broadcast_to(
            spembs[:, None, :], (hs.shape[0], hs.shape[1], spembs.shape[-1])
        )
        return self.projection(jnp.concatenate([hs, spembs_e], axis=-1))

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
        """Training forward (reference vits.py:413-579)."""
        t_text, t_feats = xs.shape[1], ys.shape[1]
        hs, m_p, logs_p, _ = self.text_encoder(xs, ilens, deterministic=deterministic)
        if self.spk_embed_dim is not None and spembs is not None:
            hs = self._integrate_spembs(hs, spembs)
        g = spembs[:, None, :] if spembs is not None else None

        z, m_q, logs_q, y_mask = self.posterior_encoder(
            ys, olens, g=g, deterministic=deterministic
        )
        z_p = self.flow(z, y_mask, g=g, deterministic=deterministic)

        d_masks = sequence_mask(ilens, t_text)
        log_p_attn = self.alignment_module(hs, ys, d_masks)
        ds, bin_loss = viterbi_decode(
            log_p_attn, ilens, olens, backend=self.mas_backend
        )
        dur_nll = None
        if self.duration_predictor_type == "stochastic":
            # flow NLL of the MAS durations (reference vits.py:503-509)
            dur_nll = self.duration_predictor(
                hs, d_masks[..., None].astype(hs.dtype), w=ds[..., None],
                deterministic=deterministic,
            )
            dur_nll = dur_nll / jnp.maximum(jnp.sum(d_masks), 1.0)
            d_outs = jnp.zeros_like(ds)
        else:
            d_outs = self.duration_predictor(hs, d_masks, deterministic=deterministic)

        frame_mask = sequence_mask(olens, t_feats, jnp.float32)
        m_p = gaussian_upsampling(m_p, ds, frame_mask, d_masks)
        logs_p = gaussian_upsampling(logs_p, ds, frame_mask, d_masks)

        h_masks = attn_mask(olens, t_feats)
        zs = self.decoder(z, h_masks, deterministic=deterministic)
        outs = self.feat_out(zs).reshape(zs.shape[0], -1, self.odim)

        return {
            "outs": outs,
            "dur_nll": dur_nll,
            "d_outs": d_outs,
            "ys": ys,
            "olens_in": olens,
            "bin_loss": bin_loss,
            "log_p_attn": log_p_attn,
            "ds": ds,
            "m_p": m_p,
            "logs_p": logs_p,
            "m_q": m_q,
            "logs_q": logs_q,
            "z": z,
            "z_p": z_p,
            "y_mask": y_mask,
        }

    def inference(
        self,
        xs: jnp.ndarray,
        ilens: jnp.ndarray,
        max_t_feats: int,
        spembs: Optional[jnp.ndarray] = None,
        sids: Optional[jnp.ndarray] = None,
        noise_scale: float = 0.667,
        alpha: float = 1.0,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """reference vits.py:447-485 + 581-731: predicted durations ->
        Gaussian-upsampled prior -> sample z_p -> inverse flow -> decode."""
        t_text = xs.shape[1]
        hs, m_p, logs_p, _ = self.text_encoder(xs, ilens, deterministic=deterministic)
        if self.spk_embed_dim is not None and spembs is not None:
            hs = self._integrate_spembs(hs, spembs)
        g = spembs[:, None, :] if spembs is not None else None

        d_masks = sequence_mask(ilens, t_text)
        if self.duration_predictor_type == "stochastic":
            d_outs = self.duration_predictor(
                hs, d_masks[..., None].astype(hs.dtype), inverse=True,
                noise_scale=self.stochastic_duration_predictor_noise_scale,
            ).astype(jnp.int32) * d_masks.astype(jnp.int32)
        else:
            d_log = self.duration_predictor(hs, d_masks, deterministic=deterministic)
            d_outs = predicted_durations_to_int(d_log, alpha) * d_masks.astype(jnp.int32)
        olens = jnp.minimum(jnp.maximum(jnp.sum(d_outs, axis=-1), 1), max_t_feats)
        frame_mask = sequence_mask(olens, max_t_feats, jnp.float32)

        m_p = gaussian_upsampling(m_p, d_outs.astype(jnp.float32), frame_mask, d_masks)
        logs_p = gaussian_upsampling(logs_p, d_outs.astype(jnp.float32), frame_mask, d_masks)

        eps = jax.random.normal(self.make_rng("noise"), m_p.shape, dtype=m_p.dtype)
        z_p = m_p + eps * jnp.exp(logs_p) * noise_scale
        y_mask = frame_mask[..., None]
        z = self.flow(z_p, y_mask, g=g, inverse=True, deterministic=deterministic)

        zs = self.decoder(z, attn_mask(olens, max_t_feats), deterministic=deterministic)
        outs = self.feat_out(zs).reshape(zs.shape[0], -1, self.odim)
        outs = outs * y_mask
        return {"feat_gen": outs, "duration": d_outs, "olens": olens}
