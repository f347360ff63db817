"""Matcha-TTS with external durations (reference jatts/models/matchatts.py:30-614).

Conformer encoder -> duration predictor -> matmul length regulator ->
encoder_proj(odim) -> CFM U-Net decoder. Training returns the CFM loss plus
the tensors for the encoder prior loss; inference runs the fixed-step Euler
sampler.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from jatts_tpu.modules.cfm import CFM
from jatts_tpu.modules.conformer import ConformerEncoder, resolve_rel_pos_types
from jatts_tpu.modules.predictors import DurationPredictor
from jatts_tpu.ops.masks import attn_mask, sequence_mask
from jatts_tpu.ops.upsample import predicted_durations_to_int, regulate_length


class MatchaTTS(nn.Module):
    idim: int
    odim: int = 80
    adim: int = 384
    aheads: int = 2
    elayers: int = 4
    eunits: int = 1536
    positionwise_layer_type: str = "conv1d"
    positionwise_conv_kernel_size: int = 3
    encoder_normalize_before: bool = True
    reduction_factor: int = 1
    encoder_type: str = "conformer"
    conformer_rel_pos_type: str = "legacy"
    conformer_pos_enc_layer_type: str = "rel_pos"
    conformer_self_attn_layer_type: str = "rel_selfattn"
    conformer_activation_type: str = "swish"
    use_macaron_style_in_conformer: bool = True
    use_cnn_in_conformer: bool = True
    conformer_enc_kernel_size: int = 7
    conformer_dec_kernel_size: int = 31
    duration_predictor_layers: int = 2
    duration_predictor_chans: int = 256
    duration_predictor_kernel_size: int = 3
    duration_predictor_dropout_rate: float = 0.1
    transformer_enc_dropout_rate: float = 0.2
    transformer_enc_positional_dropout_rate: float = 0.2
    transformer_enc_attn_dropout_rate: float = 0.2
    decoder_channels: Sequence[int] = (256, 256)
    decoder_dropout: float = 0.05
    decoder_attention_head_dim: int = 64
    decoder_n_blocks: int = 1
    decoder_num_mid_blocks: int = 2
    decoder_num_heads: int = 2
    decoder_act_fn: str = "snakebeta"
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
        self.encoder = ConformerEncoder(
            attention_dim=self.adim,
            attention_heads=self.aheads,
            linear_units=self.eunits,
            num_blocks=self.elayers,
            dropout_rate=self.transformer_enc_dropout_rate,
            positional_dropout_rate=self.transformer_enc_positional_dropout_rate,
            attention_dropout_rate=self.transformer_enc_attn_dropout_rate,
            input_layer="embed",
            idim=self.idim,
            normalize_before=self.encoder_normalize_before,
            positionwise_layer_type=self.positionwise_layer_type,
            positionwise_conv_kernel_size=self.positionwise_conv_kernel_size,
            macaron_style=self.use_macaron_style_in_conformer,
            pos_enc_layer_type=pos_enc_type,
            selfattention_layer_type=selfattn_type,
            activation_type=self.conformer_activation_type,
            use_cnn_module=self.use_cnn_in_conformer,
            cnn_module_kernel=self.conformer_enc_kernel_size,
            dtype=self.dtype,
            name="encoder",
        )
        if self.spks is not None and self.spks > 1:
            self.sid_emb = nn.Embed(self.spks, self.adim, name="sid_emb")
        if self.spk_embed_dim is not None and self.spk_embed_dim > 0:
            self.projection = nn.Dense(self.adim, dtype=self.dtype, name="projection")
        self.duration_predictor = DurationPredictor(
            n_layers=self.duration_predictor_layers,
            n_chans=self.duration_predictor_chans,
            kernel_size=self.duration_predictor_kernel_size,
            dropout_rate=self.duration_predictor_dropout_rate,
            dtype=self.dtype,
        )
        self.encoder_proj = nn.Dense(
            self.odim * self.reduction_factor, dtype=self.dtype, name="encoder_proj"
        )
        self.decoder = CFM(
            out_channels=self.odim * self.reduction_factor,
            channels=tuple(self.decoder_channels),
            dropout_rate=self.decoder_dropout,
            attention_head_dim=self.decoder_attention_head_dim,
            n_blocks=self.decoder_n_blocks,
            num_mid_blocks=self.decoder_num_mid_blocks,
            num_heads=self.decoder_num_heads,
            act_fn=self.decoder_act_fn,
            dtype=self.dtype,
            name="decoder",
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

    def encode(self, xs, ilens, spembs=None, sids=None, deterministic: bool = True):
        t_text = xs.shape[1]
        hs = self.encoder(xs, attn_mask(ilens, t_text), deterministic=deterministic)
        if self.spks is not None and self.spks > 1 and sids is not None:
            hs = hs + self.sid_emb(sids.reshape(-1))[:, None, :]
        if self.spk_embed_dim is not None and spembs is not None:
            hs = self._integrate_spembs(hs, spembs)
        return hs, sequence_mask(ilens, t_text)

    def __call__(
        self,
        xs: jnp.ndarray,
        ilens: jnp.ndarray,
        ys: jnp.ndarray,
        olens: jnp.ndarray,
        ds: jnp.ndarray,
        spembs: Optional[jnp.ndarray] = None,
        sids: Optional[jnp.ndarray] = None,
        deterministic: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """Training forward (reference matchatts.py:331-481)."""
        hs, d_masks = self.encode(xs, ilens, spembs, sids, deterministic)
        d_outs = self.duration_predictor(hs, d_masks, deterministic=deterministic)
        t_feats = ys.shape[1]
        hs = regulate_length(hs, ds, t_feats, d_masks)
        hs = self.encoder_proj(hs)

        # 2x down/upsampling in the U-Net: truncate lengths to even
        # (reference matchatts.py:453-457; arrays stay at the padded bucket
        # size, which is even by construction)
        olens_in = olens - olens % 2
        h_masks = sequence_mask(olens_in, t_feats, jnp.float32)
        cfm_loss, _ = self.decoder(
            ys * h_masks[..., None], h_masks, hs * h_masks[..., None],
            deterministic=deterministic,
        )
        return {
            "d_outs": d_outs,
            "ys": ys,
            "hs": hs,
            "olens_in": olens_in,
            "cfm_loss": cfm_loss,
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
        """Batched Euler-ODE inference (reference matchatts.py:483-614)."""
        hs, d_masks = self.encode(xs, ilens, spembs, sids, deterministic)
        d_log = self.duration_predictor(hs, d_masks, deterministic=deterministic)
        d_outs = predicted_durations_to_int(d_log, alpha) * d_masks.astype(jnp.int32)
        hs = regulate_length(hs, d_outs, max_t_feats, d_masks)
        hs = self.encoder_proj(hs)
        olens = jnp.minimum(jnp.maximum(jnp.sum(d_outs, axis=-1), 1), max_t_feats)
        olens = olens - olens % 2
        h_masks = sequence_mask(olens, max_t_feats, jnp.float32)
        feat_gen = self.decoder.inference(
            hs * h_masks[..., None], h_masks, n_timesteps, temperature
        )
        return {
            "feat_gen": feat_gen * h_masks[..., None],
            "duration": d_outs,
            "olens": olens,
        }
