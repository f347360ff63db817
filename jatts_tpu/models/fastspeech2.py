"""FastSpeech2 (TPU-native re-design of jatts/models/fastspeech2.py:30-795).

NAR mel model with external (forced-aligner) durations and token-averaged
pitch/energy. Conformer encoder -> variance adaptor -> matmul length
regulator -> conformer decoder -> linear feat_out -> postnet residual.

Differences from the reference, by design (TPU-first):
  * length regulation is a duration-assignment matmul (ops/upsample.py), not
    per-utterance repeat_interleave — static shapes, runs on the MXU;
  * batched inference with a static max_t_feats and masks, instead of B=1
    python loops;
  * dropout/batch-norm handled functionally (rngs / mutable batch_stats).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from jatts_tpu.modules.conformer import ConformerEncoder, resolve_rel_pos_types
from jatts_tpu.modules.predictors import DurationPredictor, VariancePredictor
from jatts_tpu.modules.prenet_postnet import Postnet
from jatts_tpu.ops.masks import attn_mask, sequence_mask
from jatts_tpu.ops.upsample import predicted_durations_to_int, regulate_length


class FastSpeech2(nn.Module):
    idim: int  # vocabulary size
    odim: int = 80
    adim: int = 384
    aheads: int = 2
    elayers: int = 4
    eunits: int = 1536
    dlayers: int = 4
    dunits: int = 1536
    positionwise_layer_type: str = "conv1d"
    positionwise_conv_kernel_size: int = 3
    encoder_type: str = "conformer"
    decoder_type: str = "conformer"
    encoder_normalize_before: bool = True
    decoder_normalize_before: bool = True
    reduction_factor: int = 1
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
    pitch_predictor_layers: int = 5
    pitch_predictor_chans: int = 256
    pitch_predictor_kernel_size: int = 5
    pitch_predictor_dropout: float = 0.5
    pitch_embed_kernel_size: int = 1
    pitch_embed_dropout: float = 0.0
    stop_gradient_from_pitch_predictor: bool = True
    energy_predictor_layers: int = 2
    energy_predictor_chans: int = 256
    energy_predictor_kernel_size: int = 3
    energy_predictor_dropout: float = 0.5
    energy_embed_kernel_size: int = 1
    energy_embed_dropout: float = 0.0
    stop_gradient_from_energy_predictor: bool = False
    postnet_layers: int = 5
    postnet_chans: int = 256
    postnet_filts: int = 5
    postnet_dropout_rate: float = 0.5
    transformer_enc_dropout_rate: float = 0.2
    transformer_enc_positional_dropout_rate: float = 0.2
    transformer_enc_attn_dropout_rate: float = 0.2
    transformer_dec_dropout_rate: float = 0.2
    transformer_dec_positional_dropout_rate: float = 0.2
    transformer_dec_attn_dropout_rate: float = 0.2
    spk_embed_dim: Optional[int] = None
    spk_embed_integration_type: str = "add"
    spks: Optional[int] = None
    use_masking: bool = True
    use_batch_norm: bool = True
    init_type: str = "xavier_uniform"
    # 'flash' = fused Pallas attention on TPU (skips attention-prob dropout)
    attn_backend: str = "xla"
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
            attn_backend=self.attn_backend,
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
        self.pitch_predictor = VariancePredictor(
            n_layers=self.pitch_predictor_layers,
            n_chans=self.pitch_predictor_chans,
            kernel_size=self.pitch_predictor_kernel_size,
            dropout_rate=self.pitch_predictor_dropout,
            dtype=self.dtype,
        )
        self.pitch_embed_conv = nn.Conv(
            self.adim, (self.pitch_embed_kernel_size,), padding="SAME",
            dtype=self.dtype, name="pitch_embed",
        )
        self.energy_predictor = VariancePredictor(
            n_layers=self.energy_predictor_layers,
            n_chans=self.energy_predictor_chans,
            kernel_size=self.energy_predictor_kernel_size,
            dropout_rate=self.energy_predictor_dropout,
            dtype=self.dtype,
        )
        self.energy_embed_conv = nn.Conv(
            self.adim, (self.energy_embed_kernel_size,), padding="SAME",
            dtype=self.dtype, name="energy_embed",
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
            positionwise_layer_type=self.positionwise_layer_type,
            positionwise_conv_kernel_size=self.positionwise_conv_kernel_size,
            macaron_style=self.use_macaron_style_in_conformer,
            pos_enc_layer_type=pos_enc_type,
            selfattention_layer_type=selfattn_type,
            activation_type=self.conformer_activation_type,
            use_cnn_module=self.use_cnn_in_conformer,
            cnn_module_kernel=self.conformer_dec_kernel_size,
            dtype=self.dtype,
            attn_backend=self.attn_backend,
            name="decoder",
        )
        self.feat_out = nn.Dense(
            self.odim * self.reduction_factor, dtype=self.dtype, name="feat_out"
        )
        if self.postnet_layers > 0:
            self.postnet = Postnet(
                odim=self.odim,
                n_layers=self.postnet_layers,
                n_chans=self.postnet_chans,
                n_filts=self.postnet_filts,
                dropout_rate=self.postnet_dropout_rate,
                use_batch_norm=self.use_batch_norm,
                dtype=self.dtype,
                name="postnet",
            )

    def _integrate_spembs(self, hs, spembs):
        """reference _integrate_with_spk_embed (fastspeech2.py:737-761)."""
        spembs = spembs / jnp.maximum(
            jnp.linalg.norm(spembs, axis=-1, keepdims=True), 1e-12
        )
        if self.spk_embed_integration_type == "add":
            return hs + self.projection(spembs)[:, None, :]
        spembs_e = jnp.broadcast_to(
            spembs[:, None, :], (hs.shape[0], hs.shape[1], spembs.shape[-1])
        )
        return self.projection(jnp.concatenate([hs, spembs_e], axis=-1))

    def encode(
        self, xs, ilens, spembs=None, sids=None, deterministic: bool = True
    ):
        """Shared encoder trunk -> (hs, d_masks)."""
        t_text = xs.shape[1]
        x_masks = attn_mask(ilens, t_text)
        hs = self.encoder(xs, x_masks, deterministic=deterministic)
        if self.spks is not None and self.spks > 1 and sids is not None:
            hs = hs + self.sid_emb(sids.reshape(-1))[:, None, :]
        if self.spk_embed_dim is not None and spembs is not None:
            hs = self._integrate_spembs(hs, spembs)
        d_masks = sequence_mask(ilens, t_text)
        return hs, d_masks

    def __call__(
        self,
        xs: jnp.ndarray,          # [B, T_text] token ids
        ilens: jnp.ndarray,       # [B]
        ys: jnp.ndarray,          # [B, T_feats, odim]
        olens: jnp.ndarray,       # [B]
        ds: jnp.ndarray,          # [B, T_text] int durations
        ps: jnp.ndarray,          # [B, T_text, 1] token-avg pitch
        es: jnp.ndarray,          # [B, T_text, 1] token-avg energy
        spembs: Optional[jnp.ndarray] = None,
        sids: Optional[jnp.ndarray] = None,
        deterministic: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """Training forward (reference forward/_forward,
        fastspeech2.py:473-653). Returns dict with before/after outs and
        variance predictions."""
        hs, d_masks = self.encode(xs, ilens, spembs, sids, deterministic)

        p_in = jax.lax.stop_gradient(hs) if self.stop_gradient_from_pitch_predictor else hs
        p_outs = self.pitch_predictor(p_in, d_masks[..., None], deterministic=deterministic)
        e_in = jax.lax.stop_gradient(hs) if self.stop_gradient_from_energy_predictor else hs
        e_outs = self.energy_predictor(e_in, d_masks[..., None], deterministic=deterministic)
        d_outs = self.duration_predictor(hs, d_masks, deterministic=deterministic)

        hs = hs + self.energy_embed_conv(es) + self.pitch_embed_conv(ps)
        t_feats = ys.shape[1]
        hs = regulate_length(hs, ds, t_feats, d_masks)

        h_masks = attn_mask(olens, t_feats)
        zs = self.decoder(hs, h_masks, deterministic=deterministic)
        before_outs = self.feat_out(zs).reshape(zs.shape[0], -1, self.odim)
        if self.postnet_layers > 0:
            after_outs = before_outs + self.postnet(before_outs, deterministic=deterministic)
        else:
            after_outs = None
        return {
            "before_outs": before_outs,
            "after_outs": after_outs,
            "d_outs": d_outs,
            "p_outs": p_outs,
            "e_outs": e_outs,
            "ys": ys,
            "olens": olens,
        }

    def inference(
        self,
        xs: jnp.ndarray,          # [B, T_text]
        ilens: jnp.ndarray,       # [B]
        max_t_feats: int,
        spembs: Optional[jnp.ndarray] = None,
        sids: Optional[jnp.ndarray] = None,
        alpha: float = 1.0,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """Batched jittable inference with static output capacity
        (reference inference, fastspeech2.py:655-735 — B=1 loop there).

        Returns feat_gen [B, max_t_feats, odim], durations, olens mask info.
        """
        hs, d_masks = self.encode(xs, ilens, spembs, sids, deterministic)
        p_outs = self.pitch_predictor(hs, d_masks[..., None], deterministic=deterministic)
        e_outs = self.energy_predictor(hs, d_masks[..., None], deterministic=deterministic)
        d_log = self.duration_predictor(hs, d_masks, deterministic=deterministic)
        d_outs = predicted_durations_to_int(d_log, alpha) * d_masks.astype(jnp.int32)

        hs = hs + self.energy_embed_conv(e_outs) + self.pitch_embed_conv(p_outs)
        hs = regulate_length(hs, d_outs, max_t_feats, d_masks)
        olens = jnp.minimum(jnp.sum(d_outs, axis=-1), max_t_feats)

        h_masks = attn_mask(olens, max_t_feats)
        zs = self.decoder(hs, h_masks, deterministic=deterministic)
        before_outs = self.feat_out(zs).reshape(zs.shape[0], -1, self.odim)
        if self.postnet_layers > 0:
            outs = before_outs + self.postnet(before_outs, deterministic=deterministic)
        else:
            outs = before_outs
        outs = outs * sequence_mask(olens, max_t_feats, outs.dtype)[..., None]
        return {
            "feat_gen": outs,
            "duration": d_outs,
            "pitch": p_outs,
            "energy": e_outs,
            "olens": olens,
        }
