"""VITS submodules: text encoder, posterior encoder, residual coupling flow
(reference jatts/modules/vits/). Feature-last [B, T, C] throughout.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from jatts_tpu.modules.conformer import ConformerEncoder
from jatts_tpu.modules.wavenet import WaveNet
from jatts_tpu.ops.masks import sequence_mask


class TextEncoder(nn.Module):
    """Embed -> conformer -> proj to (m, logs)
    (reference vits/text_encoder.py:33-140)."""

    vocabs: int
    attention_dim: int = 192
    attention_heads: int = 2
    linear_units: int = 768
    blocks: int = 6
    positionwise_conv_kernel_size: int = 3
    use_macaron_style: bool = False
    use_conformer_conv: bool = False
    conformer_kernel_size: int = 7
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.0
    attention_dropout_rate: float = 0.0
    pos_enc_layer_type: str = "rel_pos"
    selfattention_layer_type: str = "rel_selfattn"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, ilens, deterministic: bool = True):
        t_text = xs.shape[1]
        emb = nn.Embed(
            self.vocabs, self.attention_dim,
            embedding_init=nn.initializers.normal(self.attention_dim**-0.5),
            name="emb",
        )(xs)
        # NOTE: conformer's RelPositionalEncoding multiplies by sqrt(d) itself,
        # and the reference also pre-scales by sqrt(d) (text_encoder.py:126) —
        # net effect there is emb * d. We keep a single sqrt(d) scaling inside
        # the encoder plus this pre-scale for behavioral parity.
        emb = emb * jnp.sqrt(jnp.asarray(self.attention_dim, emb.dtype))
        mask = sequence_mask(ilens, t_text)
        h = ConformerEncoder(
            attention_dim=self.attention_dim,
            attention_heads=self.attention_heads,
            linear_units=self.linear_units,
            num_blocks=self.blocks,
            dropout_rate=self.dropout_rate,
            positional_dropout_rate=self.positional_dropout_rate,
            attention_dropout_rate=self.attention_dropout_rate,
            input_layer=None,
            positionwise_conv_kernel_size=self.positionwise_conv_kernel_size,
            macaron_style=self.use_macaron_style,
            use_cnn_module=self.use_conformer_conv,
            cnn_module_kernel=self.conformer_kernel_size,
            pos_enc_layer_type=self.pos_enc_layer_type,
            selfattention_layer_type=self.selfattention_layer_type,
            dtype=self.dtype,
            name="encoder",
        )(emb, mask[:, None, :], deterministic=deterministic)
        mask_f = mask[..., None].astype(h.dtype)
        stats = nn.Conv(self.attention_dim * 2, (1,), dtype=self.dtype, name="proj")(h)
        stats = stats * mask_f
        m, logs = jnp.split(stats, 2, axis=-1)
        return h, m, logs, mask_f


class PosteriorEncoder(nn.Module):
    """conv1x1 -> WaveNet -> proj -> reparam sample
    (reference vits/posterior_encoder.py:18-115)."""

    out_channels: int = 192
    hidden_channels: int = 192
    kernel_size: int = 5
    layers: int = 16
    stacks: int = 1
    base_dilation: int = 1
    global_channels: int = -1
    dropout_rate: float = 0.0
    use_weight_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ys, olens, g=None, deterministic: bool = True):
        # ys: [B, T_feats, odim]; g: [B, 1, C_g] or None
        t = ys.shape[1]
        mask = sequence_mask(olens, t, jnp.float32)[..., None]
        h = nn.Conv(self.hidden_channels, (1,), dtype=self.dtype, name="input_conv")(ys)
        h = h * mask
        h = WaveNet(
            kernel_size=self.kernel_size,
            layers=self.layers,
            stacks=self.stacks,
            base_dilation=self.base_dilation,
            residual_channels=self.hidden_channels,
            gate_channels=self.hidden_channels * 2,
            skip_channels=self.hidden_channels,
            global_channels=self.global_channels,
            dropout_rate=self.dropout_rate,
            use_weight_norm=self.use_weight_norm,
            dtype=self.dtype,
            name="encoder",
        )(h, mask, g, deterministic=deterministic)
        stats = nn.Conv(self.out_channels * 2, (1,), dtype=self.dtype, name="proj")(h)
        stats = stats * mask
        m, logs = jnp.split(stats, 2, axis=-1)
        eps = jax.random.normal(self.make_rng("noise"), m.shape, dtype=m.dtype)
        z = (m + eps * jnp.exp(logs)) * mask
        return z, m, logs, mask


class ResidualAffineCouplingLayer(nn.Module):
    """Half-channel affine coupling with WaveNet conditioning, zero-init proj
    (reference vits/residual_coupling.py:110-227)."""

    half_channels: int
    hidden_channels: int = 192
    kernel_size: int = 5
    base_dilation: int = 1
    layers: int = 4
    global_channels: int = -1
    dropout_rate: float = 0.0
    use_weight_norm: bool = True
    use_only_mean: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_mask, g=None, inverse: bool = False, deterministic: bool = True):
        xa, xb = jnp.split(x, 2, axis=-1)
        h = nn.Conv(self.hidden_channels, (1,), dtype=self.dtype, name="input_conv")(xa)
        h = h * x_mask
        h = WaveNet(
            kernel_size=self.kernel_size,
            layers=self.layers,
            stacks=1,
            base_dilation=self.base_dilation,
            residual_channels=self.hidden_channels,
            gate_channels=self.hidden_channels * 2,
            skip_channels=self.hidden_channels,
            global_channels=self.global_channels,
            dropout_rate=self.dropout_rate,
            use_weight_norm=self.use_weight_norm,
            dtype=self.dtype,
            name="encoder",
        )(h, x_mask, g, deterministic=deterministic)
        out_ch = self.half_channels if self.use_only_mean else self.half_channels * 2
        stats = nn.Conv(
            out_ch, (1,), kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, dtype=self.dtype, name="proj",
        )(h)
        stats = stats * x_mask
        if self.use_only_mean:
            m = stats
            logs = jnp.zeros_like(m)
        else:
            m, logs = jnp.split(stats, 2, axis=-1)
        if not inverse:
            xb = m + xb * jnp.exp(logs) * x_mask
            logdet = jnp.sum(logs, axis=(1, 2))
            return jnp.concatenate([xa, xb], axis=-1), logdet
        xb = (xb - m) * jnp.exp(-logs) * x_mask
        return jnp.concatenate([xa, xb], axis=-1)


class ResidualAffineCouplingBlock(nn.Module):
    """N x (coupling + flip) (reference vits/residual_coupling.py:18-107)."""

    in_channels: int = 192
    hidden_channels: int = 192
    flows: int = 4
    kernel_size: int = 5
    base_dilation: int = 1
    layers: int = 4
    global_channels: int = -1
    dropout_rate: float = 0.0
    use_weight_norm: bool = True
    use_only_mean: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.coupling_layers = [
            ResidualAffineCouplingLayer(
                half_channels=self.in_channels // 2,
                hidden_channels=self.hidden_channels,
                kernel_size=self.kernel_size,
                base_dilation=self.base_dilation,
                layers=self.layers,
                global_channels=self.global_channels,
                dropout_rate=self.dropout_rate,
                use_weight_norm=self.use_weight_norm,
                use_only_mean=self.use_only_mean,
                dtype=self.dtype,
                name=f"flows_{2 * i}",
            )
            for i in range(self.flows)
        ]

    def __call__(self, x, x_mask, g=None, inverse: bool = False, deterministic: bool = True):
        if not inverse:
            for layer in self.coupling_layers:
                x, _ = layer(x, x_mask, g, inverse=False, deterministic=deterministic)
                x = x[..., ::-1]  # FlipFlow (reference flow.py:17)
        else:
            for layer in reversed(self.coupling_layers):
                x = x[..., ::-1]
                x = layer(x, x_mask, g, inverse=True, deterministic=deterministic)
        return x
