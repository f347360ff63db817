"""Conformer encoder (TPU-native re-design of jatts/modules/conformer/).

Feature-last [B, T, C] layout throughout (XLA-preferred), explicit masks,
no mutated buffers. Layer ordering matches the reference EncoderLayer
(conformer/encoder_layer.py:78-180): macaron FFN -> rel-pos MHA -> conv
module -> FFN -> final LayerNorm, all pre-norm residual.

Submodule names mirror the reference state_dict keys so PyTorch checkpoint
import is a mechanical rename (see jatts_tpu/utils/torch_import.py).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from jatts_tpu.modules.attention import (
    LegacyRelPositionMultiHeadedAttention,
    MultiHeadedAttention,
    RelPositionMultiHeadedAttention,
)
from jatts_tpu.modules.positional import (
    LegacyRelPositionalEncoding,
    PositionalEncoding,
    RelPositionalEncoding,
    ScaledPositionalEncoding,
)


def resolve_rel_pos_types(
    rel_pos_type: str, pos_enc_layer_type: str, selfattention_layer_type: str
):
    """Reference rel-pos remap (models/fastspeech2.py:247-267, identically in
    matchatts/vits): with rel_pos_type="legacy" (the default — and every
    published recipe config leaves it there), "rel_pos"/"rel_selfattn" are
    silently remapped to the legacy variants. Mirrored so identical YAML
    gives identical semantics and checkpoints import faithfully."""
    if rel_pos_type == "legacy":
        if pos_enc_layer_type == "rel_pos":
            pos_enc_layer_type = "legacy_rel_pos"
        if selfattention_layer_type == "rel_selfattn":
            selfattention_layer_type = "legacy_rel_selfattn"
    elif rel_pos_type == "latest":
        assert pos_enc_layer_type != "legacy_rel_pos"
        assert selfattention_layer_type != "legacy_rel_selfattn"
    else:
        raise ValueError(f"Unknown rel_pos_type: {rel_pos_type}")
    return pos_enc_layer_type, selfattention_layer_type


def _activation(name: str):
    return {
        "swish": nn.silu,
        "relu": nn.relu,
        "hardtanh": lambda x: jnp.clip(x, -1.0, 1.0),
    }[name]


class MultiLayeredConv1d(nn.Module):
    """Two-conv positionwise FFN (reference transformer/multi_layer_conv.py:12-63)."""

    in_chans: int
    hidden_chans: int
    kernel_size: int
    dropout_rate: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask_t=None, deterministic: bool = True):
        x = nn.Conv(
            self.hidden_chans, (self.kernel_size,), padding="SAME",
            dtype=self.dtype, name="w_1",
        )(x)
        x = nn.relu(x)
        if pad_mask_t is not None:
            # w_1's bias makes padded rows nonzero; w_2 (k>1) must not read them
            x = x * pad_mask_t[..., None].astype(x.dtype)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return nn.Conv(
            self.in_chans, (self.kernel_size,), padding="SAME",
            dtype=self.dtype, name="w_2",
        )(x)


class PositionwiseFeedForward(nn.Module):
    """Linear FFN (reference transformer/positionwise_feed_forward.py:12)."""

    idim: int
    hidden_units: int
    dropout_rate: float
    activation: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden_units, dtype=self.dtype, name="w_1")(x)
        x = _activation(self.activation)(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return nn.Dense(self.idim, dtype=self.dtype, name="w_2")(x)


class ConvolutionModule(nn.Module):
    """Pointwise-GLU -> depthwise -> BN -> swish -> pointwise
    (reference conformer/convolution.py:13-80).

    Padding frames are zeroed before the depthwise conv so the conv itself
    never reads stale padding (the reference leaks padding through the
    conv). NOTE: train-mode BatchNorm still reduces over (B, T) INCLUDING
    the zeroed padding frames — same as the reference's nn.BatchNorm1d —
    so BN statistics (and therefore valid-frame outputs in training) do
    depend on the bucket's padding fraction; full padding-invariance would
    require masked BN, which would break reference parity.
    """

    channels: int
    kernel_size: int
    activation: str = "swish"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask_t: Optional[jnp.ndarray] = None, deterministic: bool = True):
        # x: [B, T, C]; pad_mask_t: [B, T] True on valid frames
        x = nn.Conv(2 * self.channels, (1,), dtype=self.dtype, name="pointwise_conv1")(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * nn.sigmoid(b)  # GLU over channel dim
        if pad_mask_t is not None:
            x = x * pad_mask_t[..., None].astype(x.dtype)
        x = nn.Conv(
            self.channels, (self.kernel_size,), padding="SAME",
            feature_group_count=self.channels, dtype=self.dtype, name="depthwise_conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=deterministic, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="norm",
        )(x)
        x = _activation(self.activation)(x)
        return nn.Conv(self.channels, (1,), dtype=self.dtype, name="pointwise_conv2")(x)


class EncoderLayer(nn.Module):
    """One conformer block (reference conformer/encoder_layer.py:15-180)."""

    size: int
    attention_heads: int
    linear_units: int
    dropout_rate: float
    attention_dropout_rate: float
    positionwise_layer_type: str = "conv1d"
    positionwise_conv_kernel_size: int = 3
    macaron_style: bool = True
    use_cnn_module: bool = True
    cnn_module_kernel: int = 7
    activation_type: str = "swish"
    normalize_before: bool = True
    selfattention_layer_type: str = "rel_selfattn"
    dtype: jnp.dtype = jnp.float32
    attn_backend: str = "xla"  # 'flash' = fused Pallas attention on TPU

    def _ffn(self, name):
        if self.positionwise_layer_type == "conv1d":
            return MultiLayeredConv1d(
                self.size, self.linear_units, self.positionwise_conv_kernel_size,
                self.dropout_rate, dtype=self.dtype, name=name,
            )
        return PositionwiseFeedForward(
            self.size, self.linear_units, self.dropout_rate,
            self.activation_type, dtype=self.dtype, name=name,
        )

    @nn.compact
    def __call__(self, x, pos_emb, mask, pad_mask_t=None, deterministic: bool = True):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)
        drop = nn.Dropout(self.dropout_rate)
        ff_scale = 0.5 if self.macaron_style else 1.0
        # zero padded frames after each sub-block so the k>1 convs (FFN
        # conv1d, depthwise) never read stale padding — makes outputs
        # batch-layout invariant (the torch reference leaks padding here)
        zero_pad = (
            (lambda t: t * pad_mask_t[..., None].astype(t.dtype))
            if pad_mask_t is not None
            else (lambda t: t)
        )

        def ffn_call(name, h):
            mod = self._ffn(name)
            if self.positionwise_layer_type == "conv1d":
                return mod(h, pad_mask_t, deterministic=deterministic)
            return mod(h, deterministic=deterministic)

        if self.macaron_style:
            residual = x
            h = ln("norm_ff_macaron")(x) if self.normalize_before else x
            # LN(0) = bias != 0 on padded rows — re-mask before the k>1 conv
            h = ffn_call("feed_forward_macaron", zero_pad(h))
            x = residual + ff_scale * drop(h, deterministic=deterministic)
            if not self.normalize_before:  # post-norm after the residual
                x = ln("norm_ff_macaron")(x)  # (reference encoder_layer.py:124)
            x = zero_pad(x)

        residual = x
        h = ln("norm_mha")(x) if self.normalize_before else x
        if self.selfattention_layer_type == "rel_selfattn":
            att = RelPositionMultiHeadedAttention(
                self.attention_heads, self.size, self.attention_dropout_rate,
                dtype=self.dtype, attn_backend=self.attn_backend,
                name="self_attn",
            )(h, h, h, pos_emb, mask, deterministic=deterministic)
        elif self.selfattention_layer_type == "legacy_rel_selfattn":
            att = LegacyRelPositionMultiHeadedAttention(
                self.attention_heads, self.size, self.attention_dropout_rate,
                dtype=self.dtype, attn_backend=self.attn_backend,
                name="self_attn",
            )(h, h, h, pos_emb, mask, deterministic=deterministic)
        else:
            att = MultiHeadedAttention(
                self.attention_heads, self.size, self.attention_dropout_rate,
                dtype=self.dtype, attn_backend=self.attn_backend,
                name="self_attn",
            )(h, h, h, mask, deterministic=deterministic)
        x = residual + drop(att, deterministic=deterministic)
        if not self.normalize_before:
            x = ln("norm_mha")(x)  # post-norm (reference encoder_layer.py:148)
        x = zero_pad(x)

        if self.use_cnn_module:
            residual = x
            h = ln("norm_conv")(x) if self.normalize_before else x
            h = ConvolutionModule(
                self.size, self.cnn_module_kernel, self.activation_type,
                dtype=self.dtype, name="conv_module",
            )(h, pad_mask_t, deterministic=deterministic)
            x = residual + drop(h, deterministic=deterministic)
            if not self.normalize_before:
                x = ln("norm_conv")(x)  # post-norm (reference :160)

        residual = x
        h = ln("norm_ff")(x) if self.normalize_before else x
        h = ffn_call("feed_forward", zero_pad(h))
        x = residual + ff_scale * drop(h, deterministic=deterministic)
        if not self.normalize_before:
            x = ln("norm_ff")(x)  # post-norm (reference :170)
        x = zero_pad(x)

        if self.use_cnn_module:
            x = ln("norm_final")(x)
        return zero_pad(x)


class ConformerEncoder(nn.Module):
    """Conformer stack (reference conformer/encoder.py:31-289).

    input_layer: "embed" (token ids), "linear", or None (features in = adim).
    """

    attention_dim: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    input_layer: Optional[str] = "embed"
    idim: int = 0  # vocab size for "embed" / input feature dim for "linear"
    normalize_before: bool = True
    positionwise_layer_type: str = "conv1d"
    positionwise_conv_kernel_size: int = 3
    macaron_style: bool = True
    pos_enc_layer_type: str = "rel_pos"
    selfattention_layer_type: str = "rel_selfattn"
    activation_type: str = "swish"
    use_cnn_module: bool = True
    cnn_module_kernel: int = 7
    padding_idx: int = 0
    dtype: jnp.dtype = jnp.float32
    attn_backend: str = "xla"  # 'flash' = fused Pallas attention on TPU

    @nn.compact
    def __call__(self, xs, mask=None, pad_mask_t=None, deterministic: bool = True):
        """xs: [B, T] int tokens (embed) or [B, T, C] features.
        mask: [B, 1, T] attention key mask. pad_mask_t: [B, T] frame validity.
        Returns [B, T, attention_dim]."""
        if self.input_layer == "embed":
            h = nn.Embed(
                self.idim, self.attention_dim,
                embedding_init=nn.initializers.normal(1.0), name="embed_tok",
            )(xs)
        elif self.input_layer == "linear":
            h = nn.Dense(self.attention_dim, dtype=self.dtype, name="embed_lin")(xs)
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="embed_ln")(h)
            h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        else:
            h = xs
        h = h.astype(self.dtype)

        if self.pos_enc_layer_type == "rel_pos":
            h, pos_emb = RelPositionalEncoding(
                self.attention_dim, self.positional_dropout_rate,
                dtype=self.dtype, name="pos_enc",
            )(h, deterministic=deterministic)
        elif self.pos_enc_layer_type == "legacy_rel_pos":
            h, pos_emb = LegacyRelPositionalEncoding(
                self.attention_dim, self.positional_dropout_rate,
                dtype=self.dtype, name="pos_enc",
            )(h, deterministic=deterministic)
        elif self.pos_enc_layer_type == "scaled_abs_pos":
            h = ScaledPositionalEncoding(
                self.attention_dim, self.positional_dropout_rate,
                dtype=self.dtype, name="pos_enc",
            )(h, deterministic=deterministic)
            pos_emb = None
        else:
            h = PositionalEncoding(
                self.attention_dim, self.positional_dropout_rate,
                dtype=self.dtype, name="pos_enc",
            )(h, deterministic=deterministic)
            pos_emb = None

        if pad_mask_t is None and mask is not None:
            pad_mask_t = mask[:, 0, :]
        if pad_mask_t is not None:
            h = h * pad_mask_t[..., None].astype(h.dtype)

        for i in range(self.num_blocks):
            h = EncoderLayer(
                self.attention_dim, self.attention_heads, self.linear_units,
                self.dropout_rate, self.attention_dropout_rate,
                self.positionwise_layer_type, self.positionwise_conv_kernel_size,
                self.macaron_style, self.use_cnn_module, self.cnn_module_kernel,
                self.activation_type, self.normalize_before,
                self.selfattention_layer_type, dtype=self.dtype,
                attn_backend=self.attn_backend, name=f"encoders_{i}",
            )(h, pos_emb, mask, pad_mask_t, deterministic=deterministic)

        if self.normalize_before:
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="after_norm")(h)
        return h
