"""Checkpoint-import parity: our flax ConformerEncoder vs a torch replica of
the reference's ESPnet-style conformer (rel-pos attention + conv module +
macaron FFN), weights transferred through utils/torch_import.py."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from jatts_tpu.modules.conformer import ConformerEncoder
from jatts_tpu.utils.torch_import import convert_conformer_encoder

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


class TRelPosMHA(tnn.Module):
    """Torch replica of reference RelPositionMultiHeadedAttention
    (attention.py:209-305)."""

    def __init__(self, h, d):
        super().__init__()
        self.h, self.d_k = h, d // h
        self.linear_q = tnn.Linear(d, d)
        self.linear_k = tnn.Linear(d, d)
        self.linear_v = tnn.Linear(d, d)
        self.linear_out = tnn.Linear(d, d)
        self.linear_pos = tnn.Linear(d, d, bias=False)
        self.pos_bias_u = tnn.Parameter(torch.randn(h, self.d_k) * 0.1)
        self.pos_bias_v = tnn.Parameter(torch.randn(h, self.d_k) * 0.1)

    def rel_shift(self, x):
        zero_pad = torch.zeros((*x.size()[:3], 1), dtype=x.dtype)
        x_padded = torch.cat([zero_pad, x], dim=-1)
        x_padded = x_padded.view(*x.size()[:2], x.size(3) + 1, x.size(2))
        return x_padded[:, :, 1:].view_as(x)[:, :, :, : x.size(-1) // 2 + 1]

    def forward(self, x, pos_emb, mask):
        b, t, _ = x.shape
        q = self.linear_q(x).view(b, t, self.h, self.d_k)
        k = self.linear_k(x).view(b, t, self.h, self.d_k).transpose(1, 2)
        v = self.linear_v(x).view(b, t, self.h, self.d_k).transpose(1, 2)
        p = self.linear_pos(pos_emb).view(pos_emb.size(0), -1, self.h, self.d_k).transpose(1, 2)
        q_u = (q + self.pos_bias_u).transpose(1, 2)
        q_v = (q + self.pos_bias_v).transpose(1, 2)
        ac = torch.matmul(q_u, k.transpose(-2, -1))
        bd = self.rel_shift(torch.matmul(q_v, p.transpose(-2, -1)))
        scores = (ac + bd) / math.sqrt(self.d_k)
        if mask is not None:
            scores = scores.masked_fill(~mask.unsqueeze(1), -1e9)
        attn = scores.softmax(-1)
        if mask is not None:
            attn = attn.masked_fill(~mask.unsqueeze(1), 0.0)
        o = torch.matmul(attn, v).transpose(1, 2).reshape(b, t, -1)
        return self.linear_out(o)


class TConvModule(tnn.Module):
    """reference conformer/convolution.py:13-80."""

    def __init__(self, ch, k):
        super().__init__()
        self.pointwise_conv1 = tnn.Conv1d(ch, 2 * ch, 1)
        self.depthwise_conv = tnn.Conv1d(ch, ch, k, padding=(k - 1) // 2, groups=ch)
        self.norm = tnn.BatchNorm1d(ch)
        self.pointwise_conv2 = tnn.Conv1d(ch, ch, 1)

    def forward(self, x):
        x = x.transpose(1, 2)
        x = F.glu(self.pointwise_conv1(x), dim=1)
        x = self.depthwise_conv(x)
        x = self.norm(x)
        x = x * torch.sigmoid(x)  # swish
        x = self.pointwise_conv2(x)
        return x.transpose(1, 2)


class TFFNConv(tnn.Module):
    """reference transformer/multi_layer_conv.py MultiLayeredConv1d."""

    def __init__(self, d, h, k):
        super().__init__()
        self.w_1 = tnn.Conv1d(d, h, k, padding=(k - 1) // 2)
        self.w_2 = tnn.Conv1d(h, d, k, padding=(k - 1) // 2)

    def forward(self, x):
        x = torch.relu(self.w_1(x.transpose(-1, 1))).transpose(-1, 1)
        return self.w_2(x.transpose(-1, 1)).transpose(-1, 1)


class TLayer(tnn.Module):
    """reference conformer/encoder_layer.py:78-180 (pre-norm, macaron)."""

    def __init__(self, d, h, ff, k):
        super().__init__()
        self.feed_forward_macaron = TFFNConv(d, ff, 3)
        self.norm_ff_macaron = tnn.LayerNorm(d)
        self.self_attn = TRelPosMHA(h, d)
        self.norm_mha = tnn.LayerNorm(d)
        self.conv_module = TConvModule(d, k)
        self.norm_conv = tnn.LayerNorm(d)
        self.feed_forward = TFFNConv(d, ff, 3)
        self.norm_ff = tnn.LayerNorm(d)
        self.norm_final = tnn.LayerNorm(d)

    def forward(self, x, pos_emb, mask):
        x = x + 0.5 * self.feed_forward_macaron(self.norm_ff_macaron(x))
        x = x + self.self_attn(self.norm_mha(x), pos_emb, mask)
        x = x + self.conv_module(self.norm_conv(x))
        x = x + 0.5 * self.feed_forward(self.norm_ff(x))
        return self.norm_final(x)


class TEncoder(tnn.Module):
    def __init__(self, vocab, d, h, ff, k, n):
        super().__init__()
        self.d = d
        self.embed = tnn.Sequential(tnn.Embedding(vocab, d, padding_idx=0))
        self.encoders = tnn.ModuleList([TLayer(d, h, ff, k) for _ in range(n)])
        self.after_norm = tnn.LayerNorm(d)

    def _pos_emb(self, t):
        """reference RelPositionalEncoding (positional_encoding.py:238-309)."""
        pos = torch.arange(t, dtype=torch.float32).unsqueeze(1)
        div = torch.exp(
            torch.arange(0, self.d, 2, dtype=torch.float32) * -(math.log(10000.0) / self.d)
        )
        pe_pos = torch.zeros(t, self.d)
        pe_pos[:, 0::2] = torch.sin(pos * div)
        pe_pos[:, 1::2] = torch.cos(pos * div)
        pe_neg = torch.zeros(t, self.d)
        pe_neg[:, 0::2] = torch.sin(-pos * div)
        pe_neg[:, 1::2] = torch.cos(-pos * div)
        return torch.cat([pe_pos.flip(0), pe_neg[1:]], dim=0).unsqueeze(0)

    def forward(self, xs, mask):
        x = self.embed(xs) * math.sqrt(self.d)
        pos_emb = self._pos_emb(x.size(1))
        for layer in self.encoders:
            x = layer(x, pos_emb, mask)
        return self.after_norm(x)


def test_conformer_import_parity():
    torch.manual_seed(0)
    vocab, d, h, ff, k, n = 20, 32, 2, 64, 7, 2
    tenc = TEncoder(vocab, d, h, ff, k, n).eval()
    sd = {kk: v.detach().numpy() for kk, v in tenc.state_dict().items()}
    sd_p = {f"enc.{kk}": v for kk, v in sd.items()}
    params, batch_stats = convert_conformer_encoder(
        sd_p, "enc", n, has_embed=True, macaron=True, use_cnn=True
    )

    rng = np.random.default_rng(0)
    xs = rng.integers(1, vocab, (2, 11))
    tmask = torch.ones(2, 11, dtype=torch.bool)
    with torch.no_grad():
        want = tenc(torch.from_numpy(xs), tmask.unsqueeze(1)).numpy()

    jenc = ConformerEncoder(
        attention_dim=d, attention_heads=h, linear_units=ff, num_blocks=n,
        dropout_rate=0.0, positional_dropout_rate=0.0, attention_dropout_rate=0.0,
        input_layer="embed", idim=vocab, cnn_module_kernel=k,
    )
    variables = {"params": params, "batch_stats": batch_stats}
    mask = jnp.array(tmask.numpy())[:, None, :]
    got = np.asarray(
        jenc.apply(variables, jnp.array(xs), mask, deterministic=True)
    )
    # exact parity on unpadded inputs (the reference's conv stacks leak
    # padding, so its padded-batch outputs are batch-layout-dependent; ours
    # are not — checked below)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    # padding invariance of our encoder: same utterance, extra padding ->
    # identical valid-frame outputs (attention is exact; conv boundary
    # effects are masked)
    xs1 = jnp.array(xs[:1, :8])
    m1 = jnp.ones((1, 1, 8), bool)
    out_short = np.asarray(jenc.apply(variables, xs1, m1, deterministic=True))
    xs_pad = jnp.concatenate([xs1, jnp.zeros((1, 5), xs1.dtype)], axis=1)
    m_pad = jnp.concatenate([m1, jnp.zeros((1, 1, 5), bool)], axis=2)
    out_pad = np.asarray(jenc.apply(variables, xs_pad, m_pad, deterministic=True))
    np.testing.assert_allclose(out_pad[:, :8], out_short, rtol=2e-3, atol=1e-4)
