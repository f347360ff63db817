"""Torch replicas of the reference's modules (built from the equations in
jatts/modules/*, used only to verify checkpoint-import parity in tests)."""

import math

import torch
import torch.nn as tnn
import torch.nn.functional as F


class TRelPosMHA(tnn.Module):
    """reference transformer/attention.py:209-305."""

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
        x = x * torch.sigmoid(x)
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


def rel_pos_emb(t, d):
    """reference RelPositionalEncoding (positional_encoding.py:238-309)."""
    pos = torch.arange(t, dtype=torch.float32).unsqueeze(1)
    div = torch.exp(
        torch.arange(0, d, 2, dtype=torch.float32) * -(math.log(10000.0) / d)
    )
    pe_pos = torch.zeros(t, d)
    pe_pos[:, 0::2] = torch.sin(pos * div)
    pe_pos[:, 1::2] = torch.cos(pos * div)
    pe_neg = torch.zeros(t, d)
    pe_neg[:, 0::2] = torch.sin(-pos * div)
    pe_neg[:, 1::2] = torch.cos(-pos * div)
    return torch.cat([pe_pos.flip(0), pe_neg[1:]], dim=0).unsqueeze(0)


class TConformer(tnn.Module):
    """reference conformer Encoder; input_layer 'embed' or None."""

    def __init__(self, d, h, ff, k, n, vocab=None):
        super().__init__()
        self.d = d
        if vocab is not None:
            self.embed = tnn.Sequential(tnn.Embedding(vocab, d, padding_idx=0))
        else:
            self.embed = None
        self.encoders = tnn.ModuleList([TLayer(d, h, ff, k) for _ in range(n)])
        self.after_norm = tnn.LayerNorm(d)

    def forward(self, xs, mask):
        x = self.embed(xs) if self.embed is not None else xs
        x = x * math.sqrt(self.d)
        pos_emb = rel_pos_emb(x.size(1), self.d)
        for layer in self.encoders:
            x = layer(x, pos_emb, mask)
        return self.after_norm(x)


class TPredictor(tnn.Module):
    """conv-relu-LN(channel)-dropout stack + linear (reference predictors)."""

    def __init__(self, idim, n_layers, n_chans, k):
        super().__init__()
        self.conv = tnn.ModuleList()
        for i in range(n_layers):
            in_ch = idim if i == 0 else n_chans

            class LN1(tnn.LayerNorm):
                def forward(self, x):
                    return super().forward(x.transpose(1, -1)).transpose(1, -1)

            self.conv += [
                tnn.Sequential(
                    tnn.Conv1d(in_ch, n_chans, k, padding=(k - 1) // 2),
                    tnn.ReLU(),
                    LN1(n_chans),
                    tnn.Dropout(0.0),
                )
            ]
        self.linear = tnn.Linear(n_chans, 1)

    def forward(self, xs):
        xs = xs.transpose(1, -1)
        for f in self.conv:
            xs = f(xs)
        return self.linear(xs.transpose(1, -1))


class TPostnet(tnn.Module):
    """reference pre_postnets.py:69-185."""

    def __init__(self, odim, n_layers, n_chans, n_filts):
        super().__init__()
        self.postnet = tnn.ModuleList()
        for i in range(n_layers - 1):
            ich = odim if i == 0 else n_chans
            self.postnet += [
                tnn.Sequential(
                    tnn.Conv1d(ich, n_chans, n_filts, padding=(n_filts - 1) // 2, bias=False),
                    tnn.BatchNorm1d(n_chans),
                    tnn.Tanh(),
                    tnn.Dropout(0.0),
                )
            ]
        self.postnet += [
            tnn.Sequential(
                tnn.Conv1d(n_chans, odim, n_filts, padding=(n_filts - 1) // 2, bias=False),
                tnn.BatchNorm1d(odim),
                tnn.Dropout(0.0),
            )
        ]

    def forward(self, xs):
        for f in self.postnet:
            xs = f(xs)
        return xs


class TFastSpeech2(tnn.Module):
    """Full reference FastSpeech2 assembly (models/fastspeech2.py:260-653),
    eval-mode training forward with ground-truth durations/pitch/energy."""

    def __init__(self, vocab, odim=10, d=32, h=2, ff=64, elayers=2, dlayers=2,
                 enc_k=7, dec_k=7, pred_ch=16):
        super().__init__()
        self.odim = odim
        self.encoder = TConformer(d, h, ff, enc_k, elayers, vocab=vocab)
        self.decoder = TConformer(d, h, ff, dec_k, dlayers, vocab=None)
        self.duration_predictor = TPredictor(d, 2, pred_ch, 3)
        self.pitch_predictor = TPredictor(d, 2, pred_ch, 5)
        self.energy_predictor = TPredictor(d, 2, pred_ch, 3)
        self.pitch_embed = tnn.Sequential(tnn.Conv1d(1, d, 1), tnn.Dropout(0.0))
        self.energy_embed = tnn.Sequential(tnn.Conv1d(1, d, 1), tnn.Dropout(0.0))
        self.feat_out = tnn.Linear(d, odim)
        self.postnet = TPostnet(odim, 3, 16, 5)

    def forward(self, xs, x_mask, ds, ps, es, t_feats, h_mask):
        hs = self.encoder(xs, x_mask)
        p_outs = self.pitch_predictor(hs.detach())
        e_outs = self.energy_predictor(hs)
        d_outs = self.duration_predictor(hs).squeeze(-1)
        hs = hs + self.energy_embed(es.transpose(1, 2)).transpose(1, 2)
        hs = hs + self.pitch_embed(ps.transpose(1, 2)).transpose(1, 2)
        # LengthRegulator (reference length_regulator.py:70-97)
        out = torch.zeros(hs.size(0), t_feats, hs.size(2))
        for i in range(hs.size(0)):
            rep = torch.repeat_interleave(hs[i], ds[i], dim=0)
            out[i, : min(len(rep), t_feats)] = rep[:t_feats]
        zs = self.decoder(out, h_mask)
        before = self.feat_out(zs)
        after = before + self.postnet(before.transpose(1, 2)).transpose(1, 2)
        return before, after, d_outs, p_outs, e_outs
