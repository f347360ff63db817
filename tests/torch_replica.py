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


class TSnakeBetaFF(tnn.Module):
    """SnakeBeta projection FF (reference matchatts/transformer.py:28-157)."""

    def __init__(self, dim, inner):
        super().__init__()

        class Net0(tnn.Module):
            def __init__(self):
                super().__init__()
                self.proj = tnn.Linear(dim, inner)
                self.alpha = tnn.Parameter(torch.zeros(inner))
                self.beta = tnn.Parameter(torch.zeros(inner))

            def forward(self, x):
                x = self.proj(x)
                a, b = torch.exp(self.alpha), torch.exp(self.beta)
                return x + (1.0 / (b + 1e-9)) * torch.sin(x * a) ** 2

        self.net = tnn.ModuleList([Net0(), tnn.Dropout(0.0), tnn.Linear(inner, dim)])

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class TMatchaTF(tnn.Module):
    """BasicTransformerBlock, self-attn + SnakeBeta FF, pre-LN
    (reference matchatts/transformer.py:160-364)."""

    def __init__(self, dim, heads, head_dim):
        super().__init__()
        inner = heads * head_dim
        self.heads, self.head_dim = heads, head_dim
        self.norm1 = tnn.LayerNorm(dim)

        class Attn(tnn.Module):
            def __init__(self):
                super().__init__()
                self.to_q = tnn.Linear(dim, inner, bias=False)
                self.to_k = tnn.Linear(dim, inner, bias=False)
                self.to_v = tnn.Linear(dim, inner, bias=False)
                self.to_out = tnn.ModuleList([tnn.Linear(inner, dim), tnn.Dropout(0.0)])

        self.attn1 = Attn()
        self.norm3 = tnn.LayerNorm(dim)
        self.ff = TSnakeBetaFF(dim, dim * 4)

    def forward(self, x):
        h = self.norm1(x)
        b, t, _ = h.shape
        q = self.attn1.to_q(h).view(b, t, self.heads, self.head_dim).transpose(1, 2)
        k = self.attn1.to_k(h).view(b, t, self.heads, self.head_dim).transpose(1, 2)
        v = self.attn1.to_v(h).view(b, t, self.heads, self.head_dim).transpose(1, 2)
        a = (q @ k.transpose(-2, -1)) / math.sqrt(self.head_dim)
        o = (a.softmax(-1) @ v).transpose(1, 2).reshape(b, t, -1)
        x = x + self.attn1.to_out[0](o)
        return x + self.ff(self.norm3(x))


class TBlock1D(tnn.Module):
    def __init__(self, dim, dim_out):
        super().__init__()
        self.block = tnn.Sequential(
            tnn.Conv1d(dim, dim_out, 3, padding=1),
            tnn.GroupNorm(8, dim_out),
            tnn.Mish(),
        )

    def forward(self, x, mask):
        return self.block(x * mask) * mask


class TResnetBlock1D(tnn.Module):
    def __init__(self, dim, dim_out, temb):
        super().__init__()
        self.mlp = tnn.Sequential(tnn.Mish(), tnn.Linear(temb, dim_out))
        self.block1 = TBlock1D(dim, dim_out)
        self.block2 = TBlock1D(dim_out, dim_out)
        self.res_conv = tnn.Conv1d(dim, dim_out, 1)

    def forward(self, x, mask, t):
        h = self.block1(x, mask)
        h = h + self.mlp(t).unsqueeze(-1)
        h = self.block2(h, mask)
        return h + self.res_conv(x * mask)


class TMatchaDecoder(tnn.Module):
    """reference matchatts/decoder.py:243-487 Decoder (channel-first)."""

    def __init__(self, odim, channels=(16, 16), heads=2, head_dim=8,
                 n_blocks=1, num_mid=2):
        super().__init__()
        in_ch = 2 * odim
        temb = channels[0] * 4
        self.in_ch = in_ch

        class TimeMLP(tnn.Module):
            def __init__(self):
                super().__init__()
                self.linear_1 = tnn.Linear(in_ch, temb)
                self.linear_2 = tnn.Linear(temb, temb)

            def forward(self, t):
                return self.linear_2(torch.nn.functional.silu(self.linear_1(t)))

        self.time_mlp = TimeMLP()
        self.down_blocks = tnn.ModuleList()
        out_c = in_ch
        for i, ch in enumerate(channels):
            is_last = i == len(channels) - 1
            resnet = TResnetBlock1D(out_c, ch, temb)
            tfs = tnn.ModuleList([TMatchaTF(ch, heads, head_dim) for _ in range(n_blocks)])
            if not is_last:
                class DS(tnn.Module):
                    def __init__(self, c):
                        super().__init__()
                        self.conv = tnn.Conv1d(c, c, 3, 2, 1)

                    def forward(self, x):
                        return self.conv(x)

                down = DS(ch)
            else:
                down = tnn.Conv1d(ch, ch, 3, padding=1)
            self.down_blocks.append(tnn.ModuleList([resnet, tfs, down]))
            out_c = ch
        self.mid_blocks = tnn.ModuleList()
        for _ in range(num_mid):
            self.mid_blocks.append(tnn.ModuleList([
                TResnetBlock1D(channels[-1], channels[-1], temb),
                tnn.ModuleList([TMatchaTF(channels[-1], heads, head_dim) for _ in range(n_blocks)]),
            ]))
        up_chans = tuple(reversed(channels)) + (channels[0],)
        self.up_blocks = tnn.ModuleList()
        for i in range(len(up_chans) - 1):
            in_c, out_cu = up_chans[i], up_chans[i + 1]
            is_last = i == len(up_chans) - 2
            resnet = TResnetBlock1D(2 * in_c, out_cu, temb)
            tfs = tnn.ModuleList([TMatchaTF(out_cu, heads, head_dim) for _ in range(n_blocks)])
            if not is_last:
                class US(tnn.Module):
                    def __init__(self, c):
                        super().__init__()
                        self.conv = tnn.ConvTranspose1d(c, c, 4, 2, 1)

                    def forward(self, x):
                        return self.conv(x)

                up = US(out_cu)
            else:
                up = tnn.Conv1d(out_cu, out_cu, 3, padding=1)
            self.up_blocks.append(tnn.ModuleList([resnet, tfs, up]))
        self.final_block = TBlock1D(up_chans[-1], up_chans[-1])
        self.final_proj = tnn.Conv1d(up_chans[-1], odim, 1)

    def forward(self, x, mask, mu, t):
        # x/mu: [B, C, T]; mask [B, 1, T]; t [B]
        hd = self.in_ch // 2
        e = torch.exp(torch.arange(hd).float() * -(math.log(10000.0) / (hd - 1)))
        e = 1000.0 * t.unsqueeze(1) * e.unsqueeze(0)
        temb = torch.cat([e.sin(), e.cos()], dim=-1)
        temb = self.time_mlp(temb)

        x = torch.cat([x, mu], dim=1)
        hiddens, masks = [], [mask]
        for resnet, tfs, down in self.down_blocks:
            m = masks[-1]
            x = resnet(x, m, temb)
            x = x.transpose(1, 2)
            for tf in tfs:
                x = tf(x)
            x = x.transpose(1, 2)
            hiddens.append(x)
            x = down(x * m)
            masks.append(m[:, :, ::2])
        masks = masks[:-1]
        m = masks[-1]
        for resnet, tfs in self.mid_blocks:
            x = resnet(x, m, temb)
            x = x.transpose(1, 2)
            for tf in tfs:
                x = tf(x)
            x = x.transpose(1, 2)
        for resnet, tfs, up in self.up_blocks:
            m = masks.pop()
            x = resnet(torch.cat([x, hiddens.pop()], dim=1), m, temb)
            x = x.transpose(1, 2)
            for tf in tfs:
                x = tf(x)
            x = x.transpose(1, 2)
            x = up(x * m)
        x = self.final_block(x, m)
        return self.final_proj(x * m) * mask


class TWNResBlock(tnn.Module):
    """reference wavenet/residual_block.py:42-167 (weight-normed convs,
    gated activation, fused res+skip 1x1)."""

    def __init__(self, k, res_ch, gate_ch, skip_ch, dil, glob_ch=None):
        super().__init__()
        self.res_ch, self.skip_ch = res_ch, skip_ch
        pad = (k - 1) // 2 * dil
        self.conv = tnn.utils.weight_norm(
            tnn.Conv1d(res_ch, gate_ch, k, padding=pad, dilation=dil)
        )
        self.conv1x1_glo = (
            tnn.utils.weight_norm(tnn.Conv1d(glob_ch, gate_ch, 1, bias=False))
            if glob_ch else None
        )
        self.conv1x1_out = tnn.utils.weight_norm(
            tnn.Conv1d(gate_ch // 2, res_ch + skip_ch, 1)
        )

    def forward(self, x, x_mask=None, g=None):
        residual = x
        h = self.conv(x)
        xa, xb = h.split(h.size(1) // 2, dim=1)
        if g is not None:
            gh = self.conv1x1_glo(g)
            ga, gb = gh.split(gh.size(1) // 2, dim=1)
            xa, xb = xa + ga, xb + gb
        h = torch.tanh(xa) * torch.sigmoid(xb)
        h = self.conv1x1_out(h)
        if x_mask is not None:
            h = h * x_mask
        xr, s = h.split([self.res_ch, self.skip_ch], dim=1)
        return xr + residual, s


class TWaveNet(tnn.Module):
    """reference wavenet/wavenet.py:19-194 (no first/last conv,
    scale_skip_connect=True)."""

    def __init__(self, k, layers, hidden, glob_ch=None):
        super().__init__()
        self.conv_layers = tnn.ModuleList(
            [TWNResBlock(k, hidden, hidden * 2, hidden, 1, glob_ch) for _ in range(layers)]
        )

    def forward(self, x, x_mask=None, g=None):
        skips = 0.0
        for f in self.conv_layers:
            x, s = f(x, x_mask, g)
            skips = skips + s
        return skips * math.sqrt(1.0 / len(self.conv_layers))


class TPosteriorEncoder(tnn.Module):
    """reference vits/posterior_encoder.py:18-115 (m/logs deterministic part)."""

    def __init__(self, in_ch, out_ch, hidden, k, layers, glob_ch=None):
        super().__init__()
        self.input_conv = tnn.Conv1d(in_ch, hidden, 1)
        self.encoder = TWaveNet(k, layers, hidden, glob_ch)
        self.proj = tnn.Conv1d(hidden, out_ch * 2, 1)

    def forward(self, x, x_mask, g=None):
        h = self.input_conv(x) * x_mask
        h = self.encoder(h, x_mask, g)
        stats = self.proj(h) * x_mask
        return stats.split(stats.size(1) // 2, dim=1)
