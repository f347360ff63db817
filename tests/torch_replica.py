"""Torch replica of the reference Matcha U-Net estimator, used ONLY by
tests/test_torch_import_matcha.py.

The real reference decoder (jatts/modules/matchatts/decoder.py) cannot be
constructed in this image: it builds diffusers BasicTransformerBlock
internals and the diffusers package is absent. Everything else is verified
against the actual reference code in tests/test_reference_parity*.py; this
replica remains only for the estimator weight-import path. Replicates
decoder.py:48-487 + transformer.py:28-103 (SnakeBeta FF + attention block).
"""

import math

import torch
import torch.nn as tnn
import torch.nn.functional as F


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


# ---------------------------------------------------------------------------
# ECAPA-TDNN replica in speechbrain's module/key layout (speechbrain is not
# in this image). Used by tests/test_ecapa.py to pin the flax model
# (jatts_tpu/features/ecapa.py) and its state-dict importer: parameter keys
# match speechbrain's ``embedding_model.ckpt`` grammar (wrapper Conv1d owns
# an inner .conv, BatchNorm1d an inner .norm, ModuleList indices), so the
# same importer that passes here accepts the real voxceleb checkpoint.
# ---------------------------------------------------------------------------


class SBConv1d(tnn.Module):
    """speechbrain Conv1d wrapper: inner .conv, 'same' padding."""

    def __init__(self, in_ch, out_ch, k, dilation=1):
        super().__init__()
        self.conv = tnn.Conv1d(in_ch, out_ch, k, dilation=dilation,
                               padding="same")

    def forward(self, x):
        return self.conv(x)


class SBBatchNorm1d(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.norm = tnn.BatchNorm1d(ch)

    def forward(self, x):
        return self.norm(x)


class SBTDNNBlock(tnn.Module):
    def __init__(self, in_ch, out_ch, k, dilation):
        super().__init__()
        self.conv = SBConv1d(in_ch, out_ch, k, dilation)
        self.norm = SBBatchNorm1d(out_ch)

    def forward(self, x):
        return self.norm(torch.relu(self.conv(x)))


class SBRes2NetBlock(tnn.Module):
    def __init__(self, in_ch, out_ch, scale, k, dilation):
        super().__init__()
        hid_in, hid_out = in_ch // scale, out_ch // scale
        self.blocks = tnn.ModuleList(
            [SBTDNNBlock(hid_in, hid_out, k, dilation) for _ in range(scale - 1)]
        )
        self.scale = scale

    def forward(self, x):
        y = []
        for i, x_i in enumerate(torch.chunk(x, self.scale, dim=1)):
            if i == 0:
                y_i = x_i
            elif i == 1:
                y_i = self.blocks[i - 1](x_i)
            else:
                y_i = self.blocks[i - 1](x_i + y_i)
            y.append(y_i)
        return torch.cat(y, dim=1)


class SBSEBlock(tnn.Module):
    def __init__(self, in_ch, se_ch, out_ch):
        super().__init__()
        self.conv1 = SBConv1d(in_ch, se_ch, 1)
        self.conv2 = SBConv1d(se_ch, out_ch, 1)

    def forward(self, x, mask):
        n = mask.sum(dim=2, keepdim=True).clamp(min=1.0)
        s = (x * mask).sum(dim=2, keepdim=True) / n
        s = torch.relu(self.conv1(s))
        s = torch.sigmoid(self.conv2(s))
        return s * x


class SBSERes2NetBlock(tnn.Module):
    def __init__(self, in_ch, out_ch, scale, se_ch, k, dilation):
        super().__init__()
        self.tdnn1 = SBTDNNBlock(in_ch, out_ch, 1, 1)
        self.res2net_block = SBRes2NetBlock(out_ch, out_ch, scale, k, dilation)
        self.tdnn2 = SBTDNNBlock(out_ch, out_ch, 1, 1)
        self.se_block = SBSEBlock(out_ch, se_ch, out_ch)

    def forward(self, x, mask):
        residual = x
        x = self.tdnn1(x)
        x = self.res2net_block(x)
        x = self.tdnn2(x)
        x = self.se_block(x, mask)
        return x + residual


class SBAttentiveStatisticsPooling(tnn.Module):
    def __init__(self, ch, attn_ch):
        super().__init__()
        self.tdnn = SBTDNNBlock(ch * 3, attn_ch, 1, 1)
        self.conv = SBConv1d(attn_ch, ch, 1)

    def forward(self, x, mask):
        n = mask.sum(dim=2, keepdim=True).clamp(min=1.0)
        mean = (x * mask).sum(dim=2, keepdim=True) / n
        var = ((x - mean) ** 2 * mask).sum(dim=2, keepdim=True) / n
        std = var.clamp(min=1e-12).sqrt()
        t = x.shape[2]
        attn_in = torch.cat(
            [x, mean.expand(-1, -1, t), std.expand(-1, -1, t)], dim=1
        )
        a = self.conv(torch.tanh(self.tdnn(attn_in)))
        a = a.masked_fill(mask == 0, float("-inf")).softmax(dim=2)
        mean = (a * x).sum(dim=2)
        std = ((a * x * x).sum(dim=2) - mean**2).clamp(min=1e-12).sqrt()
        return torch.cat([mean, std], dim=1).unsqueeze(2)


class SBEcapaTdnn(tnn.Module):
    """speechbrain.lobes.models.ECAPA_TDNN.ECAPA_TDNN layout; input
    [B, T, n_mels], output [B, lin_neurons]."""

    def __init__(self, n_mels=80, channels=(1024, 1024, 1024, 1024, 3072),
                 kernel_sizes=(5, 3, 3, 3, 1), dilations=(1, 2, 3, 4, 1),
                 attn_ch=128, res2net_scale=8, se_ch=128, lin_neurons=192):
        super().__init__()
        blocks = [SBTDNNBlock(n_mels, channels[0], kernel_sizes[0], dilations[0])]
        for i in range(1, len(channels) - 1):
            blocks.append(
                SBSERes2NetBlock(channels[i - 1], channels[i], res2net_scale,
                                 se_ch, kernel_sizes[i], dilations[i])
            )
        self.blocks = tnn.ModuleList(blocks)
        self.mfa = SBTDNNBlock(sum(channels[1:-1]), channels[-1],
                               kernel_sizes[-1], dilations[-1])
        self.asp = SBAttentiveStatisticsPooling(channels[-1], attn_ch)
        self.asp_bn = SBBatchNorm1d(channels[-1] * 2)
        self.fc = SBConv1d(channels[-1] * 2, lin_neurons, 1)

    def forward(self, feats, lens):
        x = feats.transpose(1, 2)  # [B, C, T]
        t = x.shape[2]
        mask = (torch.arange(t)[None, :] < lens[:, None]).float()[:, None, :]
        skips = []
        for i, block in enumerate(self.blocks):
            x = block(x) if i == 0 else block(x, mask)
            if i > 0:
                skips.append(x)
        x = self.mfa(torch.cat(skips, dim=1))
        x = self.asp(x, mask)
        x = self.asp_bn(x)
        x = self.fc(x)
        return x.squeeze(2)
