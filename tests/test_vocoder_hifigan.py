"""HiFi-GAN parity: JAX generator vs a torch replica of the
parallel_wavegan HiFiGANGenerator (the reference's vocoder backend)."""

import numpy as np
import pytest

import jax.numpy as jnp

from jatts_tpu.vocoder.convert import fold_weight_norm, hifigan_torch_to_flax
from jatts_tpu.vocoder.hifigan import HiFiGANGenerator

torch = pytest.importorskip("torch")


def _build_torch_generator(
    in_channels=8, channels=16, kernel_size=7,
    upsample_scales=(5, 4), upsample_kernel_sizes=(10, 8),
    resblock_kernel_sizes=(3, 7), resblock_dilations=((1, 3), (1, 3)),
):
    """Minimal replica of parallel_wavegan.models.HiFiGANGenerator layout."""
    import torch.nn as tnn

    class ResidualBlock(tnn.Module):
        def __init__(self, ks, ch, dils):
            super().__init__()
            self.convs1 = tnn.ModuleList(
                [
                    tnn.Sequential(
                        tnn.LeakyReLU(0.1),
                        tnn.Conv1d(ch, ch, ks, 1, (ks - 1) // 2 * d, dilation=d),
                    )
                    for d in dils
                ]
            )
            self.convs2 = tnn.ModuleList(
                [
                    tnn.Sequential(
                        tnn.LeakyReLU(0.1),
                        tnn.Conv1d(ch, ch, ks, 1, (ks - 1) // 2),
                    )
                    for _ in dils
                ]
            )

        def forward(self, x):
            for c1, c2 in zip(self.convs1, self.convs2):
                x = x + c2(c1(x))
            return x

    class Gen(tnn.Module):
        def __init__(self):
            super().__init__()
            self.num_upsamples = len(upsample_scales)
            self.num_blocks = len(resblock_kernel_sizes)
            self.input_conv = tnn.Conv1d(
                in_channels, channels, kernel_size, 1, (kernel_size - 1) // 2
            )
            self.upsamples = tnn.ModuleList()
            self.blocks = tnn.ModuleList()
            for i, (s, k) in enumerate(zip(upsample_scales, upsample_kernel_sizes)):
                self.upsamples += [
                    tnn.Sequential(
                        tnn.LeakyReLU(0.1),
                        tnn.ConvTranspose1d(
                            channels // (2**i), channels // (2 ** (i + 1)), k, s,
                            padding=s // 2 + s % 2, output_padding=s % 2,
                        ),
                    )
                ]
                for j, (rk, rd) in enumerate(
                    zip(resblock_kernel_sizes, resblock_dilations)
                ):
                    self.blocks += [ResidualBlock(rk, channels // (2 ** (i + 1)), rd)]
            self.output_conv = tnn.Sequential(
                tnn.LeakyReLU(0.1),
                tnn.Conv1d(
                    channels // (2 ** len(upsample_scales)), 1, kernel_size, 1,
                    (kernel_size - 1) // 2,
                ),
                tnn.Tanh(),
            )

        def forward(self, c):
            c = self.input_conv(c)
            for i in range(self.num_upsamples):
                c = self.upsamples[i](c)
                cs = 0.0
                for j in range(self.num_blocks):
                    cs = cs + self.blocks[i * self.num_blocks + j](c)
                c = cs / self.num_blocks
            return self.output_conv(c)

    return Gen()


def test_hifigan_matches_torch_replica():
    torch.manual_seed(0)
    tg = _build_torch_generator().eval()
    sd = {k: v.detach().numpy() for k, v in tg.state_dict().items()}
    variables = hifigan_torch_to_flax(sd)

    jg = HiFiGANGenerator(
        in_channels=8, channels=16, kernel_size=7,
        upsample_scales=(5, 4), upsample_kernel_sizes=(10, 8),
        resblock_kernel_sizes=(3, 7), resblock_dilations=((1, 3), (1, 3)),
    )
    rng = np.random.default_rng(0)
    mel = rng.normal(size=(1, 40, 8)).astype(np.float32)
    with torch.no_grad():
        want = tg(torch.from_numpy(mel).transpose(1, 2)).numpy()[:, 0, :]
    got = np.asarray(jg.apply(variables, jnp.array(mel)))[:, :, 0]
    assert got.shape == want.shape == (1, 40 * 20)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_fold_weight_norm():
    conv = torch.nn.utils.weight_norm(torch.nn.Conv1d(4, 8, 3))
    sd = {k: v.detach().numpy() for k, v in conv.state_dict().items()}
    folded = fold_weight_norm({f"c.{k}": v for k, v in sd.items()})
    ref = torch.nn.utils.remove_weight_norm(conv).weight.detach().numpy()
    np.testing.assert_allclose(folded["c.weight"], ref, rtol=1e-5, atol=1e-6)
