"""Import parity for predictor stacks and postnet (torch replicas of
reference duration_predictor.py / variance_predictor.py / pre_postnets.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from jatts_tpu.modules.predictors import DurationPredictor, VariancePredictor
from jatts_tpu.modules.prenet_postnet import Postnet
from jatts_tpu.utils.torch_import import _predictor_stack, t_bn, t_conv1d

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402


class TPredictor(tnn.Module):
    """conv-relu-LN(channel)-dropout stack + linear (reference
    duration_predictor.py:24-77 layout: conv.{i}.{0,1,2,3} + linear)."""

    def __init__(self, idim, n_layers, n_chans, k):
        super().__init__()
        self.conv = tnn.ModuleList()
        for i in range(n_layers):
            in_ch = idim if i == 0 else n_chans

            class LN1(tnn.LayerNorm):
                def forward(self, x):  # LayerNorm over channel dim of [B,C,T]
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


def test_duration_and_variance_predictor_import():
    torch.manual_seed(0)
    tp = TPredictor(16, 2, 24, 3).eval()
    sd = {f"p.{k}": v.detach().numpy() for k, v in tp.state_dict().items()}
    params = _predictor_stack(sd, "p", 2)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 9, 16)).astype(np.float32)
    with torch.no_grad():
        want = tp(torch.from_numpy(x)).numpy()

    vp = VariancePredictor(n_layers=2, n_chans=24, kernel_size=3, dropout_rate=0.0)
    got = np.asarray(vp.apply({"params": params}, jnp.array(x), deterministic=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    dp = DurationPredictor(n_layers=2, n_chans=24, kernel_size=3, dropout_rate=0.0)
    got_d = np.asarray(dp.apply({"params": params}, jnp.array(x), deterministic=True))
    np.testing.assert_allclose(got_d, want[..., 0], rtol=1e-4, atol=1e-5)


class TPostnet(tnn.Module):
    """reference pre_postnets.py:69-185 layout: postnet.{i}.{0 conv,1 bn}."""

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

    def forward(self, xs):  # [B, odim, T]
        for f in self.postnet:
            xs = f(xs)
        return xs


def test_postnet_import():
    torch.manual_seed(1)
    n_layers = 3
    tp = TPostnet(8, n_layers, 12, 5).eval()
    sd = {k: v.detach().numpy() for k, v in tp.state_dict().items()}
    params, stats = {}, {}
    for i in range(n_layers):
        params[f"conv_{i}"] = t_conv1d(sd, f"postnet.{i}.0")
        bnp, bns = t_bn(sd, f"postnet.{i}.1")
        params[f"bn_{i}"] = bnp
        stats[f"bn_{i}"] = bns
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 11, 8)).astype(np.float32)
    with torch.no_grad():
        want = tp(torch.from_numpy(x).transpose(1, 2)).transpose(1, 2).numpy()
    pn = Postnet(odim=8, n_layers=n_layers, n_chans=12, n_filts=5, dropout_rate=0.0)
    got = np.asarray(
        pn.apply({"params": params, "batch_stats": stats}, jnp.array(x), deterministic=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
