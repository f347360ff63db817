"""Matcha U-Net estimator checkpoint-import parity: torch replica ->
convert_matcha_estimator -> our MatchaDecoder."""

import numpy as np
import pytest

import jax.numpy as jnp

from jatts_tpu.modules.matcha_decoder import MatchaDecoder
from jatts_tpu.utils.torch_import import convert_matcha_estimator

torch = pytest.importorskip("torch")

from torch_replica import TMatchaDecoder  # noqa: E402


def test_matcha_estimator_import_parity():
    torch.manual_seed(0)
    odim, channels = 8, (16, 16)
    tdec = TMatchaDecoder(odim, channels=channels, heads=2, head_dim=8).eval()
    sd = {f"est.{k}": v.detach().numpy() for k, v in tdec.state_dict().items()}
    params = convert_matcha_estimator(sd, "est", len(channels), 1, 2)

    jdec = MatchaDecoder(
        out_channels=odim, channels=channels, dropout_rate=0.0,
        attention_head_dim=8, n_blocks=1, num_mid_blocks=2, num_heads=2,
    )
    rng = np.random.default_rng(0)
    b, t = 2, 24
    x = rng.normal(size=(b, t, odim)).astype(np.float32)
    mu = rng.normal(size=(b, t, odim)).astype(np.float32)
    tt = np.array([0.3, 0.8], np.float32)
    with torch.no_grad():
        want = tdec(
            torch.from_numpy(x).transpose(1, 2),
            torch.ones(b, 1, t),
            torch.from_numpy(mu).transpose(1, 2),
            torch.from_numpy(tt),
        ).transpose(1, 2).numpy()
    got = np.asarray(
        jdec.apply(
            {"params": params}, jnp.asarray(x), jnp.ones((b, t), jnp.float32),
            jnp.asarray(mu), jnp.asarray(tt), deterministic=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)
