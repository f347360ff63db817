"""VITS WaveNet / posterior-encoder checkpoint-import parity (the
weight-norm conv mapping is the piece not covered by other parity tests)."""

import numpy as np
import pytest

import jax.numpy as jnp

from jatts_tpu.modules.vits_modules import PosteriorEncoder
from jatts_tpu.utils.torch_import import convert_posterior_encoder

torch = pytest.importorskip("torch")

from torch_replica import TPosteriorEncoder  # noqa: E402


def test_posterior_encoder_import_parity():
    torch.manual_seed(0)
    in_ch, out_ch, hidden, k, layers = 8, 12, 12, 5, 3
    tpe = TPosteriorEncoder(in_ch, out_ch, hidden, k, layers).eval()
    sd = {f"pe.{kk}": v.detach().numpy() for kk, v in tpe.state_dict().items()}
    params = convert_posterior_encoder(sd, "pe", layers)

    rng = np.random.default_rng(0)
    b, t = 2, 15
    ys = rng.normal(size=(b, t, in_ch)).astype(np.float32)
    with torch.no_grad():
        m_t, logs_t = tpe(torch.from_numpy(ys).transpose(1, 2), torch.ones(b, 1, t))

    jpe = PosteriorEncoder(
        out_channels=out_ch, hidden_channels=hidden, kernel_size=k, layers=layers,
    )
    z, m, logs, mask = jpe.apply(
        {"params": params}, jnp.asarray(ys), jnp.full((b,), t, jnp.int32),
        rngs={"noise": __import__("jax").random.key(0)},
    )
    np.testing.assert_allclose(
        np.asarray(m), m_t.transpose(1, 2).numpy(), rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(logs), logs_t.transpose(1, 2).numpy(), rtol=2e-3, atol=2e-4
    )
