"""Full-model checkpoint-import parity: torch FastSpeech2 replica state_dict
-> convert_fastspeech2 -> our flax FastSpeech2; mel outputs must match."""

import numpy as np
import pytest

import jax.numpy as jnp

from jatts_tpu.models.fastspeech2 import FastSpeech2
from jatts_tpu.utils.torch_import import convert_fastspeech2

torch = pytest.importorskip("torch")

from torch_replica import TFastSpeech2  # noqa: E402


def test_fastspeech2_full_import_parity():
    torch.manual_seed(0)
    vocab, odim, d = 20, 10, 32
    t_text, b = 7, 2
    tmodel = TFastSpeech2(vocab, odim=odim, d=d).eval()

    rng = np.random.default_rng(0)
    xs = rng.integers(1, vocab, (b, t_text))
    ds = rng.integers(2, 7, (b, t_text))
    t_feats = int(ds.sum(axis=1).max())
    # equalize total durations so both samples fill t_feats exactly
    for i in range(b):
        ds[i, -1] += t_feats - ds[i].sum()
    assert (ds > 0).all() and (ds.sum(axis=1) == t_feats).all()
    ps = rng.normal(size=(b, t_text, 1)).astype(np.float32)
    es = rng.normal(size=(b, t_text, 1)).astype(np.float32)

    x_mask = torch.ones(b, 1, t_text, dtype=torch.bool)
    h_mask = torch.ones(b, 1, t_feats, dtype=torch.bool)
    with torch.no_grad():
        before_t, after_t, d_t, p_t, e_t = tmodel(
            torch.from_numpy(xs), x_mask, torch.from_numpy(ds),
            torch.from_numpy(ps), torch.from_numpy(es), t_feats, h_mask,
        )

    jmodel = FastSpeech2(
        idim=vocab, odim=odim, adim=d, aheads=2, elayers=2, eunits=64,
        dlayers=2, dunits=64, conformer_enc_kernel_size=7,
        conformer_dec_kernel_size=7, duration_predictor_layers=2,
        duration_predictor_chans=16, pitch_predictor_layers=2,
        pitch_predictor_chans=16, pitch_predictor_kernel_size=5,
        energy_predictor_layers=2, energy_predictor_chans=16,
        postnet_layers=3, postnet_chans=16, postnet_filts=5,
        transformer_enc_dropout_rate=0.0,
        transformer_enc_positional_dropout_rate=0.0,
        transformer_enc_attn_dropout_rate=0.0,
        transformer_dec_dropout_rate=0.0,
        transformer_dec_positional_dropout_rate=0.0,
        transformer_dec_attn_dropout_rate=0.0,
        duration_predictor_dropout_rate=0.0, pitch_predictor_dropout=0.0,
        energy_predictor_dropout=0.0, postnet_dropout_rate=0.0,
    )
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_fastspeech2(sd, jmodel)

    out = jmodel.apply(
        variables,
        jnp.asarray(xs.astype(np.int32)),
        jnp.asarray(np.full((b,), t_text, np.int32)),
        jnp.zeros((b, t_feats, odim), jnp.float32),
        jnp.asarray(np.full((b,), t_feats, np.int32)),
        jnp.asarray(ds.astype(np.int32)),
        jnp.asarray(ps), jnp.asarray(es),
        deterministic=True,
    )
    np.testing.assert_allclose(
        np.asarray(out["before_outs"]), before_t.numpy(), rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["after_outs"]), after_t.numpy(), rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["d_outs"]), d_t.numpy(), rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["p_outs"]), p_t.numpy(), rtol=2e-3, atol=2e-4
    )
