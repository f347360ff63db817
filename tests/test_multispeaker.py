"""Multi-speaker conditioning paths: spk-embedding integration (add/concat)
and VITS global conditioning through WaveNet/flow."""

import jax
import jax.numpy as jnp
import numpy as np

from jatts_tpu.models.fastspeech2 import FastSpeech2
from jatts_tpu.models.vits import VITS

RNGS = {"params": jax.random.key(0), "dropout": jax.random.key(1), "noise": jax.random.key(2)}


def _fs2_batch(rng, b=2, t_text=6, t_feats=24, odim=8):
    ds = rng.integers(1, 6, (b, t_text)).astype(np.int32)
    return dict(
        xs=jnp.array(rng.integers(1, 20, (b, t_text)).astype(np.int32)),
        ilens=jnp.array([t_text, t_text - 2]),
        ys=jnp.array(rng.normal(size=(b, t_feats, odim)).astype(np.float32)),
        olens=jnp.array(np.minimum(ds.sum(-1), t_feats)),
        ds=jnp.array(ds),
        ps=jnp.array(rng.normal(size=(b, t_text, 1)).astype(np.float32)),
        es=jnp.array(rng.normal(size=(b, t_text, 1)).astype(np.float32)),
        spembs=jnp.array(rng.normal(size=(b, 16)).astype(np.float32)),
    )


def test_fastspeech2_spkemb_add_and_concat():
    rng = np.random.default_rng(0)
    b = _fs2_batch(rng)
    for integration in ("add", "concat"):
        model = FastSpeech2(
            idim=20, odim=8, adim=16, aheads=2, elayers=1, eunits=32,
            dlayers=1, dunits=32, postnet_layers=2, postnet_chans=8,
            duration_predictor_chans=8, pitch_predictor_chans=8,
            pitch_predictor_layers=2, energy_predictor_chans=8,
            spk_embed_dim=16, spk_embed_integration_type=integration,
        )
        variables = model.init(RNGS, **b, deterministic=False)
        out, _ = model.apply(
            variables, **b, deterministic=False, rngs=RNGS, mutable=["batch_stats"]
        )
        assert np.isfinite(np.asarray(out["before_outs"])).all()
        # different speakers -> different outputs
        b2 = dict(b)
        b2["spembs"] = b["spembs"][::-1]
        out2, _ = model.apply(
            variables, **b2, deterministic=True, rngs=RNGS, mutable=["batch_stats"]
        )
        out1, _ = model.apply(
            variables, **b, deterministic=True, rngs=RNGS, mutable=["batch_stats"]
        )
        assert not np.allclose(
            np.asarray(out1["before_outs"]), np.asarray(out2["before_outs"])
        )


def test_vits_global_conditioning():
    rng = np.random.default_rng(1)
    b, t_text, t_feats = 2, 6, 24
    batch = dict(
        xs=jnp.array(rng.integers(1, 20, (b, t_text)).astype(np.int32)),
        ilens=jnp.array([6, 4]),
        ys=jnp.array(rng.normal(size=(b, t_feats, 8)).astype(np.float32)),
        olens=jnp.array([24, 17]),
        spembs=jnp.array(rng.normal(size=(b, 16)).astype(np.float32)),
    )
    model = VITS(
        idim=20, odim=8, adim=16, aheads=2, text_encoder_blocks=1,
        text_encoder_ffn_expand=2, dlayers=1, dunits=32,
        duration_predictor_chans=8, posterior_encoder_layers=2,
        flow_flows=2, flow_layers=2, conformer_dec_kernel_size=7,
        spk_embed_dim=16,
    )
    variables = model.init(RNGS, **batch, deterministic=False)
    out, _ = model.apply(
        variables, **batch, deterministic=False, rngs=RNGS, mutable=["batch_stats"]
    )
    assert np.isfinite(np.asarray(out["outs"])).all()
    inf = model.apply(
        variables, batch["xs"], batch["ilens"], 48, spembs=batch["spembs"],
        method=VITS.inference, rngs={"noise": jax.random.key(7)},
    )
    assert inf["feat_gen"].shape == (2, 48, 8)
