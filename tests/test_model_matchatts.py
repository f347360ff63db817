import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jatts_tpu.models.matchatts import MatchaTTS
from jatts_tpu.models.matchatts_mas import MatchaTTS_MAS

TINY = dict(
    idim=25, odim=8, adim=16, aheads=2, elayers=1, eunits=32,
    duration_predictor_chans=8, decoder_channels=(16, 16),
    decoder_attention_head_dim=8, decoder_num_heads=2,
    conformer_enc_kernel_size=7,
)


def _batch(rng, b=2, t_text=6, t_feats=32):
    ds = rng.integers(1, 6, (b, t_text)).astype(np.int32)
    olens = ds.sum(-1).astype(np.int32)
    return {
        "xs": jnp.array(rng.integers(1, 25, (b, t_text)).astype(np.int32)),
        "ilens": jnp.array([t_text, t_text - 2]),
        "ys": jnp.array(rng.normal(size=(b, t_feats, 8)).astype(np.float32)),
        "olens": jnp.array(np.minimum(olens, t_feats)),
        "ds": jnp.array(ds),
    }


RNGS = {"params": jax.random.key(0), "dropout": jax.random.key(1), "noise": jax.random.key(2)}


def test_matchatts_train_and_inference():
    rng = np.random.default_rng(0)
    b = _batch(rng)
    model = MatchaTTS(**TINY)
    variables = model.init(RNGS, b["xs"], b["ilens"], b["ys"], b["olens"], b["ds"], deterministic=False)
    out, _ = model.apply(
        variables, b["xs"], b["ilens"], b["ys"], b["olens"], b["ds"],
        deterministic=False, rngs=RNGS, mutable=["batch_stats"],
    )
    assert np.isfinite(float(out["cfm_loss"]))
    assert out["d_outs"].shape == (2, 6)

    inf = model.apply(
        variables, b["xs"], b["ilens"], 64, n_timesteps=2,
        method=MatchaTTS.inference, rngs={"noise": jax.random.key(3)},
    )
    assert inf["feat_gen"].shape == (2, 64, 8)
    assert np.isfinite(np.asarray(inf["feat_gen"])).all()


def test_matchatts_mas_train_inference_and_grad():
    rng = np.random.default_rng(1)
    b = _batch(rng)
    model = MatchaTTS_MAS(**TINY)
    variables = model.init(
        RNGS, b["xs"], b["ilens"], b["ys"], b["olens"], deterministic=False
    )
    out, _ = model.apply(
        variables, b["xs"], b["ilens"], b["ys"], b["olens"],
        deterministic=False, rngs=RNGS, mutable=["batch_stats"],
    )
    ds = np.asarray(out["ds"])
    np.testing.assert_array_equal(ds.sum(-1), np.asarray(b["olens"]))
    assert np.isfinite(float(out["bin_loss"]))

    def loss_fn(params):
        o, _ = model.apply(
            {"params": params, **{k: v for k, v in variables.items() if k != "params"}},
            b["xs"], b["ilens"], b["ys"], b["olens"],
            deterministic=False, rngs=RNGS, mutable=["batch_stats"],
        )
        return o["cfm_loss"] + o["bin_loss"]

    g = jax.grad(loss_fn)(variables["params"])
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(g))

    inf = model.apply(
        variables, b["xs"], b["ilens"], 64, n_timesteps=2,
        method=MatchaTTS_MAS.inference, rngs={"noise": jax.random.key(3)},
    )
    assert inf["feat_gen"].shape == (2, 64, 8)
