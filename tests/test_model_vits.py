import jax
import jax.numpy as jnp
import numpy as np

from jatts_tpu.models.vits import VITS

RNGS = {"params": jax.random.key(0), "dropout": jax.random.key(1), "noise": jax.random.key(2)}

TINY = dict(
    idim=25, odim=8, adim=16, aheads=2, text_encoder_blocks=1,
    text_encoder_ffn_expand=2, dlayers=1, dunits=32,
    duration_predictor_chans=8, posterior_encoder_layers=2, flow_flows=2,
    flow_layers=2, conformer_dec_kernel_size=7,
)


def _batch(rng, b=2, t_text=6, t_feats=24):
    return {
        "xs": jnp.array(rng.integers(1, 25, (b, t_text)).astype(np.int32)),
        "ilens": jnp.array([6, 4]),
        "ys": jnp.array(rng.normal(size=(b, t_feats, 8)).astype(np.float32)),
        "olens": jnp.array([24, 17]),
    }


def test_vits_train_forward_and_grad():
    rng = np.random.default_rng(0)
    b = _batch(rng)
    model = VITS(**TINY)
    variables = model.init(RNGS, **b, deterministic=False)
    out, _ = model.apply(
        variables, **b, deterministic=False, rngs=RNGS, mutable=["batch_stats"]
    )
    assert out["outs"].shape == (2, 24, 8)
    assert out["z_p"].shape == (2, 24, 16)
    ds = np.asarray(out["ds"])
    np.testing.assert_array_equal(ds.sum(-1), np.asarray(b["olens"]))

    def loss(params):
        o, _ = model.apply(
            {**variables, "params": params}, **b, deterministic=False,
            rngs=RNGS, mutable=["batch_stats"],
        )
        return (
            jnp.mean(jnp.abs(o["outs"] - b["ys"]))
            + jnp.mean(o["z_p"] ** 2)
            + o["bin_loss"]
        )

    g = jax.grad(loss)(variables["params"])
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(g))


def test_vits_inference():
    rng = np.random.default_rng(1)
    b = _batch(rng)
    model = VITS(**TINY)
    variables = model.init(RNGS, **b, deterministic=False)
    out = model.apply(
        variables, b["xs"], b["ilens"], 48, method=VITS.inference,
        rngs={"noise": jax.random.key(5)},
    )
    assert out["feat_gen"].shape == (2, 48, 8)
    assert np.isfinite(np.asarray(out["feat_gen"])).all()


def test_vits_flow_invertibility():
    rng = np.random.default_rng(2)
    b = _batch(rng)
    model = VITS(**TINY)
    variables = model.init(RNGS, **b, deterministic=False)

    z = jnp.array(rng.normal(size=(2, 24, 16)).astype(np.float32))
    mask = jnp.ones((2, 24, 1), jnp.float32)

    def fwd(v, z):
        return model.apply(
            v, z, mask, None, False, True,
            method=lambda m, z_, mk, g_, inv, det: m.flow(z_, mk, g=g_, inverse=inv, deterministic=det),
        )

    def inv(v, z):
        return model.apply(
            v, z, mask, None, True, True,
            method=lambda m, z_, mk, g_, inv_, det: m.flow(z_, mk, g=g_, inverse=inv_, deterministic=det),
        )

    z_fwd = fwd(variables, z)
    z_back = inv(variables, z_fwd)
    np.testing.assert_allclose(np.asarray(z_back), np.asarray(z), rtol=1e-4, atol=1e-4)


def test_vits_stochastic_duration_predictor():
    rng = np.random.default_rng(3)
    b = _batch(rng)
    model = VITS(**{**TINY, "duration_predictor_type": "stochastic"})
    variables = model.init(RNGS, **b, deterministic=False)
    out, _ = model.apply(
        variables, **b, deterministic=False, rngs=RNGS, mutable=["batch_stats"]
    )
    assert out["dur_nll"] is not None
    assert np.isfinite(np.asarray(out["dur_nll"])).all()
    inf = model.apply(
        variables, b["xs"], b["ilens"], 48, method=VITS.inference,
        rngs={"noise": jax.random.key(9)},
    )
    assert inf["feat_gen"].shape == (2, 48, 8)
