import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jatts_tpu.models.fastspeech2 import FastSpeech2


@pytest.fixture(scope="module")
def tiny_model():
    return FastSpeech2(
        idim=30, odim=10, adim=32, aheads=2, elayers=2, eunits=64,
        dlayers=2, dunits=64, postnet_layers=2, postnet_chans=16,
        duration_predictor_chans=16, pitch_predictor_chans=16,
        energy_predictor_chans=16, pitch_predictor_layers=2,
        conformer_enc_kernel_size=7, conformer_dec_kernel_size=7,
    )


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    b, t_text, t_feats = 2, 9, 30
    xs = jnp.array(rng.integers(1, 30, (b, t_text)))
    ilens = jnp.array([9, 6])
    ds = np.zeros((b, t_text), np.int32)
    ds[0, :9] = [3, 4, 2, 5, 3, 4, 3, 4, 2]  # sum 30
    ds[1, :6] = [5, 4, 3, 5, 4, 3]  # sum 24
    olens = jnp.array([30, 24])
    ys = jnp.array(rng.normal(size=(b, t_feats, 10)).astype(np.float32))
    ps = jnp.array(rng.normal(size=(b, t_text, 1)).astype(np.float32))
    es = jnp.array(rng.normal(size=(b, t_text, 1)).astype(np.float32))
    return dict(xs=xs, ilens=ilens, ys=ys, olens=olens, ds=jnp.array(ds), ps=ps, es=es)


def test_forward_shapes(tiny_model, batch):
    variables = tiny_model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        **batch, deterministic=False,
    )
    out, mutated = tiny_model.apply(
        variables, **batch, deterministic=False,
        rngs={"dropout": jax.random.key(2)}, mutable=["batch_stats"],
    )
    assert out["before_outs"].shape == (2, 30, 10)
    assert out["after_outs"].shape == (2, 30, 10)
    assert out["d_outs"].shape == (2, 9)
    assert out["p_outs"].shape == (2, 9, 1)
    assert np.isfinite(np.asarray(out["before_outs"])).all()
    assert "batch_stats" in mutated


def test_inference_shapes_and_masking(tiny_model, batch):
    variables = tiny_model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        **batch, deterministic=False,
    )
    infer = jax.jit(
        lambda v, xs, ilens: tiny_model.apply(
            v, xs, ilens, 64, method=FastSpeech2.inference
        ),
    )
    out = infer(variables, batch["xs"], batch["ilens"])
    assert out["feat_gen"].shape == (2, 64, 10)
    olens = np.asarray(out["olens"])
    feats = np.asarray(out["feat_gen"])
    # frames beyond olens are zeroed
    for i in range(2):
        assert np.abs(feats[i, olens[i]:]).sum() == 0
    # durations on padded tokens are zero
    d = np.asarray(out["duration"])
    assert (d[1, 6:] == 0).all()


def test_forward_is_jittable_and_differentiable(tiny_model, batch):
    variables = tiny_model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        **batch, deterministic=False,
    )

    def loss_fn(params):
        out, _ = tiny_model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            **batch, deterministic=False,
            rngs={"dropout": jax.random.key(2)}, mutable=["batch_stats"],
        )
        return jnp.mean((out["after_outs"] - batch["ys"]) ** 2)

    g = jax.jit(jax.grad(loss_fn))(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # some gradient mass reaches the encoder embedding
    total = sum(float(np.abs(np.asarray(l)).sum()) for l in leaves)
    assert total > 0
