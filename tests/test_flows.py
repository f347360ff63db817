"""Flow component tests: spline invertibility, ConvFlow round trip,
StochasticDurationPredictor NLL/inference."""

import jax
import jax.numpy as jnp
import numpy as np

from jatts_tpu.modules.flows import (
    ConvFlow,
    StochasticDurationPredictor,
    rational_quadratic_spline,
)

RNGS = {"params": jax.random.key(0), "dropout": jax.random.key(1), "noise": jax.random.key(2)}


def test_rq_spline_invertibility_and_identity_tails():
    rng = np.random.default_rng(0)
    shape = (2, 7, 3)
    bins = 10
    x = jnp.array(rng.normal(size=shape).astype(np.float32)) * 3.0
    uw = jnp.array(rng.normal(size=(*shape, bins)).astype(np.float32))
    uh = jnp.array(rng.normal(size=(*shape, bins)).astype(np.float32))
    ud = jnp.array(rng.normal(size=(*shape, bins - 1)).astype(np.float32))
    y, ld = rational_quadratic_spline(x, uw, uh, ud, inverse=False)
    x_back, ld_inv = rational_quadratic_spline(y, uw, uh, ud, inverse=True)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld + ld_inv), 0.0, atol=1e-4)
    # outside the tail bound the map is the identity
    far = jnp.full(shape, 7.0)
    y_far, ld_far = rational_quadratic_spline(far, uw, uh, ud)
    np.testing.assert_array_equal(np.asarray(y_far), np.asarray(far))
    np.testing.assert_array_equal(np.asarray(ld_far), 0.0)


def test_conv_flow_round_trip():
    rng = np.random.default_rng(1)
    x = jnp.array(rng.normal(size=(2, 6, 2)).astype(np.float32))
    mask = jnp.ones((2, 6, 1))
    flow = ConvFlow(2, 16, 3, 2)
    variables = flow.init(RNGS, x, mask)
    y, logdet = flow.apply(variables, x, mask)
    x_back = flow.apply(variables, y, mask, inverse=True)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), rtol=1e-4, atol=1e-4)
    assert logdet.shape == (2,)


def test_stochastic_duration_predictor():
    rng = np.random.default_rng(2)
    b, t, c = 2, 6, 16
    x = jnp.array(rng.normal(size=(b, t, c)).astype(np.float32))
    mask = jnp.ones((b, t, 1))
    w = jnp.array(rng.integers(1, 10, (b, t, 1)).astype(np.float32))
    sdp = StochasticDurationPredictor(channels=c, flows=2, dds_conv_layers=2)
    variables = sdp.init(RNGS, x, mask, w=w, deterministic=False)
    nll = sdp.apply(
        variables, x, mask, w=w, deterministic=False,
        rngs={"noise": jax.random.key(3), "dropout": jax.random.key(4)},
    )
    assert nll.shape == (b,)
    assert np.isfinite(np.asarray(nll)).all()

    # gradient flows
    g = jax.grad(
        lambda p: jnp.sum(
            sdp.apply(
                {"params": p}, x, mask, w=w, deterministic=False,
                rngs={"noise": jax.random.key(3), "dropout": jax.random.key(4)},
            )
        )
    )(variables["params"])
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g))

    durations = sdp.apply(
        variables, x, mask, inverse=True, noise_scale=0.8,
        rngs={"noise": jax.random.key(5)},
    )
    d = np.asarray(durations)
    assert d.shape == (b, t)
    assert (d >= 0).all() and np.isfinite(d).all()
