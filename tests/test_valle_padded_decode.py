"""Fixed-capacity (bucketed/padded) VALL-E decode must match exact-shape
decode: ttslm_decode and the serving export run AR/NAR as single compiled
programs with padded text / prompt / response buffers, so padding has to be
semantically inert and AR stop-token garbage must be sanitized before the
NAR embedding gather (models/valle.py nar_generate)."""

import jax
import jax.numpy as jnp
import numpy as np

from jatts_tpu.models.valle import VALLEAR, VALLENAR, ar_generate, nar_generate

MP = dict(idim=0, n_tokens=32, d_model=16, n_heads=2, n_layers=2,
          n_prom_levels=8, n_resp_levels=7, prompt_max_frame_length=12)


def _init(cls, seed=0, b=2, tx=8, tp=6, tr=5):
    rng = np.random.default_rng(seed)
    model = cls(**MP)
    text = jnp.asarray(rng.integers(0, 32, (b, tx)).astype(np.int32))
    proms = jnp.asarray(rng.integers(0, 32, (b, tp, 8)).astype(np.int32))
    # AR trains on level 0 only ([B, Tr]); NAR on all levels ([B, Tr, 8])
    resp_shape = (b, tr) if cls is VALLEAR else (b, tr, 8)
    resps = jnp.asarray(rng.integers(0, 32, resp_shape).astype(np.int32))
    variables = model.init(
        {"params": jax.random.key(1), "dropout": jax.random.key(2),
         "noise": jax.random.key(3)},
        text, jnp.full((b,), tx, jnp.int32), proms,
        jnp.full((b,), tp, jnp.int32), resps, jnp.full((b,), tr, jnp.int32),
        deterministic=True,
    )
    return model, variables


def test_ar_padded_text_and_prompt_inert():
    b, tx, tp, steps = 2, 7, 5, 6
    model, variables = _init(VALLEAR, tx=tx, tp=tp, tr=1)
    rng = np.random.default_rng(1)
    text = rng.integers(0, 32, (b, tx)).astype(np.int32)
    proms = rng.integers(0, 32, (b, tp, 8)).astype(np.int32)
    tl = jnp.asarray([tx, tx - 3])
    pl = jnp.asarray([tp, tp - 2])

    out = ar_generate(
        model, variables, jax.random.key(0), jnp.asarray(text), tl,
        jnp.asarray(proms), pl, max_steps=steps,
    )
    # pad text to 16 and prompt to capacity with GARBAGE values
    text_p = np.full((b, 16), 31, np.int32)
    text_p[:, :tx] = text
    proms_p = np.full((b, 12, 8), 31, np.int32)
    proms_p[:, :tp] = proms
    out_p = ar_generate(
        model, variables, jax.random.key(0), jnp.asarray(text_p), tl,
        jnp.asarray(proms_p), pl, max_steps=steps,
    )
    np.testing.assert_array_equal(out["codes"], out_p["codes"])
    np.testing.assert_array_equal(out["resp_lens"], out_p["resp_lens"])


def test_nar_padded_capacity_inert():
    b, tx, tp, tr_valid, tr_cap = 2, 8, 6, 4, 9
    model, variables = _init(VALLENAR)
    rng = np.random.default_rng(2)
    text = jnp.asarray(rng.integers(0, 32, (b, tx)).astype(np.int32))
    proms = jnp.asarray(rng.integers(0, 32, (b, tp, 8)).astype(np.int32))
    tl = jnp.full((b,), tx, jnp.int32)
    pl = jnp.full((b,), tp, jnp.int32)
    level0 = rng.integers(0, 32, (b, tr_valid)).astype(np.int32)
    rl = jnp.asarray([tr_valid, tr_valid - 1])

    # near-argmax sampling so the comparison is rng-shape independent
    temp = 1e-4
    codes = nar_generate(
        model, variables, jax.random.key(5), text, tl, proms, pl,
        jnp.asarray(level0), rl, sampling_temperature=temp,
    )
    # padded capacity with AR-style garbage: stop tokens (== n_tokens, OUT
    # of the NAR codebook range) beyond each row's resp_lens
    level0_p = np.full((b, tr_cap), MP["n_tokens"], np.int32)
    level0_p[:, :tr_valid] = level0
    level0_p[1, tr_valid - 1:] = MP["n_tokens"]
    codes_p = nar_generate(
        model, variables, jax.random.key(5), text, tl, proms, pl,
        jnp.asarray(level0_p), rl, sampling_temperature=temp,
    )
    assert np.isfinite(np.asarray(codes_p)).all()
    for i, n in enumerate(np.asarray(rl)):
        np.testing.assert_array_equal(
            np.asarray(codes)[i, :n], np.asarray(codes_p)[i, :n]
        )
