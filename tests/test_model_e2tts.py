import jax
import jax.numpy as jnp
import numpy as np

from jatts_tpu.models.e2tts import E2TTS, mask_from_frac_lengths

RNGS = {"params": jax.random.key(0), "dropout": jax.random.key(1), "noise": jax.random.key(2)}

TINY = dict(idim=20, odim=8, dim=32, depth=4, heads=2, ff_mult=2, pe_attn_head=1)


def test_mask_from_frac_lengths():
    m = np.asarray(
        mask_from_frac_lengths(jax.random.key(0), jnp.array([20, 10]), 0.7, 1.0, 24)
    )
    assert m.shape == (2, 24)
    # span length within [0.7, 1.0] * seq_len
    assert 14 <= m[0].sum() <= 20
    assert 7 <= m[1].sum() <= 10
    # contiguous
    for row in m:
        idx = np.where(row)[0]
        assert (np.diff(idx) == 1).all()


def test_e2tts_train_loss_and_grad():
    rng = np.random.default_rng(0)
    text = jnp.array(rng.integers(0, 20, (2, 10)).astype(np.int32))
    text = text.at[1, 6:].set(-1)  # pad
    feats = jnp.array(rng.normal(size=(2, 24, 8)).astype(np.float32))
    lens = jnp.array([24, 16])
    model = E2TTS(**TINY)
    variables = model.init(RNGS, text, feats, lens, deterministic=False)
    out = model.apply(variables, text, feats, lens, deterministic=False, rngs=RNGS)
    assert np.isfinite(float(out["loss"]))

    g = jax.grad(
        lambda p: model.apply(
            {"params": p}, text, feats, lens, deterministic=False, rngs=RNGS
        )["loss"]
    )(variables["params"])
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(g))


def test_e2tts_inference_cfg():
    rng = np.random.default_rng(1)
    text = jnp.array(rng.integers(0, 20, (2, 10)).astype(np.int32))
    feats = jnp.array(rng.normal(size=(2, 24, 8)).astype(np.float32))
    lens = jnp.array([24, 16])
    model = E2TTS(**TINY)
    variables = model.init(RNGS, text, feats, lens, deterministic=False)
    cond = jnp.zeros((2, 32, 8))
    out = model.apply(
        variables, cond, text, jnp.array([8, 6]), jnp.array([28, 20]),
        2, 2.0, -1.0, method=E2TTS.inference, rngs={"noise": jax.random.key(5)},
    )
    fg = np.asarray(out["feat_gen"])
    assert fg.shape == (2, 32, 8)
    assert np.isfinite(fg).all()
    # frames beyond duration are zero
    assert np.abs(fg[1, 20:]).sum() == 0


def test_unett_text_embed_cache_exact():
    """The inference-time text-embedding cache (reference unett.py:223-233)
    must be semantically inert: UNetT called with a precomputed
    ``text_embed`` (from ``return_text_embed=True``) is bit-identical to
    the self-computing path, for both CFG branches."""
    rng = np.random.default_rng(3)
    b, n, nt = 2, 16, 6
    model = E2TTS(**TINY)
    text = jnp.array(rng.integers(0, 20, (b, nt)).astype(np.int32))
    feats = jnp.array(rng.normal(size=(b, n, 8)).astype(np.float32))
    lens = jnp.array([n, n - 4])
    variables = model.init(RNGS, text, feats, lens, deterministic=False)

    x = jnp.array(rng.normal(size=(b, n, 8)).astype(np.float32))
    cond = jnp.array(rng.normal(size=(b, n, 8)).astype(np.float32))
    time = jnp.full((b,), 0.3, jnp.float32)
    mask = jnp.arange(n)[None, :] < lens[:, None]

    def net(*args, **kw):
        return model.apply(
            variables, *args, **kw,
            method=lambda mdl, *a, **k: mdl.net(*a, **k),
        )

    for drop in (jnp.zeros((b,), bool), jnp.ones((b,), bool)):
        want = net(x, cond, text, time, drop, drop, mask)
        te = net(x, cond, text, time, drop, drop, mask,
                 return_text_embed=True)
        got = net(x, cond, text, time, drop, drop, mask, text_embed=te)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
