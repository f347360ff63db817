import jax
import jax.numpy as jnp
import numpy as np

from jatts_tpu.models.valle import VALLEAR, VALLENAR, ar_generate, pack_three

RNGS = {"params": jax.random.key(0), "dropout": jax.random.key(1), "noise": jax.random.key(2)}

TINY = dict(idim=0, n_tokens=32, d_model=32, n_heads=2, n_layers=2)


def _inputs(rng, b=2, tx=6, tp=8, tr=10, levels=1):
    resps = rng.integers(0, 32, (b, tr, levels)) if levels > 1 else rng.integers(0, 32, (b, tr))
    return dict(
        text=jnp.array(rng.integers(0, 32, (b, tx)).astype(np.int32)),
        text_lens=jnp.array([6, 4]),
        proms=jnp.array(rng.integers(0, 32, (b, tp, 8)).astype(np.int32)),
        prom_lens=jnp.array([8, 5]),
        resps=jnp.array(resps.astype(np.int32)),
        resp_lens=jnp.array([10, 7]),
    )


def test_pack_three_layout():
    b, d = 1, 4
    e_text = jnp.ones((b, 3, d)) * 1
    e_prom = jnp.ones((b, 2, d)) * 2
    e_resp = jnp.ones((b, 2, d)) * 3
    sep = jnp.ones((d,)) * 9
    packed, total = pack_three(
        e_text, jnp.array([2]), e_prom, jnp.array([2]), e_resp, jnp.array([1]), sep
    )
    row = np.asarray(packed)[0, :, 0]
    np.testing.assert_array_equal(row[:7], [1, 1, 9, 2, 2, 9, 3])
    assert int(total[0]) == 7
    assert (row[7:] == 0).all()


def _pack_three_multipass(e_text, text_lens, e_prom, prom_lens, e_resp,
                          resp_lens, sep):
    """The pre-fusion three-gather + four-where formulation, kept as the
    semantics reference for pack_three (which now does ONE gather from a
    concatenated source buffer)."""
    b, tx, d = e_text.shape
    tp = e_prom.shape[1]
    tr = e_resp.shape[1]
    s = tx + 1 + tp + 1 + tr
    pos = jnp.arange(s)[None, :]
    lx, lp, lr = text_lens[:, None], prom_lens[:, None], resp_lens[:, None]

    def gather(e, off, t):
        idx = jnp.clip(off, 0, t - 1)
        return jnp.take_along_axis(e, idx[..., None], axis=1)

    g_text = gather(e_text, pos, tx)
    g_prom = gather(e_prom, pos - (lx + 1), tp)
    g_resp = gather(e_resp, pos - (lx + lp + 2), tr)
    sep_b = jnp.broadcast_to(sep[None, None, :], (b, s, d))
    is_text = pos < lx
    is_sep1 = pos == lx
    is_prom = (pos > lx) & (pos < lx + 1 + lp)
    is_sep2 = pos == lx + 1 + lp
    is_resp = (pos > lx + 1 + lp) & (pos < lx + 2 + lp + lr)
    packed = jnp.zeros((b, s, d), e_text.dtype)
    packed = jnp.where(is_text[..., None], g_text, packed)
    packed = jnp.where((is_sep1 | is_sep2)[..., None], sep_b, packed)
    packed = jnp.where(is_prom[..., None], g_prom, packed)
    packed = jnp.where(is_resp[..., None], g_resp, packed)
    return packed, text_lens + prom_lens + resp_lens + 2


def test_pack_three_matches_multipass_formulation():
    rng = np.random.default_rng(3)
    for dtype in (jnp.float32, jnp.bfloat16):
        b, tx, tp, tr, d = 3, 7, 5, 9, 8
        e_text = jnp.asarray(rng.normal(size=(b, tx, d)), dtype)
        e_prom = jnp.asarray(rng.normal(size=(b, tp, d)), dtype)
        e_resp = jnp.asarray(rng.normal(size=(b, tr, d)), dtype)
        sep = jnp.asarray(rng.normal(size=(d,)), dtype)
        lens = (jnp.array([7, 3, 1]), jnp.array([5, 2, 4]), jnp.array([9, 6, 2]))

        def loss(fn, et):
            p, _ = fn(et, lens[0], e_prom, lens[1], e_resp, lens[2], sep)
            return (p.astype(jnp.float32) ** 2).sum()

        p_new, t_new = pack_three(e_text, lens[0], e_prom, lens[1], e_resp,
                                  lens[2], sep)
        p_old, t_old = _pack_three_multipass(e_text, lens[0], e_prom, lens[1],
                                             e_resp, lens[2], sep)
        np.testing.assert_array_equal(np.asarray(p_new), np.asarray(p_old))
        np.testing.assert_array_equal(np.asarray(t_new), np.asarray(t_old))
        g_new = jax.grad(lambda et: loss(pack_three, et))(e_text)
        g_old = jax.grad(lambda et: loss(_pack_three_multipass, et))(e_text)
        np.testing.assert_array_equal(np.asarray(g_new), np.asarray(g_old))


def test_valle_ar_train_and_generate():
    rng = np.random.default_rng(0)
    inp = _inputs(rng)
    model = VALLEAR(**TINY)
    variables = model.init(RNGS, **inp, deterministic=False)
    out = model.apply(variables, **inp, deterministic=False, rngs=RNGS)
    assert np.isfinite(float(out["loss"]))

    gen = jax.jit(
        lambda v, r: ar_generate(
            model, v, r, inp["text"], inp["text_lens"], inp["proms"],
            inp["prom_lens"], max_steps=12,
        )
    )(variables, jax.random.key(3))
    codes = np.asarray(gen["codes"])
    assert codes.shape == (2, 12)
    lens = np.asarray(gen["resp_lens"])
    assert ((0 <= lens) & (lens <= 12)).all()


def test_valle_nar_train_and_generate():
    rng = np.random.default_rng(1)
    inp = _inputs(rng, levels=8)
    model = VALLENAR(**TINY)
    variables = model.init(RNGS, **inp, deterministic=False)
    out = model.apply(variables, **inp, deterministic=False, rngs=RNGS)
    assert np.isfinite(float(out["loss"]))

    level0 = inp["resps"][:, :, 0]
    codes = model.apply(
        variables, inp["text"], inp["text_lens"], inp["proms"], inp["prom_lens"],
        level0, inp["resp_lens"], method=VALLENAR.generate,
        rngs={"noise": jax.random.key(4)},
    )
    codes = np.asarray(codes)
    assert codes.shape == (2, 10, 8)
    np.testing.assert_array_equal(codes[:, :, 0], np.asarray(level0))
    assert (codes >= 0).all() and (codes < 32).all()


def test_trunk_pad_to_128_exact():
    """pad_to_128 (the decode paths' awkward-length fix) must be
    semantically inert: pad rows are fully masked, so logits on the
    original packed positions match with and without padding up to
    reduction-order jitter (padding changes the contraction tiling,
    so bitwise equality is not guaranteed — observed ~4e-6 on CPU)."""
    rng = np.random.default_rng(3)
    inp = _inputs(rng, levels=8)
    model = VALLENAR(**TINY)
    variables = model.init(RNGS, **inp, deterministic=False)
    q = jnp.array([2, 4])

    def run(pad):
        logits, total = model.apply(
            variables, inp["text"], inp["text_lens"], inp["proms"],
            inp["prom_lens"], inp["resps"], inp["resp_lens"],
            q + 1, q, True, method=VALLENAR.trunk, pad_to_128=pad,
        )
        return np.asarray(logits), np.asarray(total)

    lo, to = run(False)
    lp, tp_ = run(True)
    np.testing.assert_array_equal(to, tp_)
    np.testing.assert_allclose(lo, lp, rtol=1e-4, atol=1e-5)


def test_valle_ar_remat_grad():
    rng = np.random.default_rng(5)
    inp = _inputs(rng)
    model = VALLEAR(**TINY, use_remat=True)
    variables = model.init(RNGS, **inp, deterministic=False)

    def loss(p):
        return model.apply(
            {"params": p}, **inp, deterministic=False, rngs=RNGS
        )["loss"]

    g = jax.grad(loss)(variables["params"])
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(g))


def test_valle_attn_backend_flash_cpu_fallback():
    """attn_backend='flash' on CPU: the trace-time gate falls back to the XLA
    path, and the trunk's 128-padding leaves logits on the valid region
    identical to the unpadded xla run."""
    import jax
    import jax.numpy as jnp

    from jatts_tpu.models.valle import VALLEAR

    b, tx, tp, tr = 2, 12, 20, 30
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(0, 40, (b, tx)).astype(np.int32))
    text_lens = jnp.asarray([12, 9])
    proms = jnp.asarray(rng.integers(0, 40, (b, tp, 8)).astype(np.int32))
    prom_lens = jnp.asarray([20, 15])
    resps = jnp.asarray(rng.integers(0, 40, (b, tr)).astype(np.int32))
    resp_lens = jnp.asarray([30, 22])

    kw = dict(idim=0, n_tokens=40, d_model=32, n_heads=2, n_layers=2,
              p_dropout=0.0)
    m_x = VALLEAR(**kw, attn_backend="xla")
    m_f = VALLEAR(**kw, attn_backend="flash")
    v = m_x.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                 text, text_lens, proms, prom_lens, resps, resp_lens,
                 deterministic=True)
    ox = m_x.apply(v, text, text_lens, proms, prom_lens, resps, resp_lens,
                   deterministic=True)
    of = m_f.apply(v, text, text_lens, proms, prom_lens, resps, resp_lens,
                   deterministic=True)
    np.testing.assert_allclose(
        np.asarray(ox["logits"]), np.asarray(of["logits"]), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(float(ox["loss"]), float(of["loss"]), rtol=1e-6)


def test_valle_bf16_compute_dtype():
    """dtype=bfloat16 threads through the blocks (bf16 KV caches halve
    decode bandwidth); logits come back f32 for loss/sampling stability."""
    import jax
    import jax.numpy as jnp

    from jatts_tpu.models.valle import VALLEAR, ar_generate

    b, tx, tp = 2, 8, 12
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(0, 40, (b, tx)).astype(np.int32))
    text_lens = jnp.asarray([8, 6])
    proms = jnp.asarray(rng.integers(0, 40, (b, tp, 8)).astype(np.int32))
    prom_lens = jnp.asarray([12, 9])
    resps = jnp.asarray(rng.integers(0, 40, (b, 10)).astype(np.int32))
    resp_lens = jnp.asarray([10, 7])

    m = VALLEAR(idim=0, n_tokens=40, d_model=32, n_heads=2, n_layers=2,
                p_dropout=0.0, dtype=jnp.bfloat16)
    v = m.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
               text, text_lens, proms, prom_lens, resps, resp_lens,
               deterministic=True)
    out = m.apply(v, text, text_lens, proms, prom_lens, resps, resp_lens,
                  deterministic=True)
    assert out["logits"].dtype == jnp.float32
    assert np.isfinite(float(out["loss"]))
    gen = ar_generate(m, v, jax.random.key(2), text, text_lens, proms,
                      prom_lens, max_steps=6)
    assert np.asarray(gen["codes"]).shape[1] == 6


def test_selective_remat_policy_parity():
    """`remat_policy` (jax.checkpoint_policies name, e.g. 'dots_saveable')
    must be loss- AND grad-exact vs the plain and full-remat paths — it only
    changes what the bwd pass rematerializes."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    b = 2
    batch = dict(
        text=jnp.asarray(rng.integers(0, 32, (b, 6)).astype(np.int32)),
        text_lens=jnp.full((b,), 6, jnp.int32),
        proms=jnp.asarray(rng.integers(0, 32, (b, 8, 8)).astype(np.int32)),
        prom_lens=jnp.full((b,), 8, jnp.int32),
        resps=jnp.asarray(rng.integers(0, 32, (b, 10, 8)).astype(np.int32)),
        resp_lens=jnp.full((b,), 10, jnp.int32),
    )
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "noise": jax.random.key(2)}
    results = {}
    for name, kw in (("plain", {}), ("full", {"use_remat": True}),
                     ("sel", {"use_remat": True,
                              "remat_policy": "dots_saveable"})):
        m = VALLENAR(idim=0, n_tokens=32, d_model=32, n_heads=2, n_layers=2,
                     **kw)
        v = m.init(rngs, **batch, deterministic=True)

        def apply(p, m=m):
            return m.apply({"params": p}, **batch, deterministic=True,
                           rngs={"noise": jax.random.key(2)})["loss"]

        loss = float(apply(v["params"]))
        g1 = float(
            jax.tree_util.tree_reduce(
                lambda a, x: a + jnp.abs(x).sum(),
                jax.grad(apply)(v["params"]), 0.0,
            )
        )
        results[name] = (loss, g1)
    assert results["plain"] == results["full"] == results["sel"], results
