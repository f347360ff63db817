import jax
import jax.numpy as jnp
import numpy as np

from jatts_tpu.ops.mas import mas_path, viterbi_decode


def _np_mas(log_p_attn):
    """Literal re-derivation of the reference numba DP
    (jatts/modules/alignments.py:63-94)."""
    t_mel, t_inp = log_p_attn.shape
    q = np.full((t_inp, t_mel), -np.inf)
    lp = log_p_attn.T
    for j in range(t_mel):
        q[0, j] = lp[0, : j + 1].sum()
    for j in range(1, t_mel):
        for i in range(1, min(j + 1, t_inp)):
            q[i, j] = max(q[i - 1, j - 1], q[i, j - 1]) + lp[i, j]
    a = np.full((t_mel,), t_inp - 1)
    for j in range(t_mel - 2, -1, -1):
        i_a, i_b = a[j + 1] - 1, a[j + 1]
        if i_b == 0:
            a[j] = 0
        else:
            a[j] = i_a if q[i_a, j] >= q[i_b, j] else i_b
    return a


def test_mas_matches_numba_reference_random_lattices():
    rng = np.random.default_rng(0)
    b, t_feats, t_text = 4, 37, 11
    scores = rng.normal(size=(b, t_feats, t_text)).astype(np.float32)
    lp = jax.nn.log_softmax(jnp.array(scores), axis=-1)
    tl = np.array([11, 7, 3, 1])
    fl = np.array([37, 30, 11, 5])
    path = np.asarray(mas_path(lp, jnp.array(tl), jnp.array(fl)))
    lp_np = np.asarray(lp)
    for i in range(b):
        want = _np_mas(lp_np[i, : fl[i], : tl[i]])
        np.testing.assert_array_equal(path[i, : fl[i]], want, err_msg=f"utt {i}")


def test_viterbi_decode_durations_and_bin_loss():
    rng = np.random.default_rng(1)
    b, t_feats, t_text = 3, 25, 6
    lp = jax.nn.log_softmax(
        jnp.array(rng.normal(size=(b, t_feats, t_text)).astype(np.float32)), axis=-1
    )
    tl = np.array([6, 4, 2])
    fl = np.array([25, 18, 9])
    ds, bin_loss = viterbi_decode(lp, jnp.array(tl), jnp.array(fl))
    ds = np.asarray(ds)
    # durations sum to feats lengths, zero beyond text length
    np.testing.assert_array_equal(ds.sum(-1), fl)
    for i in range(b):
        assert (ds[i, tl[i] :] == 0).all()
    # bin loss equals the numpy recomputation
    lp_np = np.asarray(lp)
    want = 0.0
    for i in range(b):
        a = _np_mas(lp_np[i, : fl[i], : tl[i]])
        want += -lp_np[i, np.arange(fl[i]), a].mean()
    want /= b
    np.testing.assert_allclose(float(bin_loss), want, rtol=1e-5)


def test_mas_monotone_and_complete():
    rng = np.random.default_rng(2)
    lp = jax.nn.log_softmax(
        jnp.array(rng.normal(size=(1, 50, 8)).astype(np.float32)), axis=-1
    )
    path = np.asarray(mas_path(lp, jnp.array([8]), jnp.array([50])))[0]
    assert path[0] == 0 and path[-1] == 7
    assert ((np.diff(path) == 0) | (np.diff(path) == 1)).all()


def test_mas_is_jittable():
    f = jax.jit(mas_path)
    lp = jax.nn.log_softmax(jnp.zeros((2, 10, 4)), axis=-1)
    out = f(lp, jnp.array([4, 3]), jnp.array([10, 8]))
    assert out.shape == (2, 10)
