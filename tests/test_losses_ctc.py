"""ForwardSumLoss CTC recursion vs torch.nn.functional.ctc_loss golden, and
beta-binomial prior vs scipy."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jatts_tpu.losses.align import ForwardSumLoss, beta_binomial_prior, ctc_forward_sum

torch = pytest.importorskip("torch")


def test_ctc_forward_matches_torch():
    rng = np.random.default_rng(0)
    b, t_feats, t_text = 3, 20, 5
    lp = jax.nn.log_softmax(
        jnp.array(rng.normal(size=(b, t_feats, t_text + 1)).astype(np.float32)), -1
    )
    tl = np.array([5, 3, 4])
    fl = np.array([20, 15, 9])
    got = np.asarray(ctc_forward_sum(lp, jnp.array(tl), jnp.array(fl)))

    lp_t = torch.from_numpy(np.asarray(lp))
    for i in range(b):
        want = torch.nn.functional.ctc_loss(
            lp_t[i, : fl[i], : tl[i] + 1].unsqueeze(1),
            torch.arange(1, tl[i] + 1).unsqueeze(0),
            torch.tensor([fl[i]]), torch.tensor([tl[i]]),
            reduction="sum", zero_infinity=True,
        )
        np.testing.assert_allclose(got[i], want.item(), rtol=1e-4, err_msg=f"utt {i}")


def test_beta_binomial_prior_matches_scipy():
    from scipy.stats import betabinom

    tl = np.array([4, 6])
    fl = np.array([12, 9])
    prior = np.asarray(beta_binomial_prior(jnp.array(tl), jnp.array(fl), 6, 12))
    for b in range(2):
        T, N = fl[b], tl[b]
        for t in range(T):
            a = t + 1.0
            bb = T - t
            want = betabinom.logpmf(np.arange(N), N, a, bb)
            np.testing.assert_allclose(
                prior[b, t, :N], want, rtol=1e-4, atol=1e-5,
                err_msg=f"b={b} t={t}",
            )


def test_forward_sum_loss_finite_and_positive():
    rng = np.random.default_rng(1)
    lp = jax.nn.log_softmax(
        jnp.array(rng.normal(size=(2, 18, 6)).astype(np.float32)), -1
    )
    loss = ForwardSumLoss()(lp, jnp.array([6, 4]), jnp.array([18, 12]))
    assert np.isfinite(float(loss)) and float(loss) > 0
