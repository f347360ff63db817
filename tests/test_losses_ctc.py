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


def test_forward_sum_zero_length_rows_inert():
    """Padded rows (ilens=0/olens=0) must leave the loss exactly equal to
    the unpadded batch's loss (they previously contributed a spurious ~1.0
    to the mean on every non-divisible multi-device batch)."""
    import jax
    import jax.numpy as jnp

    from jatts_tpu.losses.align import ForwardSumLoss

    rng = np.random.default_rng(0)
    b, t_feats, t_text = 3, 24, 8
    lp = jax.nn.log_softmax(
        jnp.asarray(rng.normal(size=(b, t_feats, t_text)).astype(np.float32)),
        axis=-1,
    )
    loss_fn = ForwardSumLoss()
    ilens = jnp.asarray([6, 4, 5])
    olens = jnp.asarray([20, 16, 24])
    base = float(loss_fn(lp, ilens, olens))

    lp_pad = jnp.concatenate([lp, lp[-1:]], axis=0)  # garbage repeated row
    padded = float(loss_fn(
        lp_pad,
        jnp.concatenate([ilens, jnp.zeros((1,), ilens.dtype)]),
        jnp.concatenate([olens, jnp.zeros((1,), olens.dtype)]),
    ))
    np.testing.assert_allclose(padded, base, rtol=1e-6)


def test_forward_sum_infeasible_row_zeroed():
    """olens < ilens (over-cropped utterance) is zeroed like torch
    zero_infinity=True (reference forward_sum_loss.py:72) instead of
    contributing a ~1e9-scale loss."""
    import jax
    import jax.numpy as jnp

    from jatts_tpu.losses.align import ForwardSumLoss

    rng = np.random.default_rng(1)
    b, t_feats, t_text = 2, 20, 18
    lp = jax.nn.log_softmax(
        jnp.asarray(rng.normal(size=(b, t_feats, t_text)).astype(np.float32)),
        axis=-1,
    )
    loss_fn = ForwardSumLoss()
    # row 1: 18 tokens into 4 frames — infeasible
    loss = float(loss_fn(lp, jnp.asarray([9, 18]), jnp.asarray([20, 4])))
    solo = float(loss_fn(lp[:1], jnp.asarray([9]), jnp.asarray([20])))
    assert loss < 1e4, "infeasible row exploded the loss"
    # torch 'mean' semantics: zeroed row stays in the denominator
    np.testing.assert_allclose(loss, solo / 2, rtol=1e-6)
