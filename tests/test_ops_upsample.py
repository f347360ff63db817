import jax.numpy as jnp
import numpy as np

from jatts_tpu.ops.upsample import (
    average_by_duration,
    duration_assignment,
    gaussian_upsampling,
    predicted_durations_to_int,
    regulate_length,
)


def _np_repeat_interleave(hs, ds, t_feats):
    """Reference semantics: torch.repeat_interleave + pad
    (jatts/modules/length_regulator.py:70-97)."""
    b, t_text, c = hs.shape
    out = np.zeros((b, t_feats, c), dtype=hs.dtype)
    for i in range(b):
        rep = np.repeat(hs[i], ds[i].astype(int), axis=0)
        out[i, : len(rep)] = rep[:t_feats]
    return out


def test_regulate_length_matches_repeat_interleave():
    rng = np.random.default_rng(0)
    hs = rng.normal(size=(3, 5, 7)).astype(np.float32)
    ds = np.array([[2, 0, 3, 1, 0], [1, 1, 1, 1, 1], [4, 2, 0, 0, 0]], np.int32)
    t_feats = 8
    got = np.asarray(regulate_length(jnp.array(hs), jnp.array(ds), t_feats))
    want = _np_repeat_interleave(hs, ds, t_feats)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_duration_assignment_rows_sum_to_one_inside():
    ds = jnp.array([[3, 2, 1]])
    r = np.asarray(duration_assignment(ds, 8))
    assert r[:, :6].sum() == 6  # 6 valid frames each assigned to one token
    assert r[:, 6:].sum() == 0  # frames past sum(ds) unassigned


def test_predicted_durations_to_int():
    d_outs = jnp.log(jnp.array([[1.0, 2.4, 0.2]]) + 1.0)
    np.testing.assert_array_equal(
        np.asarray(predicted_durations_to_int(d_outs)), [[1, 2, 0]]
    )


def _np_gaussian_upsampling(hs, ds, h_masks, d_masks, delta=0.1):
    b, t_text, _ = hs.shape
    t_feats = h_masks.shape[-1]
    t = np.arange(t_feats)[None].repeat(b, 0).astype(np.float64) * h_masks
    c = np.cumsum(ds, -1) - ds / 2.0
    energy = -delta * (t[:, :, None] - c[:, None, :]) ** 2
    energy = np.where(d_masks[:, None, :].astype(bool), energy, -np.inf)
    e = np.exp(energy - energy.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    return p @ hs


def test_gaussian_upsampling_matches_reference():
    rng = np.random.default_rng(1)
    hs = rng.normal(size=(2, 4, 3)).astype(np.float32)
    ds = np.array([[2, 3, 1, 0], [1, 1, 2, 2]], np.float32)
    h_masks = np.array([[1] * 6 + [0] * 2, [1] * 6 + [0] * 2], np.float32)
    d_masks = np.array([[1, 1, 1, 0], [1, 1, 1, 1]], np.float32)
    got = np.asarray(
        gaussian_upsampling(
            jnp.array(hs), jnp.array(ds), jnp.array(h_masks), jnp.array(d_masks)
        )
    )
    want = _np_gaussian_upsampling(hs, ds, h_masks, d_masks)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def _np_average_by_duration(ds, xs, text_lengths, feats_lengths):
    """Mirror of the reference numba kernel (alignments.py:458-476)."""
    b = ds.shape[0]
    out = np.zeros_like(ds, dtype=np.float64)
    for i in range(b):
        d = ds[i, : text_lengths[i]].astype(int)
        cum = np.concatenate([[0], np.cumsum(d)])
        x = xs[i, : feats_lengths[i]]
        for n in range(len(d)):
            seg = x[cum[n] : cum[n + 1]]
            out[i, n] = seg.mean() if len(seg) else 0.0
    return out


def test_average_by_duration_matches_numba_semantics():
    rng = np.random.default_rng(2)
    xs = rng.normal(size=(2, 10)).astype(np.float32)
    ds = np.array([[3, 2, 5, 0], [4, 0, 4, 2]], np.float32)
    tl = np.array([3, 4])
    fl = np.array([10, 10])
    got = np.asarray(
        average_by_duration(jnp.array(xs), jnp.array(ds), jnp.array(tl), jnp.array(fl))
    )
    want = _np_average_by_duration(ds, xs, tl, fl)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_average_by_duration_only_positive():
    xs = np.array([[0.0, 2.0, 4.0, 0.0, 6.0]], np.float32)
    ds = np.array([[3, 2]], np.float32)
    got = np.asarray(
        average_by_duration(
            jnp.array(xs),
            jnp.array(ds),
            jnp.array([2]),
            jnp.array([5]),
            only_positive=True,
        )
    )
    # token 0 covers [0,2,4] -> mean of {2,4}=3; token 1 covers [0,6] -> 6
    np.testing.assert_allclose(got, [[3.0, 6.0]], rtol=1e-6)


def test_gaussian_upsampling_all_masked_row_is_inert():
    """A fully padded row (pad_batch_to_devices repeat with zeroed lens:
    d_masks all False) must produce zeros, not NaN — the -inf softmax NaN
    survived mask multiplication and NaNed the whole VITS/Matcha-MAS loss."""
    import jax.numpy as jnp
    import numpy as np

    from jatts_tpu.ops.upsample import gaussian_upsampling

    rng = np.random.default_rng(0)
    hs = jnp.asarray(rng.normal(size=(2, 5, 3)).astype(np.float32))
    ds = jnp.asarray([[2.0, 1.0, 3.0, 0.0, 0.0], [0.0] * 5])
    d_masks = jnp.asarray([[True, True, True, False, False], [False] * 5])
    h_masks = jnp.asarray([[True] * 6, [False] * 6])
    out = gaussian_upsampling(hs, ds, h_masks=h_masks, d_masks=d_masks)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_array_equal(np.asarray(out[1]), 0.0)
    # valid row unchanged vs a batch with no padded rows
    out_solo = gaussian_upsampling(
        hs[:1], ds[:1], h_masks=h_masks[:1], d_masks=d_masks[:1]
    )
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(out_solo[0]))
