"""Pallas MAS kernel vs the scan reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from jatts_tpu.ops.mas import mas_path
from jatts_tpu.ops.mas_pallas import mas_path_pallas


def test_pallas_mas_matches_scan():
    rng = np.random.default_rng(0)
    b, t_feats, t_text = 2, 64, 16
    lp = jax.nn.log_softmax(
        jnp.array(rng.normal(size=(b, t_feats, t_text)).astype(np.float32)), axis=-1
    )
    tl = jnp.array([16, 9])
    fl = jnp.array([64, 40])
    want = np.asarray(mas_path(lp, tl, fl))
    got = np.asarray(mas_path_pallas(lp, tl, fl, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_mas_matches_scan_batched_shapes():
    """Production-like shape with a non-power-of-two frame count (exercises
    the frame-block divisor pick) and ragged lengths."""
    rng = np.random.default_rng(1)
    b, t_feats, t_text = 8, 96, 128
    lp = jax.nn.log_softmax(
        jnp.array(rng.normal(size=(b, t_feats, t_text)).astype(np.float32)), axis=-1
    )
    tl = jnp.array(rng.integers(2, t_text + 1, (b,)))
    fl = jnp.array([max(int(t), 96 - 7 * i) for i, t in enumerate(tl)])
    fl = jnp.minimum(fl, t_feats)
    want = np.asarray(mas_path(lp, tl, fl))
    got = np.asarray(mas_path_pallas(lp, tl, fl, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_viterbi_decode_backend_wirethrough():
    """Model-facing viterbi_decode routes through the Pallas kernel when the
    backend flag asks for it (interpret mode on CPU) with identical outputs."""
    from jatts_tpu.ops.mas import viterbi_decode

    rng = np.random.default_rng(2)
    b, t_feats, t_text = 2, 32, 16
    lp = jax.nn.log_softmax(
        jnp.array(rng.normal(size=(b, t_feats, t_text)).astype(np.float32)), axis=-1
    )
    tl = jnp.array([16, 10])
    fl = jnp.array([32, 25])
    ds_scan, bl_scan = viterbi_decode(lp, tl, fl, backend="scan")
    ds_pal, bl_pal = viterbi_decode(lp, tl, fl, backend="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(ds_scan), np.asarray(ds_pal))
    np.testing.assert_allclose(float(bl_scan), float(bl_pal), rtol=1e-6)
