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
