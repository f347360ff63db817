import jax.numpy as jnp
import numpy as np

from jatts_tpu.ops.masks import attn_mask, causal_mask, pad_mask, sequence_mask


def test_sequence_mask():
    m = sequence_mask(jnp.array([5, 3]), 5)
    np.testing.assert_array_equal(
        np.asarray(m),
        [[1, 1, 1, 1, 1], [1, 1, 1, 0, 0]],
    )


def test_pad_mask_is_complement():
    lens = jnp.array([2, 4, 0])
    np.testing.assert_array_equal(
        np.asarray(pad_mask(lens, 4)), ~np.asarray(sequence_mask(lens, 4))
    )


def test_attn_mask_shape():
    assert attn_mask(jnp.array([3, 2]), 6).shape == (2, 1, 6)


def test_causal_mask():
    m = np.asarray(causal_mask(3))
    np.testing.assert_array_equal(m, [[1, 0, 0], [1, 1, 0], [1, 1, 1]])
