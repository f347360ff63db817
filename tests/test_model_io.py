import jax.numpy as jnp
import numpy as np

from jatts_tpu.utils.model_io import (
    filter_modules,
    freeze_modules_mask,
    get_partial_params,
)


def _params(scale):
    return {
        "encoder": {"dense": {"kernel": jnp.ones((2, 3)) * scale, "bias": jnp.zeros(3)}},
        "decoder": {"dense": {"kernel": jnp.ones((3, 2)) * scale}},
    }


def test_filter_modules():
    p = _params(1.0)
    assert filter_modules(p, ["encoder", "nonexistent"]) == ["encoder"]


def test_get_partial_params_transfers_matching_shapes():
    src, dst = _params(5.0), _params(1.0)
    merged = get_partial_params(src, dst, ["encoder"])
    np.testing.assert_array_equal(np.asarray(merged["encoder"]["dense"]["kernel"]), 5.0 * np.ones((2, 3)))
    np.testing.assert_array_equal(np.asarray(merged["decoder"]["dense"]["kernel"]), np.ones((3, 2)))


def test_get_partial_params_skips_shape_mismatch():
    src = {"encoder": {"dense": {"kernel": jnp.ones((9, 9))}}}
    dst = _params(1.0)
    merged = get_partial_params(src, dst, ["encoder"])
    np.testing.assert_array_equal(np.asarray(merged["encoder"]["dense"]["kernel"]), np.ones((2, 3)))


def test_freeze_modules_mask():
    mask = freeze_modules_mask(_params(1.0), ["decoder"])
    assert mask["encoder"]["dense"]["kernel"] is True
    assert mask["decoder"]["dense"]["kernel"] is False
