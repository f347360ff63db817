"""Length-mask utilities.

TPU-native replacement for the reference's ``make_pad_mask``/``make_non_pad_mask``
(`jatts/modules/utils.py:9-215`): instead of materialising boolean masks on the
host from python ints, we compute them inside jit from a lengths vector and a
*static* maximum length, so every batch in a bucket shares one compiled program.
"""

from __future__ import annotations

import jax.numpy as jnp


def sequence_mask(lengths: jnp.ndarray, maxlen: int, dtype=jnp.bool_) -> jnp.ndarray:
    """``[B] -> [B, maxlen]`` mask, True for valid (non-pad) positions.

    Equivalent to the reference's ``make_non_pad_mask(lengths)`` with a static
    ``maxlen`` (reference: jatts/modules/utils.py:112-215).
    """
    lengths = jnp.asarray(lengths)
    pos = jnp.arange(maxlen, dtype=lengths.dtype)
    return (pos[None, :] < lengths[:, None]).astype(dtype)


def pad_mask(lengths: jnp.ndarray, maxlen: int, dtype=jnp.bool_) -> jnp.ndarray:
    """True for PAD positions (reference ``make_pad_mask``)."""
    return ~sequence_mask(lengths, maxlen, jnp.bool_) if dtype == jnp.bool_ else (
        1 - sequence_mask(lengths, maxlen, dtype)
    )


def attn_mask(lengths: jnp.ndarray, maxlen: int) -> jnp.ndarray:
    """``[B, 1, maxlen]`` self-attention key mask (reference ``_source_mask``,
    jatts/models/fastspeech2.py:737-761)."""
    return sequence_mask(lengths, maxlen)[:, None, :]


def causal_mask(maxlen: int) -> jnp.ndarray:
    """``[maxlen, maxlen]`` lower-triangular mask (reference
    ``subsequent_mask``, jatts/modules/transformer/mask.py:9)."""
    return jnp.tril(jnp.ones((maxlen, maxlen), dtype=jnp.bool_))
