"""Weight-initialization dispatcher (reference jatts/modules/initialize.py:12-125).

The reference re-initializes a constructed torch module in place:
every >1-dim parameter gets xavier/kaiming (or chainer lecun-normal),
biases are zeroed, and Embedding/LayerNorm/GroupNorm are reset to their
torch defaults. Flax parameters are created by per-module initializers, so
here the dispatcher is a pure pytree transform applied right after
``model.init`` — same result, functional style.

Mapping of the torch rules onto flax param names:
- ``bias`` -> zeros (torch zeroes all biases);
- ``embedding`` -> untouched (torch resets Embedding to N(0,1), which is
  already the flax default used by our models);
- ``scale`` / ``alpha`` (LayerNorm/BatchNorm/ScaledPE, 1-dim) -> untouched
  (torch resets norms to ones);
- everything with ndim > 1 (Dense/Conv kernels, pos biases, WaveNet convs)
  -> the chosen initializer, with torch's fan convention (conv kernels
  [k..., in, out]: fan_in = in * receptive_field).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np

_KEEP_NAMES = {"embedding", "scale", "alpha", "mean", "var"}


def _fans(shape) -> tuple:
    receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    fan_in = shape[-2] * receptive
    fan_out = shape[-1] * receptive
    return fan_in, fan_out


def _draw(rng, shape, dtype, init_type: str):
    fan_in, fan_out = _fans(shape)
    if init_type == "xavier_uniform":
        bound = float(np.sqrt(6.0 / (fan_in + fan_out)))
        return jax.random.uniform(rng, shape, dtype, -bound, bound)
    if init_type == "xavier_normal":
        std = float(np.sqrt(2.0 / (fan_in + fan_out)))
        return jax.random.normal(rng, shape, dtype) * std
    if init_type == "kaiming_uniform":
        # torch kaiming_uniform(nonlinearity="relu"): gain sqrt(2), fan_in
        bound = float(np.sqrt(6.0 / fan_in))
        return jax.random.uniform(rng, shape, dtype, -bound, bound)
    if init_type == "kaiming_normal":
        std = float(np.sqrt(2.0 / fan_in))
        return jax.random.normal(rng, shape, dtype) * std
    if init_type == "chainer":
        # lecun normal (reference initialize:26-52)
        std = 1.0 / float(np.sqrt(fan_in))
        return jax.random.normal(rng, shape, dtype) * std
    raise ValueError(f"Unknown initialization: {init_type}")


def initialize(params: Dict[str, Any], init_type: str | None, rng) -> Dict[str, Any]:
    """Re-initialize a flax params tree per the reference's dispatcher.

    ``init_type`` of None/"" returns params unchanged (flax defaults).
    """
    if not init_type:
        return params

    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves, treedef = flat[0], flat[1]
    rngs = jax.random.split(rng, max(len(leaves), 1))
    new_leaves = []
    for (path, leaf), key in zip(leaves, rngs):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        in_embed = any(
            "embed" in (p.key if hasattr(p, "key") else str(p)).lower()
            for p in path
        )
        if name == "bias":
            new_leaves.append(jax.numpy.zeros_like(leaf))
        elif name in _KEEP_NAMES or in_embed or leaf.ndim <= 1:
            new_leaves.append(leaf)
        else:
            new_leaves.append(_draw(key, leaf.shape, leaf.dtype, init_type))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
