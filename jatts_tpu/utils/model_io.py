"""Transfer-learning helpers on flax param trees
(reference jatts/utils/model_io.py:12-115: filter_modules /
get_partial_state_dict / transfer_verification / freeze_modules)."""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Sequence

import jax
import optax


def _flat(params) -> Dict[str, Any]:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for path, leaf in flat:
        key = "/".join(getattr(p, "key", str(p)) for p in path)
        out[key] = leaf
    return out


def filter_modules(params, modules: Sequence[str]) -> List[str]:
    """Return matching top-level prefixes; warn on misses
    (reference model_io.py:12-38)."""
    keys = set(_flat(params))
    matched = [m for m in modules if any(k.startswith(m) for k in keys)]
    missing = set(modules) - set(matched)
    if missing:
        logging.warning(f"modules not found in params: {sorted(missing)}")
    return matched


def get_partial_params(src_params, dst_params, modules: Sequence[str]):
    """Copy leaves under ``modules`` prefixes from src into dst (shape-checked),
    returning the merged tree (reference get_partial_state_dict +
    transfer_verification, model_io.py:41-97)."""
    src = _flat(src_params)

    def merge(path, dst_leaf):
        key = "/".join(getattr(p, "key", str(p)) for p in path)
        if any(key.startswith(m) for m in modules):
            if key in src and src[key].shape == dst_leaf.shape:
                return src[key]
            logging.warning(f"skip transfer of {key} (missing or shape mismatch)")
        return dst_leaf

    return jax.tree_util.tree_map_with_path(merge, dst_params)


def freeze_modules_mask(params, modules: Sequence[str]):
    """Boolean mask tree: True = trainable, False = frozen
    (reference freeze_modules, model_io.py:100-115). Use with
    ``optax.masked`` / ``zero_frozen_grads``."""

    def mask(path, _):
        key = "/".join(getattr(p, "key", str(p)) for p in path)
        return not any(key.startswith(m) for m in modules)

    return jax.tree_util.tree_map_with_path(mask, params)


def freeze_optimizer(tx, params, frozen_modules: Sequence[str]):
    """Wrap an optax optimizer so frozen modules get zero updates."""
    mask = freeze_modules_mask(params, frozen_modules)
    return optax.multi_transform(
        {True: tx, False: optax.set_to_zero()},
        jax.tree_util.tree_map(lambda m: m, mask),
    )
