"""Flat-YAML + CLI-overlay config contract (reference jatts/bin/tts_train.py:177-194).

The YAML experiment config is loaded as a flat dict, overlaid with CLI args
(``config.update(vars(args))``), and re-dumped to ``outdir/config.yml`` for
provenance.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import yaml


def load_config(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.load(f, Loader=yaml.SafeLoader)


def overlay_args(config: Dict[str, Any], args) -> Dict[str, Any]:
    config = dict(config)
    config.update({k: v for k, v in vars(args).items()})
    return config


def dump_config(config: Dict[str, Any], path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    clean = {k: v for k, v in config.items() if _yaml_safe(v)}
    with open(path, "w") as f:
        yaml.dump(clean, f, Dumper=yaml.SafeDumper, default_flow_style=False)


def _yaml_safe(v: Any) -> bool:
    if isinstance(v, (str, int, float, bool, type(None))):
        return True
    if isinstance(v, (list, tuple)):
        return all(_yaml_safe(x) for x in v)
    if isinstance(v, dict):
        return all(isinstance(k, str) and _yaml_safe(x) for k, x in v.items())
    return False
