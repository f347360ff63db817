"""VALL-E loss assembly (reference jatts/trainers/valle.py:44-91): plain CE
from the model; AR vs NAR chosen by model class."""

from __future__ import annotations

from typing import Any, Dict

from jatts_tpu.train.steps import _apply


def valle_loss(
    model, params, batch_stats, batch: Dict[str, Any], rng, criterions,
    config, step, deterministic: bool,
):
    resps = batch["resps"]
    if type(model).__name__ == "VALLEAR" and resps.ndim == 3:
        resps = resps[:, :, 0]  # AR trains on codec level 0 only
    kwargs = dict(
        text=batch["text"], text_lens=batch["text_lens"],
        proms=batch["proms"], prom_lens=batch["prom_lens"],
        resps=resps, resp_lens=batch["resp_lens"],
    )
    out, new_bs = _apply(
        model, params, batch_stats, rng, deterministic, extra_rngs=("noise",), **kwargs
    )
    return out["loss"], ({"train/loss_ce": out["loss"]}, new_bs)
