"""VALL-E loss assembly (reference jatts/trainers/valle.py:44-91): plain CE
from the model; AR vs NAR chosen by model class."""

from __future__ import annotations

from typing import Any, Dict

from jatts_tpu.train.steps import _apply


def valle_kwargs(batch: Dict[str, Any], model=None) -> Dict[str, Any]:
    resps = batch["resps"]
    if model is not None and type(model).__name__ == "VALLEAR" and resps.ndim == 3:
        resps = resps[:, :, 0]  # AR trains on codec level 0 only
    return dict(
        text=batch["text"], text_lens=batch["text_lens"],
        proms=batch["proms"], prom_lens=batch["prom_lens"],
        resps=resps, resp_lens=batch["resp_lens"],
    )


def valle_loss(
    model, params, batch_stats, batch: Dict[str, Any], rng, criterions,
    config, step, deterministic: bool,
):
    out, new_bs = _apply(
        model, params, batch_stats, rng, deterministic, extra_rngs=("noise",),
        **valle_kwargs(batch, model),
    )
    return out["loss"], ({"train/loss_ce": out["loss"]}, new_bs)
