"""E2-TTS loss assembly (reference jatts/trainers/e2tts.py:213-247: plain CFM
loss; accelerate/EMA handled by the generic trainer + optax.ema)."""

from __future__ import annotations

from typing import Any, Dict

from jatts_tpu.train.steps import _apply


def e2tts_kwargs(batch: Dict[str, Any], model=None) -> Dict[str, Any]:
    return dict(text=batch["xs"], feats=batch["ys"], feats_lengths=batch["olens"])


def e2tts_loss(
    model, params, batch_stats, batch: Dict[str, Any], rng, criterions,
    config, step, deterministic: bool,
):
    out, new_bs = _apply(
        model, params, batch_stats, rng, deterministic, extra_rngs=("noise",),
        **e2tts_kwargs(batch),
    )
    return out["loss"], ({"train/cfm_loss": out["loss"]}, new_bs)
