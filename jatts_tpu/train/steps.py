"""Per-model loss assembly (replaces reference per-model Trainer subclasses'
_train_step bodies; the generic loop lives in train/trainer.py).

Each function has the LossFn signature used by Trainer:
    (model, params, batch_stats, batch, rng, criterions, config, step,
     deterministic) -> (loss, (stats, new_batch_stats))
"""

from __future__ import annotations

from typing import Any, Dict

import jax


def _apply(model, params, batch_stats, rng, deterministic, extra_rngs=(), **kwargs):
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    rngs = {"dropout": rng}
    for i, name in enumerate(extra_rngs):
        rngs[name] = jax.random.fold_in(rng, i + 1)
    mutable = [] if deterministic else ["batch_stats"]
    if mutable and batch_stats:
        out, mut = model.apply(
            variables, **kwargs, deterministic=deterministic,
            rngs=rngs, mutable=mutable,
        )
        return out, mut.get("batch_stats", batch_stats)
    out = model.apply(
        variables, **kwargs, deterministic=deterministic, rngs=rngs
    )
    return out, batch_stats


def fastspeech2_kwargs(batch: Dict[str, Any], model=None) -> Dict[str, Any]:
    return dict(
        xs=batch["xs"], ilens=batch["ilens"], ys=batch["ys"], olens=batch["olens"],
        ds=batch["ds"], ps=batch["ps"], es=batch["es"],
        spembs=batch.get("spembs"), sids=batch.get("sids"),
    )


def fastspeech2_loss(
    model, params, batch_stats, batch: Dict[str, Any], rng, criterions,
    config, step, deterministic: bool,
):
    """reference jatts/trainers/fastspeech2.py:24-100."""
    out, new_bs = _apply(
        model, params, batch_stats, rng, deterministic, **fastspeech2_kwargs(batch)
    )
    mel_loss = criterions["MelLoss"](
        out["after_outs"], out["before_outs"], out["ys"], out["olens"]
    )
    duration_loss = criterions["DurationPredictorLoss"](
        out["d_outs"], batch["ds"], batch["ilens"]
    )
    pitch_loss = criterions["PitchLoss"](out["p_outs"], batch["ps"], batch["ilens"])
    energy_loss = criterions["EnergyLoss"](out["e_outs"], batch["es"], batch["ilens"])
    loss = mel_loss + duration_loss + pitch_loss + energy_loss
    stats = {
        "train/mel_loss": mel_loss,
        "train/duration_loss": duration_loss,
        "train/pitch_loss": pitch_loss,
        "train/energy_loss": energy_loss,
    }
    return loss, (stats, new_bs)


LOSS_FN_REGISTRY = {
    "FastSpeech2Trainer": fastspeech2_loss,
}
KWARGS_REGISTRY = {
    "FastSpeech2Trainer": fastspeech2_kwargs,
}


def get_loss_fn(trainer_type: str):
    if trainer_type not in LOSS_FN_REGISTRY:
        _register_optional()
    return LOSS_FN_REGISTRY[trainer_type]


def get_kwargs_fn(trainer_type: str):
    """batch -> model.__call__ kwargs (used for both init and the loss)."""
    if trainer_type not in KWARGS_REGISTRY:
        _register_optional()
    return KWARGS_REGISTRY[trainer_type]


def _register_optional():
    from jatts_tpu.train.steps_matcha import matchatts_kwargs, matchatts_loss  # noqa: PLC0415

    LOSS_FN_REGISTRY.setdefault("MatchaTTSTrainer", matchatts_loss)
    KWARGS_REGISTRY.setdefault("MatchaTTSTrainer", matchatts_kwargs)
    from jatts_tpu.train.steps_vits import vits_kwargs, vits_loss  # noqa: PLC0415

    LOSS_FN_REGISTRY.setdefault("VITSTrainer", vits_loss)
    KWARGS_REGISTRY.setdefault("VITSTrainer", vits_kwargs)
    from jatts_tpu.train.steps_e2tts import e2tts_kwargs, e2tts_loss  # noqa: PLC0415

    LOSS_FN_REGISTRY.setdefault("E2TTSTrainer", e2tts_loss)
    KWARGS_REGISTRY.setdefault("E2TTSTrainer", e2tts_kwargs)
    from jatts_tpu.train.steps_valle import valle_kwargs, valle_loss  # noqa: PLC0415

    LOSS_FN_REGISTRY.setdefault("VALLETrainer", valle_loss)
    KWARGS_REGISTRY.setdefault("VALLETrainer", valle_kwargs)
