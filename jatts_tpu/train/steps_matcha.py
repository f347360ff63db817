"""Matcha-TTS loss assembly (reference jatts/trainers/matchatts.py:25-121).

The reference's python-level loss schedule (ForwardSumLoss while
steps < dp_train_start_steps, DurationPredictorLoss after, bin loss after
bin_loss_start_steps) is expressed as arithmetic gates on the traced step so
the whole schedule lives inside one compiled program.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from jatts_tpu.ops.masks import sequence_mask
from jatts_tpu.train.steps import _apply


def matchatts_kwargs(batch: Dict[str, Any], model=None) -> Dict[str, Any]:
    kwargs = dict(
        xs=batch["xs"], ilens=batch["ilens"], ys=batch["ys"], olens=batch["olens"],
        spembs=batch.get("spembs"), sids=batch.get("sids"),
    )
    if "ds" in batch and (model is None or "MAS" not in type(model).__name__):
        kwargs["ds"] = batch["ds"]
    return kwargs


def matchatts_loss(
    model, params, batch_stats, batch: Dict[str, Any], rng, criterions,
    config, step, deterministic: bool,
):
    out, new_bs = _apply(
        model, params, batch_stats, rng, deterministic, extra_rngs=("noise",),
        **matchatts_kwargs(batch, model),
    )

    step = jnp.asarray(step, jnp.float32)
    dp_start = float(config.get("dp_train_start_steps", 0) or 0)
    bin_start = float(config.get("bin_loss_start_steps", 0) or 0)
    lambda_align = float(config.get("lambda_align", 1.0))

    loss = out["cfm_loss"]
    stats = {"train/cfm_loss": out["cfm_loss"]}

    if "EncoderPriorLoss" in criterions:
        mask = sequence_mask(out["olens_in"], out["ys"].shape[1], jnp.float32)
        prior = criterions["EncoderPriorLoss"](out["hs"], out["ys"], mask)
        loss = loss + prior
        stats["train/encoder_prior_loss"] = prior

    if out.get("dur_nll") is not None:
        gate = (step > dp_start).astype(jnp.float32)
        dur = jnp.mean(out["dur_nll"])
        loss = loss + gate * dur
        stats["train/duration_loss"] = gate * dur
    elif "DurationPredictorLoss" in criterions:
        d_target = out.get("ds", batch.get("ds"))
        dur = criterions["DurationPredictorLoss"](out["d_outs"], d_target, batch["ilens"])
        gate = (step > dp_start).astype(jnp.float32)
        loss = loss + gate * dur
        stats["train/duration_loss"] = gate * dur

    if "ForwardSumLoss" in criterions and "log_p_attn" in out:
        fsum = criterions["ForwardSumLoss"](out["log_p_attn"], batch["ilens"], batch["olens"])
        gate = (step < dp_start).astype(jnp.float32)
        loss = loss + lambda_align * gate * fsum
        stats["train/forward_sum_loss"] = gate * fsum

    if "bin_loss" in out:
        gate = (step > bin_start).astype(jnp.float32)
        loss = loss + lambda_align * gate * out["bin_loss"]
        stats["train/binary_loss"] = gate * out["bin_loss"]

    return loss, (stats, new_bs)
