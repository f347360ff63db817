"""VITS loss assembly (reference jatts/trainers/vits.py:44-115):
lambda_mel * masked-L1 + KL + scheduled alignment losses."""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from jatts_tpu.train.steps import _apply


def vits_kwargs(batch: Dict[str, Any], model=None) -> Dict[str, Any]:
    return dict(
        xs=batch["xs"], ilens=batch["ilens"], ys=batch["ys"], olens=batch["olens"],
        spembs=batch.get("spembs"), sids=batch.get("sids"),
    )


def vits_loss(
    model, params, batch_stats, batch: Dict[str, Any], rng, criterions,
    config, step, deterministic: bool,
):
    out, new_bs = _apply(
        model, params, batch_stats, rng, deterministic, extra_rngs=("noise",),
        **vits_kwargs(batch),
    )
    step = jnp.asarray(step, jnp.float32)
    dp_start = float(config.get("dp_train_start_steps", 0) or 0)
    bin_start = float(config.get("bin_loss_start_steps", 0) or 0)
    lambda_align = float(config.get("lambda_align", 1.0))
    lambda_mel = float(config.get("lambda_mel", 1.0))

    mel_loss = criterions["MelLoss"](None, out["outs"], out["ys"], out["olens_in"])
    # KL expects channel-first [B, H, T] like the reference
    tr = lambda x: jnp.swapaxes(x, 1, 2)
    kl_loss = criterions["KLDivergenceLoss"](
        tr(out["z_p"]), tr(out["logs_q"]), tr(out["m_p"]), tr(out["logs_p"]),
        jnp.swapaxes(out["y_mask"], 1, 2),
    )
    loss = lambda_mel * mel_loss + kl_loss
    stats = {"train/mel_loss": mel_loss, "train/kl_loss": kl_loss}

    if out.get("dur_nll") is not None:
        # stochastic duration predictor: flow NLL (reference vits.py:503-509)
        gate = (step > dp_start).astype(jnp.float32)
        dur = jnp.mean(out["dur_nll"])
        loss = loss + gate * dur
        stats["train/duration_loss"] = gate * dur
    elif "DurationPredictorLoss" in criterions:
        dur = criterions["DurationPredictorLoss"](out["d_outs"], out["ds"], batch["ilens"])
        gate = (step > dp_start).astype(jnp.float32)
        loss = loss + gate * dur
        stats["train/duration_loss"] = gate * dur

    if "ForwardSumLoss" in criterions:
        fsum = criterions["ForwardSumLoss"](out["log_p_attn"], batch["ilens"], batch["olens"])
        gate = (step < dp_start).astype(jnp.float32)
        loss = loss + lambda_align * gate * fsum
        stats["train/forward_sum_loss"] = gate * fsum

    gate = (step > bin_start).astype(jnp.float32)
    loss = loss + lambda_align * gate * out["bin_loss"]
    stats["train/binary_loss"] = gate * out["bin_loss"]

    return loss, (stats, new_bs)
