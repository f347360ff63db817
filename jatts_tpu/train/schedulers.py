"""LR schedules as optax schedules (reference jatts/schedulers/).

WarmupLR (ESPnet, warmup_lr.py:24-62):
    lr(step) = base_lr * warmup^0.5 * min(step^-0.5, step * warmup^-1.5)
StepLR / ExponentialLR mirror the torch semantics the configs use
(tts_train.py:37-41 registry); E2TTSSequentialLR is linear warmup -> linear
decay (e2tts_scheduler.py:10-36).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import optax


def warmuplr(base_lr: float, warmup_steps: int = 25000) -> optax.Schedule:
    def schedule(step):
        s = jnp.maximum(step.astype(jnp.float32) if hasattr(step, "astype") else float(step), 1.0)
        return base_lr * warmup_steps**0.5 * jnp.minimum(s**-0.5, s * warmup_steps**-1.5)

    return schedule


def steplr(base_lr: float, step_size: int, gamma: float = 0.1) -> optax.Schedule:
    def schedule(step):
        return base_lr * gamma ** jnp.floor(step / step_size)

    return schedule


def exponentiallr(base_lr: float, gamma: float) -> optax.Schedule:
    def schedule(step):
        return base_lr * gamma**step

    return schedule


def e2tts_sequentiallr(
    base_lr: float, warmup_steps: int, total_steps: int
) -> optax.Schedule:
    return optax.join_schedules(
        [
            optax.linear_schedule(1e-8, base_lr, warmup_steps),
            optax.linear_schedule(base_lr, 1e-8, max(total_steps - warmup_steps, 1)),
        ],
        [warmup_steps],
    )


def build_schedule(config: Dict[str, Any]) -> optax.Schedule:
    """Resolve scheduler from the experiment config (same keys as the
    reference: scheduler/scheduler_type + scheduler_params + optimizer lr)."""
    base_lr = float(config.get("optimizer_params", {}).get("lr", 1e-3))
    name = (config.get("scheduler") or config.get("scheduler_type") or "constant").lower()
    params = config.get("scheduler_params", {}) or {}
    if name == "warmuplr":
        return warmuplr(base_lr, int(params.get("warmup_steps", 25000)))
    if name == "steplr":
        return steplr(base_lr, int(params["step_size"]), float(params.get("gamma", 0.1)))
    if name == "exponentiallr":
        return exponentiallr(base_lr, float(params["gamma"]))
    if name in ("e2tts_sequentiallr", "sequentiallr"):
        return e2tts_sequentiallr(
            base_lr,
            int(params.get("warmup_steps", 1000)),
            int(config.get("train_max_steps", 100000)),
        )
    if name == "constant":
        return optax.constant_schedule(base_lr)
    raise ValueError(f"unknown scheduler: {name}")


def build_optimizer(config: Dict[str, Any]) -> optax.GradientTransformation:
    """Adam/AdamW + grad-norm clipping from config (reference
    tts_train.py:339-353, trainers clip via grad_norm)."""
    schedule = build_schedule(config)
    opt_name = (config.get("optimizer_type") or "Adam").lower()
    opt_params = dict(config.get("optimizer_params", {}))
    opt_params.pop("lr", None)
    betas = opt_params.pop("betas", (0.9, 0.999))
    eps = float(opt_params.pop("eps", 1e-8))
    weight_decay = float(opt_params.pop("weight_decay", 0.0))
    if opt_name in ("adam", "adamw"):
        opt = optax.adamw(
            schedule, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay
        ) if (opt_name == "adamw" or weight_decay) else optax.adam(
            schedule, b1=betas[0], b2=betas[1], eps=eps
        )
    elif opt_name == "sgd":
        opt = optax.sgd(schedule, momentum=float(opt_params.pop("momentum", 0.0)))
    else:
        raise ValueError(f"unknown optimizer: {opt_name}")
    grad_norm = float(config.get("grad_norm", 0) or 0)
    if grad_norm > 0:
        opt = optax.chain(optax.clip_by_global_norm(grad_norm), opt)
    return opt
