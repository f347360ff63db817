#!/usr/bin/env python3
"""FastSpeech2 training throughput on one chip — true device number.

K optimizer steps run inside ONE compiled program (the trainer's
``steps_per_execution`` lax.scan path), so per-dispatch tunnel overhead is
amortized K-fold and the wall clock measures device execution, not host
round trips. The run ends with a scalar host fetch (the only reliable
completion barrier through the remote tunnel — block_until_ready returns
early, see CLAUDE.md).

Reports ms/step, mel-frames/s, and MFU against the v5e-1 peak using XLA's
own per-program FLOP count (``compiled.cost_analysis()``) when available.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

# v5e published bf16 peak is 197 TFLOP/s/chip (394 is the INT8 TOPS figure
# rounds 1-2 mistakenly used — see benchmarks/bench_train_mfu.py); f32 is
# unpublished, bf16/2 kept as the indicative denominator.
PEAK_FLOPS = {"bf16": 197e12, "f32": 98e12}


def make_batch(b=32, t_text=128, t_feats=1024):
    rng = np.random.default_rng(0)
    ds = rng.integers(4, 12, (b, t_text)).astype(np.int32)
    return {
        "xs": rng.integers(1, 64, (b, t_text)).astype(np.int32),
        "ilens": np.full((b,), t_text, np.int32),
        "ys": rng.normal(size=(b, t_feats, 80)).astype(np.float32),
        "olens": np.minimum(ds.sum(-1), t_feats).astype(np.int32),
        "ds": ds,
        "ps": rng.normal(size=(b, t_text, 1)).astype(np.float32),
        "es": rng.normal(size=(b, t_text, 1)).astype(np.float32),
    }


def run(dtype_name: str, k: int = 20, b: int = 32, t_text: int = 128,
        t_feats: int = 1024, model_kwargs=None, config_extra=None,
        quiet: bool = False):
    """Returns (ms_per_step, mel_frames_per_s, mfu_or_None)."""
    import jax
    import jax.numpy as jnp

    from jatts_tpu.losses import LOSS_REGISTRY
    from jatts_tpu.models.fastspeech2 import FastSpeech2
    from jatts_tpu.train.steps import fastspeech2_loss
    from jatts_tpu.train.trainer import Trainer

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    model = FastSpeech2(idim=64, dtype=dtype, **(model_kwargs or {}))
    batch = make_batch(b, t_text, t_feats)
    config = {
        "train_max_steps": 1, "optimizer_type": "Adam",
        "optimizer_params": {"lr": 1e-4}, "grad_norm": 1.0,
        "scheduler": "warmuplr", "scheduler_params": {"warmup_steps": 4000},
        "steps_per_execution": k,
        **(config_extra or {}),
    }
    criterions = {
        name: LOSS_REGISTRY[name]()
        for name in ("MelLoss", "DurationPredictorLoss", "PitchLoss", "EnergyLoss")
    }
    trainer = Trainer(
        config, model, criterions, fastspeech2_loss, None,
        outdir="/tmp/bench_train",
    )
    trainer.init_state(batch)
    # device-resident inputs: numpy args re-upload host->device on EVERY
    # dispatch, which through the remote tunnel costs far more than the
    # compute being measured
    stacked = jax.device_put(
        jax.tree_util.tree_map(
            lambda x: np.broadcast_to(x, (k,) + x.shape).copy(), batch
        )
    )
    offsets = jax.device_put(np.arange(k, dtype=np.int32))

    flops_per_step = None
    try:
        lowered = trainer.train_step_scan.lower(
            trainer.state, stacked, trainer.rng, offsets
        )
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        if cost and cost.get("flops"):
            # XLA cost_analysis counts a while/scan body ONCE regardless of
            # trip count (verified: flops(k=5) == flops(k=20) == one body),
            # so the K-step scan program's flops ARE the per-step flops.
            flops_per_step = float(cost["flops"])
    except Exception as e:  # noqa: BLE001 — backend may not expose costs
        if not quiet:
            print(f"# cost_analysis unavailable: {str(e)[:120]}")

    state = trainer.state
    # compile + warmup; loss fetch is the completion barrier. Two warmup
    # dispatches: the first dispatches of a process pay tunnel ramp-up.
    for _ in range(2):
        state, stats = trainer.train_step_scan(state, stacked, trainer.rng, offsets)
        loss = float(stats["train/loss"])
    assert np.isfinite(loss), "non-finite training loss"

    n_rep = 3
    t0 = time.perf_counter()
    for _ in range(n_rep):
        # state chains the scans; one final fetch bounds all device work
        state, stats = trainer.train_step_scan(state, stacked, trainer.rng, offsets)
    loss = float(stats["train/loss"])
    dt = (time.perf_counter() - t0) / (n_rep * k)
    assert np.isfinite(loss)

    frames_s = b * t_feats / dt
    mfu = None
    if flops_per_step:
        mfu = flops_per_step / dt / PEAK_FLOPS[dtype_name]
    if not quiet:
        msg = (
            f"{dtype_name}: {dt * 1e3:.2f} ms/step (B={b}, T={t_feats}, "
            f"{k} steps/dispatch) = {frames_s / 1e3:.0f}k mel-frames/s"
        )
        if mfu is not None:
            msg += f", MFU {mfu * 100:.1f}% ({flops_per_step / 1e9:.1f} GFLOP/step)"
        print(msg)
    return dt * 1e3, frames_s, mfu


def main():
    for d in ("bf16", "f32"):
        run(d)


if __name__ == "__main__":
    main()
