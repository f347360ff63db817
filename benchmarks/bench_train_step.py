#!/usr/bin/env python3
"""FastSpeech2 training-step throughput on one chip (full JSUT config sizes).

Measures the fully-jitted loss+grad+adam step (the whole hot path of recipe
stage 3) in f32 and bf16 compute.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def run(dtype_name: str):
    import jax
    import jax.numpy as jnp

    from jatts_tpu.losses import LOSS_REGISTRY
    from jatts_tpu.models.fastspeech2 import FastSpeech2
    from jatts_tpu.train.steps import fastspeech2_loss
    from jatts_tpu.train.trainer import Trainer

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    b, t_text, t_feats = 32, 128, 1024
    model = FastSpeech2(idim=64, dtype=dtype)
    rng = np.random.default_rng(0)
    ds = rng.integers(4, 12, (b, t_text)).astype(np.int32)
    batch = {
        "xs": rng.integers(1, 64, (b, t_text)).astype(np.int32),
        "ilens": np.full((b,), t_text, np.int32),
        "ys": rng.normal(size=(b, t_feats, 80)).astype(np.float32),
        "olens": np.minimum(ds.sum(-1), t_feats).astype(np.int32),
        "ds": ds,
        "ps": rng.normal(size=(b, t_text, 1)).astype(np.float32),
        "es": rng.normal(size=(b, t_text, 1)).astype(np.float32),
    }
    config = {
        "train_max_steps": 1, "optimizer_type": "Adam",
        "optimizer_params": {"lr": 1e-4}, "grad_norm": 1.0,
        "scheduler": "warmuplr", "scheduler_params": {"warmup_steps": 4000},
    }
    criterions = {
        k: LOSS_REGISTRY[k]()
        for k in ("MelLoss", "DurationPredictorLoss", "PitchLoss", "EnergyLoss")
    }
    trainer = Trainer(
        config, model, criterions, fastspeech2_loss, None,
        outdir="/tmp/bench_train",
    )
    trainer.init_state(batch)
    state = trainer.state
    step_rng = jax.random.key(0)
    state, stats = trainer.train_step(state, batch, step_rng)  # compile
    float(stats["train/loss"])  # host fetch = real completion barrier
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        # steps chain through `state`; the final scalar fetch bounds them all
        state, stats = trainer.train_step(state, batch, step_rng)
    loss = float(stats["train/loss"])
    dt = (time.perf_counter() - t0) / n
    assert np.isfinite(loss)
    frames_s = b * t_feats / dt
    print(
        f"{dtype_name}: {dt * 1e3:.1f} ms/step (B={b}, T={t_feats}) "
        f"= {frames_s / 1e3:.0f}k mel-frames/s training throughput"
    )


def main():
    for d in ("f32", "bf16"):
        run(d)


if __name__ == "__main__":
    main()
