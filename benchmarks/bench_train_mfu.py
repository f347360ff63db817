#!/usr/bin/env python3
"""Training-step MFU for the transformer flagships (VALL-E AR, E2-TTS) at
recipe sizes, plus FastSpeech2 — true device numbers.

Methodology = benchmarks/bench_train_step.py: K optimizer steps per dispatch
via the trainer's steps_per_execution lax.scan (amortizes the O(100 ms)
tunnel round trip), device-resident inputs, scalar loss fetch as the
completion barrier, MFU = XLA cost_analysis FLOPs / wall / v5e-1 peak.

Run: python benchmarks/bench_train_mfu.py            (TPU)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

# v5e (topology v5e:1x1x1 per the compile relay) published peak: 197
# TFLOP/s bf16 per chip. Rounds 1-2 used 394 — that is the v5e INT8 TOPS
# figure, so every earlier MFU was understated 2x (measured sanity: chained
# 4096^3 bf16 matmuls sustain 132.7 TF/s = 67% of 197 — plausible — vs 34%
# of 394 — implausibly low for pure-MXU work). f32 matmul peak is
# unpublished; half of bf16 retained as the indicative denominator.
PEAK_FLOPS = {"bf16": 197e12, "f32": 98e12}


def _run_trainer_bench(model, loss_fn, kwargs_fn, batch, k, dtype_name,
                       config_extra=None, quiet=False, n_rep=3, prime=2,
                       criterions=None):
    import jax

    from jatts_tpu.train.trainer import Trainer

    config = {
        "train_max_steps": 1, "optimizer_type": "AdamW",
        "optimizer_params": {"lr": 1e-4}, "grad_norm": 1.0,
        "scheduler": "warmuplr", "scheduler_params": {"warmup_steps": 4000},
        "steps_per_execution": k, "rng_impl": "rbg",
        **(config_extra or {}),
    }
    trainer = Trainer(
        config, model, criterions or {}, loss_fn, None,
        outdir="/tmp/bench_train_mfu", kwargs_fn=kwargs_fn,
    )
    trainer.init_state(batch)
    # the Trainer hands loss fns the RAW batch (kwargs_fn is init-only)
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
    except Exception as e:  # noqa: BLE001
        if not quiet:
            print(f"# cost_analysis unavailable: {str(e)[:120]}")

    state = trainer.state
    for _ in range(prime):  # compile + tunnel ramp-up priming
        state, stats = trainer.train_step_scan(state, stacked, trainer.rng, offsets)
        loss = float(stats["train/loss"])
    assert np.isfinite(loss), "non-finite training loss"

    t0 = time.perf_counter()
    for _ in range(n_rep):
        state, stats = trainer.train_step_scan(state, stacked, trainer.rng, offsets)
    loss = float(stats["train/loss"])
    dt = (time.perf_counter() - t0) / (n_rep * k)
    assert np.isfinite(loss)
    mfu = flops_per_step / dt / PEAK_FLOPS[dtype_name] if flops_per_step else None
    return dt * 1e3, mfu, flops_per_step


def run_valle(b=16, tx=64, tp=225, tr=600, k=5, d_model=1024, n_heads=16,
              n_layers=12, use_remat=False, quiet=False, **model_kw):
    """VALL-E AR at the recipe size (valle_ar.given.bs128.4chips.yaml per-chip
    per-accum-step slice: batch 16 x accum 2, d1024/16H/12L, packed seq ~891;
    XLA attention default — measured 2x over batch-32 + remat)."""
    import jax.numpy as jnp

    from jatts_tpu.models.valle import VALLEAR
    from jatts_tpu.train.steps_valle import valle_kwargs, valle_loss

    model = VALLEAR(idim=0, n_tokens=1024, d_model=d_model, n_heads=n_heads,
                    n_layers=n_layers, dtype=jnp.bfloat16, use_remat=use_remat,
                    **model_kw)
    rng = np.random.default_rng(0)
    batch = {
        "text": rng.integers(0, 1024, (b, tx)).astype(np.int32),
        "text_lens": np.full((b,), tx, np.int32),
        "proms": rng.integers(0, 1024, (b, tp, 8)).astype(np.int32),
        "prom_lens": np.full((b,), tp, np.int32),
        "resps": rng.integers(0, 1024, (b, tr)).astype(np.int32),
        "resp_lens": np.full((b,), tr, np.int32),
    }
    ms, mfu, flops = _run_trainer_bench(
        model, valle_loss, lambda bt, m=None: valle_kwargs(bt, m), batch, k,
        "bf16", quiet=quiet,
    )
    if not quiet:
        print(f"valle_ar train: {ms:.1f} ms/step, MFU {100 * (mfu or 0):.1f}% "
              f"({(flops or 0) / 1e9:.0f} GFLOP/step, B={b}, S~{tx + tp + tr + 2})")
    return ms, mfu


def run_valle_nar(b=16, tx=64, tp=225, tr=600, k=5, d_model=1024, n_heads=16,
                  n_layers=12, use_remat=False, quiet=False, **model_kw):
    """VALL-E NAR at the recipe size (valle_nar.given.bs128.4chips.yaml):
    7-level AdaLN transformer, per-sample random quant level, full-level
    resps [B, Tr, 8]."""
    import jax.numpy as jnp

    from jatts_tpu.models.valle import VALLENAR
    from jatts_tpu.train.steps_valle import valle_kwargs, valle_loss

    model = VALLENAR(idim=0, n_tokens=1024, d_model=d_model, n_heads=n_heads,
                     n_layers=n_layers, dtype=jnp.bfloat16,
                     use_remat=use_remat, **model_kw)
    rng = np.random.default_rng(0)
    batch = {
        "text": rng.integers(0, 1024, (b, tx)).astype(np.int32),
        "text_lens": np.full((b,), tx, np.int32),
        "proms": rng.integers(0, 1024, (b, tp, 8)).astype(np.int32),
        "prom_lens": np.full((b,), tp, np.int32),
        "resps": rng.integers(0, 1024, (b, tr, 8)).astype(np.int32),
        "resp_lens": np.full((b,), tr, np.int32),
    }
    ms, mfu, flops = _run_trainer_bench(
        model, valle_loss, lambda bt, m=None: valle_kwargs(bt, m), batch, k,
        "bf16", quiet=quiet,
    )
    if not quiet:
        print(f"valle_nar train: {ms:.1f} ms/step, MFU {100 * (mfu or 0):.1f}% "
              f"({(flops or 0) / 1e9:.0f} GFLOP/step, B={b}, S~{tx + tp + tr + 2})")
    return ms, mfu


def run_e2tts(b=8, n=1024, k=5, dim=1024, depth=24, heads=16,
              use_remat=False, quiet=False, **model_kw):
    """E2-TTS at the recipe size (e2tts.v1 per-chip per-step frame budget
    8640 ~= B8 x N1024, UNetT d1024/24L/16H, XLA attention default;
    use_remat=True fits 2x the budget on one 16 GB chip)."""
    import jax.numpy as jnp

    from jatts_tpu.models.e2tts import E2TTS
    from jatts_tpu.train.steps_e2tts import e2tts_kwargs, e2tts_loss

    model = E2TTS(idim=64, odim=80, dim=dim, depth=depth, heads=heads,
                  dtype=jnp.bfloat16, use_remat=use_remat, **model_kw)
    rng = np.random.default_rng(0)
    batch = {
        "xs": rng.integers(0, 64, (b, 128)).astype(np.int32),
        "ilens": np.full((b,), 128, np.int32),
        "ys": rng.normal(size=(b, n, 80)).astype(np.float32),
        "olens": np.full((b,), n, np.int32),
    }
    ms, mfu, flops = _run_trainer_bench(
        model, e2tts_loss, lambda bt, m=None: e2tts_kwargs(bt, m), batch, k,
        "bf16", quiet=quiet,
    )
    if not quiet:
        print(f"e2tts train: {ms:.1f} ms/step, MFU {100 * (mfu or 0):.1f}% "
              f"({(flops or 0) / 1e9:.0f} GFLOP/step, B={b}, N={n})")
    return ms, mfu


def run_matcha_mas(b=16, tx=96, tf=512, k=10, quiet=False,
                   crit_names=("EncoderPriorLoss", "DurationPredictorLoss",
                               "ForwardSumLoss"),
                   **model_kw):
    """MatchaTTS_MAS at the recipe size (egs/jsut/tts2/conf/
    matcha_tts.mas.v1.yaml: adim384 conformer 4L enc, [512,512] U-Net CFM
    decoder, batch 16, steps_per_execution 10). The step contains the
    system's custom kernel path: batched Pallas MAS viterbi + fully-batched
    CTC ForwardSum (reference hot spot: jatts/modules/alignments.py:281-310
    inside trainers/matchatts.py:25-121). Shapes: JSUT ~80 mel frames/s,
    bucket-padded T_feats=512, ~96 phonemes."""
    import jax.numpy as jnp

    from jatts_tpu.losses import LOSS_REGISTRY
    from jatts_tpu.models.matchatts_mas import MatchaTTS_MAS
    from jatts_tpu.train.steps_matcha import matchatts_kwargs, matchatts_loss

    params = dict(
        idim=64, odim=80, adim=384, aheads=2, elayers=4, eunits=1536,
        duration_predictor_chans=256, decoder_channels=(512, 512),
        decoder_attention_head_dim=256, decoder_num_mid_blocks=2,
        conformer_enc_kernel_size=7, dtype=jnp.bfloat16,
    )
    params.update(model_kw)
    model = MatchaTTS_MAS(**params)
    odim, idim = params["odim"], params["idim"]
    crits = {name: LOSS_REGISTRY[name]() for name in crit_names}
    rng = np.random.default_rng(0)
    batch = {
        "xs": rng.integers(1, idim, (b, tx)).astype(np.int32),
        "ilens": np.full((b,), tx, np.int32),
        "ys": rng.normal(size=(b, tf, odim)).astype(np.float32),
        "olens": np.full((b,), tf, np.int32),
    }
    ms, mfu, flops = _run_trainer_bench(
        model, matchatts_loss, lambda bt, m=None: matchatts_kwargs(bt, m),
        batch, k, "bf16", quiet=quiet, criterions=crits,
        config_extra={"dp_train_start_steps": 10000,
                      "bin_loss_start_steps": 15000, "lambda_align": 2.0},
    )
    if not quiet:
        print(f"matcha_mas train: {ms:.1f} ms/step, MFU {100 * (mfu or 0):.1f}% "
              f"({(flops or 0) / 1e9:.0f} GFLOP/step, B={b}, Tf={tf})")
    return ms, mfu


def run_vits(b=8, tx=96, tf=512, k=10, quiet=False, **model_kw):
    """VITS (mel) at the recipe size (egs/jsut/tts2/conf/vits.v1.bs32.yaml:
    adim384 conformer 4L dec, posterior encoder + RQ-spline flows, per-chip
    microbatch 8 x accum 4). Same MAS+CTC alignment path as Matcha-MAS."""
    import jax.numpy as jnp

    from jatts_tpu.losses import LOSS_REGISTRY
    from jatts_tpu.models.vits import VITS
    from jatts_tpu.train.steps_vits import vits_kwargs, vits_loss

    params = dict(
        idim=64, odim=80, adim=384, aheads=2, dlayers=4, dunits=1536,
        duration_predictor_chans=256, conformer_dec_kernel_size=31,
        dtype=jnp.bfloat16,
    )
    params.update(model_kw)
    model = VITS(**params)
    odim, idim = params["odim"], params["idim"]
    crits = {
        "MelLoss": LOSS_REGISTRY["MelLoss"](),
        "KLDivergenceLoss": LOSS_REGISTRY["KLDivergenceLoss"](),
        "DurationPredictorLoss": LOSS_REGISTRY["DurationPredictorLoss"](),
        "ForwardSumLoss": LOSS_REGISTRY["ForwardSumLoss"](),
    }
    rng = np.random.default_rng(0)
    batch = {
        "xs": rng.integers(1, idim, (b, tx)).astype(np.int32),
        "ilens": np.full((b,), tx, np.int32),
        "ys": rng.normal(size=(b, tf, odim)).astype(np.float32),
        "olens": np.full((b,), tf, np.int32),
    }
    ms, mfu, flops = _run_trainer_bench(
        model, vits_loss, lambda bt, m=None: vits_kwargs(bt, m),
        batch, k, "bf16", quiet=quiet, criterions=crits,
        config_extra={"dp_train_start_steps": 10000,
                      "bin_loss_start_steps": 15000, "lambda_align": 2.0,
                      "lambda_mel": 10.0},
    )
    if not quiet:
        print(f"vits train: {ms:.1f} ms/step, MFU {100 * (mfu or 0):.1f}% "
              f"({(flops or 0) / 1e9:.0f} GFLOP/step, B={b}, Tf={tf})")
    return ms, mfu


def main():
    run_valle()
    run_e2tts()
    run_matcha_mas()
    run_vits()


if __name__ == "__main__":
    main()
