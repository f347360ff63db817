#!/usr/bin/env python3
"""Decompose the Matcha-MAS train step by ablation (same method as
benchmarks/bench_fs2_profile.py — device traces are unreliable through the
remote tunnel, so components are removed/swapped one at a time in the
identical K-steps-per-dispatch harness).

The interesting question for THIS family: what does the custom alignment
path cost inside a real jitted step — the batched Pallas MAS viterbi
(ops/mas_pallas.py) + the fully-batched CTC ForwardSum (losses/align.py) —
vs the reference's per-utterance numba hot spot
(jatts/modules/alignments.py:281-310). Results: docs/perf_mas_step.md.

Run: python benchmarks/bench_matcha_profile.py        (TPU)
"""

import sys

sys.path.insert(0, ".")

from benchmarks.bench_train_mfu import run_matcha_mas  # noqa: E402

ALL_CRITS = ("EncoderPriorLoss", "DurationPredictorLoss", "ForwardSumLoss")

VARIANTS = [
    # (label, kwargs for run_matcha_mas)
    ("baseline (pallas MAS, full losses)", {}),
    ("MAS via XLA scan (mas_backend='scan')", {"mas_backend": "scan"}),
    ("no ForwardSum CTC loss", {
        "crit_names": ("EncoderPriorLoss", "DurationPredictorLoss")}),
    ("no encoder-prior loss", {
        "crit_names": ("DurationPredictorLoss", "ForwardSumLoss")}),
    ("no dropout (all rates 0)", {
        "transformer_enc_dropout_rate": 0.0,
        "transformer_enc_positional_dropout_rate": 0.0,
        "transformer_enc_attn_dropout_rate": 0.0,
        "duration_predictor_dropout_rate": 0.0,
        "decoder_dropout": 0.0,
    }),
    ("half batch (B=8)", {"b": 8}),
]


def main():
    import os

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jatts_tpu/xla")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    base_ms = None
    for label, kw in VARIANTS:
        try:
            ms, mfu = run_matcha_mas(quiet=True, **kw)
        except Exception as e:  # noqa: BLE001 — relay flakes isolate per rung
            print(f"{label}: FAILED {str(e)[:140]}")
            continue
        delta = "" if base_ms is None else f" ({ms - base_ms:+.1f} ms)"
        if base_ms is None:
            base_ms = ms
        print(f"{label}: {ms:.1f} ms/step, MFU {100 * (mfu or 0):.1f}%{delta}")


if __name__ == "__main__":
    main()
