#!/usr/bin/env python3
"""Decompose the FastSpeech2 train step (the round-2 102 ms) by ablation.

jax.profiler device traces are unreliable through the remote-dispatch
tunnel, so the decomposition is measured directly: re-time the step with one
component removed or swapped at a time (same K-steps-per-dispatch harness as
bench_train_step.py, scalar-fetch barriers). The deltas attribute the step
time; results are recorded in docs/perf_fs2_step.md.

Run: python benchmarks/bench_fs2_profile.py        (TPU)
"""

import sys

sys.path.insert(0, ".")

from benchmarks.bench_train_step import run  # noqa: E402

VARIANTS = [
    # (label, model kwargs, config extra)
    ("baseline (rbg rng)", {}, {"rng_impl": "rbg"}),
    ("threefry rng", {}, {}),
    ("no postnet", {"postnet_layers": 0}, {"rng_impl": "rbg"}),
    ("linear FFN (vs k=3 conv FFN)", {"positionwise_layer_type": "linear"},
     {"rng_impl": "rbg"}),
    ("no conformer conv module", {"use_cnn_in_conformer": False},
     {"rng_impl": "rbg"}),
    ("no dropout (all rates 0)", {
        "transformer_enc_dropout_rate": 0.0,
        "transformer_enc_positional_dropout_rate": 0.0,
        "transformer_enc_attn_dropout_rate": 0.0,
        "transformer_dec_dropout_rate": 0.0,
        "transformer_dec_positional_dropout_rate": 0.0,
        "transformer_dec_attn_dropout_rate": 0.0,
        "duration_predictor_dropout_rate": 0.0,
        "pitch_predictor_dropout": 0.0, "energy_predictor_dropout": 0.0,
        "postnet_dropout_rate": 0.0,
    }, {"rng_impl": "rbg"}),
    # locate the dropout cost: which of the three site families carries it
    ("attn-prob dropout off only", {
        "transformer_enc_attn_dropout_rate": 0.0,
        "transformer_dec_attn_dropout_rate": 0.0,
    }, {"rng_impl": "rbg"}),
    ("positional dropout off only", {
        "transformer_enc_positional_dropout_rate": 0.0,
        "transformer_dec_positional_dropout_rate": 0.0,
    }, {"rng_impl": "rbg"}),
    ("residual/FFN dropout off only", {
        "transformer_enc_dropout_rate": 0.0,
        "transformer_dec_dropout_rate": 0.0,
    }, {"rng_impl": "rbg"}),
    ("latest rel-pos, fused flash attn",
     {"conformer_rel_pos_type": "latest", "attn_backend": "flash"},
     {"rng_impl": "rbg"}),
    ("half batch (B=16)", {}, {"rng_impl": "rbg", "_b": 16}),
]


def main():
    import argparse
    import os

    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="*", default=None,
                    help="substring filter on variant labels "
                         "(baseline always runs for the delta)")
    args = ap.parse_args()

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jatts_tpu/xla")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    variants = VARIANTS
    if args.only:
        variants = [VARIANTS[0]] + [
            v for v in VARIANTS[1:]
            if any(s.lower() in v[0].lower() for s in args.only)
        ]

    base_ms = None
    for label, kw, cfg in variants:
        cfg = dict(cfg)
        b = cfg.pop("_b", 32)
        try:
            ms, fps, mfu = run("bf16", k=10, b=b, model_kwargs=kw,
                               config_extra=cfg, quiet=True)
        except Exception as e:  # noqa: BLE001
            print(f"{label:38s} FAILED: {str(e)[:120]}")
            continue
        if base_ms is None:
            base_ms = ms
        delta = base_ms - ms
        mfu_s = f" MFU {mfu * 100:4.1f}%" if mfu is not None else ""
        print(f"{label:38s} {ms:7.1f} ms/step  (Δ vs baseline {delta:+6.1f} ms){mfu_s}")


if __name__ == "__main__":
    main()
