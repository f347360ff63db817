"""Benchmark: batched FastSpeech2 inference + HiFi-GAN vocoding RTF on one chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference publishes no speed numbers (README.md:13 — speed
explicitly not optimized); BASELINE.json sets the target batched inference
RTF <= 0.01 on v5e-1. vs_baseline = target_rtf / measured_rtf (>1 beats the
target).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from jatts_tpu.models.fastspeech2 import FastSpeech2
    from jatts_tpu.vocoder.hifigan import HiFiGANGenerator

    # JSUT tts1 config shapes (egs/jsut/tts1/conf/fastspeech2.v1.yaml):
    # adim 384, 4+4 conformer layers, 80 mels, 24 kHz, hop 300.
    sr, hop = 24000, 300
    b, t_text, t_feats = 8, 128, 1024
    model = FastSpeech2(idim=64, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.integers(1, 64, (b, t_text)).astype(np.int32))
    ilens = jnp.asarray(np.full((b,), t_text, np.int32))

    init_batch = {
        "xs": xs,
        "ilens": ilens,
        "ys": jnp.zeros((b, t_feats, 80), jnp.float32),
        "olens": jnp.asarray(np.full((b,), t_feats, np.int32)),
        "ds": jnp.asarray(np.full((b, t_text), t_feats // t_text, np.int32)),
        "ps": jnp.zeros((b, t_text, 1), jnp.float32),
        "es": jnp.zeros((b, t_text, 1), jnp.float32),
    }
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        **init_batch, deterministic=False,
    )

    voc = HiFiGANGenerator()
    voc_vars = voc.init(jax.random.key(2), jnp.zeros((b, t_feats, 80), jnp.float32))

    @jax.jit
    def tts(variables, voc_vars, xs, ilens):
        out = model.apply(
            variables, xs, ilens, t_feats, method=FastSpeech2.inference
        )
        mel = out["feat_gen"].astype(jnp.float32)
        wav = voc.apply(voc_vars, mel)[..., 0]
        return wav, out["olens"]

    # warmup / compile
    wav, olens = tts(variables, voc_vars, xs, ilens)
    wav.block_until_ready()

    n_iter = 10
    start = time.perf_counter()
    for _ in range(n_iter):
        wav, olens = tts(variables, voc_vars, xs, ilens)
    wav.block_until_ready()
    elapsed = (time.perf_counter() - start) / n_iter

    audio_seconds = b * t_feats * hop / sr  # full padded capacity synthesized
    rtf = elapsed / audio_seconds
    frames_per_sec = b * t_feats / elapsed
    target = 0.01
    print(
        json.dumps(
            {
                "metric": "fastspeech2+hifigan batched inference RTF "
                f"(B={b}, T_feats={t_feats}, mel-frames/s={frames_per_sec:.0f})",
                "value": round(rtf, 6),
                "unit": "rtf",
                "vs_baseline": round(target / rtf, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
