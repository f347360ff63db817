"""Benchmark: batched FastSpeech2 inference + HiFi-GAN vocoding RTF on one chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference publishes no speed numbers (README.md:13 — speed
explicitly not optimized); BASELINE.json sets the target batched inference
RTF <= 0.01 on v5e-1. vs_baseline = target_rtf / measured_rtf (>1 beats the
target).

Timing methodology: through this environment's remote-dispatch tunnel,
``block_until_ready`` returns before device execution completes, so the
benchmark chains N pipeline iterations ON DEVICE inside one jitted
``lax.fori_loop`` (each iteration data-depends on the previous through a
checksum fed back into the inputs) and uses a scalar host fetch as the
completion barrier.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _enable_compile_cache():
    import os

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/jatts_tpu/xla"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from jatts_tpu.models.fastspeech2 import FastSpeech2
    from jatts_tpu.vocoder.hifigan import HiFiGANGenerator

    # JSUT tts1 config shapes (egs/jsut/tts1/conf/fastspeech2.v1.yaml):
    # adim 384, 4+4 conformer layers, 80 mels, 24 kHz, hop 300.
    sr, hop = 24000, 300
    b, t_text, t_feats = 8, 128, 1024
    n_iter = 10
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

    def tts_once(xs_in):
        out = model.apply(
            variables, xs_in, ilens, t_feats, method=FastSpeech2.inference
        )
        mel = out["feat_gen"].astype(jnp.float32)
        wav = voc.apply(voc_vars, mel)[..., 0]
        return wav

    @jax.jit
    def bench_loop(xs):
        def body(i, acc):
            # feed the carry back into the input so iterations are serialized
            wav = tts_once(xs + (acc * 0.0).astype(xs.dtype))
            return acc + wav[0, ::4096].sum()

        return jax.lax.fori_loop(0, n_iter, body, jnp.float32(0.0))

    @jax.jit
    def single(xs):
        wav = tts_once(xs)
        return wav[0, ::4096].sum(), wav

    # warmup / compile; verify the measured program makes finite audio
    chk, wav = single(xs)
    assert np.isfinite(np.asarray(wav)).all(), "non-finite output"
    float(bench_loop(xs))  # compile the loop

    t0 = time.perf_counter()
    total = float(bench_loop(xs))  # scalar host fetch = completion barrier
    elapsed = (time.perf_counter() - t0) / n_iter
    assert np.isfinite(total)

    audio_seconds = b * t_feats * hop / sr  # full padded capacity synthesized
    rtf = elapsed / audio_seconds
    frames_per_sec = b * t_feats / elapsed
    target = 0.01
    print(
        json.dumps(
            {
                "metric": "fastspeech2+hifigan batched inference RTF "
                f"(B={b}, T_feats={t_feats}, mel-frames/s={frames_per_sec:.0f}, "
                "device-chained timing w/ host-fetch barrier)",
                "value": round(rtf, 8),
                "unit": "rtf",
                "vs_baseline": round(target / rtf, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
