"""Time-to-first-audio: streaming vs full-utterance HiFi-GAN vocoding.

Measures, on one chip at serving shape (B=8, T=1024 mel frames, full-size
24 kHz generator, bf16 weights like the serving bundles):

  - full vocode latency (one program, whole waveform);
  - streaming TTFA: latency until the FIRST chunk's samples are on the host;
  - streaming total: all chunks fetched sequentially (the serving loop's
    shape: chunk k plays while k+1 computes — through this environment's
    remote tunnel each window pays a dispatch round trip, so the total is an
    upper bound; on directly-attached TPUs the windows overlap the fetches).

Methodology per CLAUDE.md: host fetch as the completion barrier, chained
dispatch primed before timing.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def run(b=8, t=1024, chunk=128, quiet=False):
    import jax
    import jax.numpy as jnp

    from jatts_tpu.vocoder.hifigan import HiFiGANGenerator
    from jatts_tpu.vocoder.streaming import (
        hop_size,
        min_context_frames,
        vocode_streaming,
    )

    voc = HiFiGANGenerator()
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(size=(b, t, 80)).astype(np.float32))
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), voc.init(jax.random.key(0), mel)
    )
    variables = jax.device_put(variables)
    mel = jax.device_put(mel)
    hop, ctx = hop_size(voc), min_context_frames(voc)
    sr = 24000

    full_fn = jax.jit(voc.apply)

    def full_once():
        wav = full_fn(variables, mel)
        return np.asarray(wav[:, :: 4096 * 64])  # host fetch barrier

    def stream_once():
        """Returns (ttfa_s, total_s) for one streamed utterance batch."""
        t0 = time.perf_counter()
        ttfa = None
        for w in vocode_streaming(voc, variables, mel, chunk=chunk, context=ctx):
            np.asarray(w[:, :: 4096 * 16])  # fetch = this window's barrier
            if ttfa is None:
                ttfa = time.perf_counter() - t0
        return ttfa, time.perf_counter() - t0

    # compile + prime the chained dispatch path
    full_once()
    stream_once()
    for _ in range(2):
        full_once()
        stream_once()

    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        full_once()
    full_s = (time.perf_counter() - t0) / n

    ttfas, totals = [], []
    for _ in range(n):
        a, b_ = stream_once()
        ttfas.append(a)
        totals.append(b_)
    ttfa_s, total_s = float(np.median(ttfas)), float(np.median(totals))

    audio_s = t * hop / sr
    out = {
        "b": b, "t_mel": t, "chunk": chunk, "context": ctx,
        "full_vocode_ms": round(full_s * 1e3, 1),
        "stream_ttfa_ms": round(ttfa_s * 1e3, 1),
        "stream_total_ms": round(total_s * 1e3, 1),
        "ttfa_speedup_vs_full": round(full_s / ttfa_s, 2),
        "first_chunk_audio_s": round(chunk * hop / sr, 3),
        "utterance_audio_s": round(audio_s, 2),
    }
    if not quiet:
        print(out)
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--t", type=int, default=1024)
    args = ap.parse_args()
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        __import__("os").path.expanduser("~/.cache/jatts_tpu/xla"),
    )
    run(b=args.b, t=args.t, chunk=args.chunk)
