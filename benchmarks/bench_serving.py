"""Serving-layer benchmark: throughput + tail latency through the
micro-batching server over an AOT bundle on one chip.

What it measures (the production serving story the reference lacks —
its decode is an offline batch loop, jatts/bin/tts_decode.py:203-274):

  1. offered-load throughput: N concurrent per-utterance requests through
     BatchingServer (requests group into fixed-batch program calls) —
     utterances/s and the serving RTF at that rate;
  2. solo latency: sequential single requests, p50/p99 — what one user
     pays end-to-end (batch window + a padded batch-of-1 program call).

Timing honesty (CLAUDE.md): every program call inside
``ServingBundle.synthesize`` ends with full host fetches of the outputs
(np.asarray), so client-side wall clock is a true completion barrier; the
run primes the exact dispatch path with untimed batches first (fresh-process
tunnel ramp-up is ~2.3 s/call for the first few dispatches).

Default config mirrors bench.py's flagship: full-JSUT FastSpeech2
(adim 384, 4+4 conformer layers, bf16) + HiFi-GAN baked in (text->wav
artifact), B=8, text bucket 128, 1024-frame capacity, random weights
(speed is weight-independent). ``--tiny`` runs a CPU-sized smoke config.

Usage:
    python benchmarks/bench_serving.py            # one chip, recipe size
    python benchmarks/bench_serving.py --tiny     # CPU smoke (forces the cpu
                                                  # backend in-process; the
                                                  # env var alone is NOT
                                                  # enough under axon)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _enable_compile_cache():
    import jax

    if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser("~/.cache/jatts_tpu/xla"),
        )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _build_bundle(workdir: str, tiny: bool, batch_size: int,
                  with_vocoder: bool = True, stream_chunk: int = 0):
    import jax
    import jax.numpy as jnp

    from jatts_tpu.models.fastspeech2 import FastSpeech2
    from jatts_tpu.serving.export import (
        build_infer_fn,
        build_stream_step_fn,
        export_bundle,
        load_bundle,
    )

    if tiny:
        num_mels, max_frames, bucket = 8, 64, 16
        model = FastSpeech2(
            idim=16, odim=num_mels, adim=16, aheads=2, elayers=1, eunits=32,
            dlayers=1, dunits=32, postnet_layers=0,
            duration_predictor_chans=8, pitch_predictor_chans=8,
            pitch_predictor_layers=2, energy_predictor_chans=8,
            conformer_enc_kernel_size=7, conformer_dec_kernel_size=7,
        )
        vocoder = _random_vocoder(num_mels, tiny=True) \
            if (with_vocoder or stream_chunk) else None
    else:
        num_mels, max_frames, bucket = 80, 1024, 128
        model = FastSpeech2(idim=64, dtype=jnp.bfloat16)  # full-JSUT size
        # the text->wav artifact (HiFi-GAN baked in) is the shipped default,
        # but its exported program is large enough that the remote-compile
        # relay may not finish it in a bench window (observed >20 min);
        # --no-vocoder benches the text->mel artifact instead
        vocoder = (
            _random_vocoder(num_mels)
            if (with_vocoder or stream_chunk) else None
        )

    config = {"model_type": "FastSpeech2", "num_mels": num_mels,
              "sampling_rate": 24000, "hop_size": 300}
    # jit init as ONE program — eager init through the axon tunnel is
    # pathological (per-op HTTP round trips, see CLAUDE.md)
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.key(0)},
            np.ones((1, 5), np.int32), np.array([5]), max_frames,
            method=FastSpeech2.inference,
        )
    )()
    stream = None
    baked = vocoder
    if stream_chunk:
        # streaming artifact: mel program + chunked-vocoder program — the
        # vocoder is NOT baked into the infer fn (that would be the opposite
        # of streaming)
        stream = build_stream_step_fn(
            vocoder, max_frames, num_mels, chunk=stream_chunk
        )
        baked = None
    fn, weights = build_infer_fn(
        config, model, variables, np.zeros(num_mels, np.float32),
        np.ones(num_mels, np.float32), max_frames, vocoder=baked,
    )
    hop = int(vocoder.hop_size) if vocoder is not None else 300
    meta = {"output": "wav" if baked is not None else "mel",
            "hop_size": hop, "sampling_rate": 24000}
    path = export_bundle(
        os.path.join(workdir, "serving.npz"), fn, batch_size, [bucket],
        meta, platforms=[jax.default_backend()], weights=weights,
        stream=stream,
    )
    return load_bundle(path), bucket


def _random_vocoder(num_mels, tiny: bool = False):
    """Random-weight HiFi-GAN in the Vocoder duck-type build_infer_fn uses."""
    import jax
    import jax.numpy as jnp

    from jatts_tpu.vocoder.hifigan import HiFiGANGenerator

    gen = (
        HiFiGANGenerator(
            in_channels=num_mels, channels=8, upsample_scales=(4, 2),
            upsample_kernel_sizes=(8, 4), resblock_kernel_sizes=(3,),
            resblock_dilations=((1, 3),),
        )
        if tiny else HiFiGANGenerator()
    )
    gen_vars = jax.jit(
        lambda: gen.init(
            jax.random.key(2), jnp.zeros((1, 8, num_mels), jnp.float32)
        )
    )()

    class _V:
        model = gen
        variables = gen_vars
        mean = scale = None
        hop_size = int(np.prod(gen.upsample_scales))

    return _V()


def run_ttfa(tiny: bool = False, batch_size: int = 8, stream_chunk: int = 128,
             n: int = 10):
    """Time-to-first-audio through the streaming artifact (mel bundle +
    chunked-vocoder program): one solo request, wall clock until the first
    playable chunk is on the host, vs the time for the full waveform.
    Random weights (speed is weight-independent)."""
    rng = np.random.default_rng(0)
    idim = 16 if tiny else 64
    with tempfile.TemporaryDirectory() as workdir:
        bundle, bucket = _build_bundle(
            workdir, tiny, batch_size, with_vocoder=False,
            stream_chunk=stream_chunk,
        )
        text = _texts(1, bucket, rng, idim)
        # prime: compile both programs + tunnel ramp-up on the exact path
        for _ in range(3):
            for _rows in bundle.synthesize_streaming(text, seed=0):
                pass
        ttfa = np.zeros(n)
        total = np.zeros(n)
        for i in range(n):
            t0 = time.monotonic()
            first = None
            for rows in bundle.synthesize_streaming(text, seed=i):
                if first is None and len(rows[0]["wav"]):
                    first = time.monotonic() - t0
            total[i] = time.monotonic() - t0
            ttfa[i] = first
        return {
            "stream_chunk": stream_chunk,
            "ttfa_p50_ms": round(float(np.percentile(ttfa, 50)) * 1e3, 1),
            "ttfa_p99_ms": round(float(np.percentile(ttfa, 99)) * 1e3, 1),
            "stream_total_p50_ms": round(
                float(np.percentile(total, 50)) * 1e3, 1
            ),
        }


def _texts(n, bucket, rng, idim):
    # realistic spread: half to full bucket; ids stay inside the model's
    # embedding table (XLA clamps OOB gathers, but relying on that is silent)
    hi = min(60, idim)
    return [list(rng.integers(1, hi, int(rng.integers(bucket // 2, bucket + 1))))
            for _ in range(n)]


def run(tiny: bool = False, batch_size: int = 8, n_load: int = 64,
        n_solo: int = 20, max_delay_ms: float = 5.0,
        with_vocoder: bool = True):
    from jatts_tpu.serving.server import BatchingServer

    rng = np.random.default_rng(0)
    idim = 16 if tiny else 64
    with tempfile.TemporaryDirectory() as workdir:
        t0 = time.monotonic()
        bundle, bucket = _build_bundle(workdir, tiny, batch_size, with_vocoder)
        export_s = time.monotonic() - t0

        # prime: compile (first call) + tunnel ramp-up on the exact path
        prime = _texts(batch_size, bucket, rng, idim)
        t0 = time.monotonic()
        bundle.synthesize(prime, seed=0)
        compile_s = time.monotonic() - t0
        for _ in range(3):
            bundle.synthesize(prime, seed=0)

        out = {"bucket": bucket, "batch_size": batch_size,
               "export_s": round(export_s, 1), "first_call_s": round(compile_s, 1),
               "output": bundle.meta.get("output", "mel")}
        hop_size = int(bundle.meta.get("hop_size", 300))

        # --- offered load: all requests in flight at once -------------------
        texts = _texts(n_load, bucket, rng, idim)
        lat = np.zeros(n_load)
        mel_frames = np.zeros(n_load, np.int64)
        errors = []
        with BatchingServer(bundle, max_delay_ms=max_delay_ms) as server:
            start = np.zeros(n_load)
            barrier = threading.Barrier(n_load + 1)

            def fire(i):
                try:
                    barrier.wait()
                    start[i] = time.monotonic()
                    res = server.submit(token_ids=texts[i]).result(timeout=600)
                    lat[i] = time.monotonic() - start[i]
                    # host np arrays already fetched by the bundle; pcm16
                    # wav artifacts carry no mel — frames from wav length
                    if "mel" in res:
                        mel_frames[i] = res["mel"].shape[0]
                    else:
                        mel_frames[i] = len(res["wav"]) // hop_size
                except Exception as e:  # noqa: BLE001 — re-raised after join
                    errors.append((i, e))

            threads = [threading.Thread(target=fire, args=(i,))
                       for i in range(n_load)]
            for t in threads:
                t.start()
            barrier.wait()
            t0 = time.monotonic()
            for t in threads:
                t.join()
            wall = time.monotonic() - t0
            stats = dict(server.stats)
        if errors:
            # a dead request would silently corrupt percentiles/throughput
            raise RuntimeError(
                f"{len(errors)} request(s) failed; first: {errors[0][1]!r}"
            ) from errors[0][1]

        out.update(
            load_requests=n_load,
            load_batches=stats["batches"],
            load_wall_s=round(wall, 3),
            throughput_utt_per_s=round(n_load / wall, 2),
            load_p50_ms=round(float(np.percentile(lat, 50)) * 1e3, 1),
            load_p99_ms=round(float(np.percentile(lat, 99)) * 1e3, 1),
        )

        # --- under-saturated: Poisson arrivals at ~50% of the measured
        # saturated throughput (latency should approach solo + batch window)
        half_rate = max(0.5 * n_load / wall, 0.1)
        pace_lat = np.zeros(n_load)
        pace_err = []
        arrivals = np.cumsum(rng.exponential(1.0 / half_rate, n_load))
        done_at = np.zeros(n_load)
        with BatchingServer(bundle, max_delay_ms=max_delay_ms) as server:
            futs = [None] * n_load
            t0 = time.monotonic()
            sub = np.zeros(n_load)
            for i, t in enumerate(texts):
                now = time.monotonic() - t0
                if arrivals[i] > now:
                    time.sleep(arrivals[i] - now)
                sub[i] = time.monotonic()
                futs[i] = server.submit(token_ids=t)
                # completion stamped by the callback, not by collection
                # order (result() in submission order would inflate
                # latencies of requests that finished while we blocked)
                futs[i].add_done_callback(
                    lambda f, i=i: done_at.__setitem__(i, time.monotonic())
                )
            for i, f in enumerate(futs):
                try:
                    f.result(timeout=600)
                    pace_lat[i] = done_at[i] - sub[i]
                except Exception as e:  # noqa: BLE001
                    pace_err.append(e)
        if pace_err:
            raise RuntimeError(f"paced request failed: {pace_err[0]!r}")
        out.update(
            paced_rate_utt_per_s=round(half_rate, 2),
            paced_p50_ms=round(float(np.percentile(pace_lat, 50)) * 1e3, 1),
            paced_p99_ms=round(float(np.percentile(pace_lat, 99)) * 1e3, 1),
        )

        # --- solo latency: one request at a time ----------------------------
        solo = np.zeros(n_solo)
        with BatchingServer(bundle, max_delay_ms=max_delay_ms) as server:
            for i, t in enumerate(_texts(n_solo, bucket, rng, idim)):
                t0 = time.monotonic()
                server.submit(token_ids=t).result(timeout=600)
                solo[i] = time.monotonic() - t0
        out.update(
            solo_p50_ms=round(float(np.percentile(solo, 50)) * 1e3, 1),
            solo_p99_ms=round(float(np.percentile(solo, 99)) * 1e3, 1),
        )

        # serving RTF at offered load: wall-seconds per audio-second actually
        # generated — the TRUE olens-cropped frame counts from the results,
        # not the 1024-frame capacity (which would understate RTF)
        if not tiny:
            sr = int(bundle.meta.get("sampling_rate", 24000))
            hop = int(bundle.meta.get("hop_size", 300))
            audio_s = float(mel_frames.sum()) * hop / sr
            out["audio_s_generated"] = round(audio_s, 1)
            out["serving_rtf"] = round(wall / audio_s, 5)
        return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="CPU smoke config")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--n-load", type=int, default=64)
    ap.add_argument("--n-solo", type=int, default=20)
    ap.add_argument("--max-delay-ms", type=float, default=5.0)
    ap.add_argument("--no-vocoder", action="store_true",
                    help="bench the text->mel artifact (smaller program)")
    ap.add_argument("--ttfa", action="store_true",
                    help="measure time-to-first-audio through the "
                         "streaming artifact instead of the load test")
    ap.add_argument("--stream-chunk", type=int, default=128,
                    help="mel frames per streamed chunk (--ttfa)")
    args = ap.parse_args()
    if args.tiny:
        # force CPU before any backend init: the axon sitecustomize pins
        # jax_platforms=axon,cpu and the JAX_PLATFORMS env var alone is NOT
        # enough — without this, a "CPU" smoke can steal the single-client
        # TPU tunnel from a concurrent run (see CLAUDE.md)
        import jax

        jax.config.update("jax_platforms", "cpu")
    _enable_compile_cache()
    if args.ttfa:
        out = run_ttfa(tiny=args.tiny, batch_size=args.batch_size,
                       stream_chunk=args.stream_chunk)
    else:
        out = run(tiny=args.tiny, batch_size=args.batch_size,
                  n_load=args.n_load, n_solo=args.n_solo,
                  max_delay_ms=args.max_delay_ms,
                  with_vocoder=not args.no_vocoder)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
