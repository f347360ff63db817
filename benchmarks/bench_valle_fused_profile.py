#!/usr/bin/env python3
"""Decompose the fused VALL-E serving decode (AR scan + 7-level NAR fill as
one program, serving/export.py build_valle_fn) into its stages at serving
batch sizes, plus an AR cache-chunking sweep.

Reference hot spot being beaten: jatts/models/valle_ar.py:77-101 (full
reforward per token) + valle_nar.py:88-118 (per-level loop).

Stages measured separately (each its own jitted program, host-fetch
barriers, chained dispatch):
  - ar:    ar_generate alone (KV-cached scan, chunked carry)
  - nar:   nar_generate alone on fixed level-0 codes (7 trunk passes)
  - fused: the shipped build_valle_fn program (ar + nar + sampling glue)

Run: python benchmarks/bench_valle_fused_profile.py [b=32] [sweep]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _mk(b, tx=64, tp=225, d_model=1024, n_heads=16, n_layers=12):
    import jax
    import jax.numpy as jnp

    from jatts_tpu.models.valle import VALLEAR, VALLENAR

    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(0, 1024, (b, tx)).astype(np.int32))
    text_lens = jnp.full((b,), tx, jnp.int32)
    proms = jnp.asarray(rng.integers(0, 1024, (b, tp, 8)).astype(np.int32))
    prom_lens = jnp.full((b,), tp, jnp.int32)
    models, vars_ = {}, {}
    for name, cls in (("ar", VALLEAR), ("nar", VALLENAR)):
        m = cls(idim=0, n_tokens=1024, d_model=d_model, n_heads=n_heads,
                n_layers=n_layers, dtype=jnp.bfloat16)
        resps = (jnp.zeros((b, 8), jnp.int32) if name == "ar"
                 else jnp.zeros((b, 8, 8), jnp.int32))
        v = m.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1),
             "noise": jax.random.key(2)},
            text, text_lens, proms, prom_lens, resps,
            jnp.full((b,), 8, jnp.int32), deterministic=True,
        )
        vars_[name] = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, v,
        )
        models[name] = m
    return models, vars_, (text, text_lens, proms, prom_lens)


def _time(fn, n=3):
    """Compile + prime, then n timed host-fetch-bounded calls."""
    np.asarray(fn(0))
    np.asarray(fn(100))
    t0 = time.perf_counter()
    for i in range(n):
        np.asarray(fn(3 + i))
    return (time.perf_counter() - t0) / n


def profile(b=32, max_steps=256, n_chunks=None):
    import jax

    from jatts_tpu.models.valle import ar_generate, nar_generate
    from jatts_tpu.serving.export import build_valle_fn

    models, vars_, inputs = _mk(b)
    text, text_lens, proms, prom_lens = inputs
    audio_s = b * max_steps / 75.0

    # weights must be ARGUMENTS of the jitted fn, not closure constants —
    # closed-over arrays are serialized into the remote-compile payload
    # (HTTP 413 at B=32 with 150M bf16 params)
    ar_j = jax.jit(lambda v, seed: ar_generate(
        models["ar"], v, jax.random.PRNGKey(seed), *inputs,
        max_steps=max_steps, n_chunks=n_chunks)["codes"])
    ar = lambda seed: ar_j(vars_["ar"], seed)
    t_ar = _time(ar)
    print(f"B={b} ar-only:   {t_ar * 1e3:7.1f} ms  "
          f"({b * max_steps / t_ar:.0f} tok/s, rtf {t_ar / audio_s:.5f})",
          flush=True)

    rng0 = np.random.default_rng(1)
    level0 = np.asarray(rng0.integers(0, 1024, (b, max_steps)), np.int32)
    resp_lens = np.full((b,), max_steps, np.int32)
    nar_j = jax.jit(lambda v, seed: nar_generate(
        models["nar"], v, jax.random.PRNGKey(seed), *inputs,
        level0, resp_lens))
    nar = lambda seed: nar_j(vars_["nar"], seed)
    t_nar = _time(nar)
    print(f"B={b} nar-only:  {t_nar * 1e3:7.1f} ms  (7 levels, "
          f"rtf {t_nar / audio_s:.5f})", flush=True)

    fused, weights = build_valle_fn(
        models["ar"], vars_["ar"], models["nar"], vars_["nar"],
        max_steps=max_steps,
    )
    weights = jax.device_put(weights)
    fn = jax.jit(fused)
    fz = lambda seed: fn(weights, text, text_lens, proms, prom_lens,
                         np.uint32(seed))["codes"]
    t_f = _time(fz)
    print(f"B={b} fused:     {t_f * 1e3:7.1f} ms  rtf {t_f / audio_s:.5f} "
          f"(ar+nar sum {1e3 * (t_ar + t_nar):.1f} ms)", flush=True)
    return t_ar, t_nar, t_f


def chunk_sweep(b=32, max_steps=256):
    import jax

    from jatts_tpu.models.valle import ar_generate

    models, vars_, inputs = _mk(b)
    for nc in (1, 2, 4, 8, 16):
        ar_j = jax.jit(lambda v, seed, nc=nc: ar_generate(
            models["ar"], v, jax.random.PRNGKey(seed), *inputs,
            max_steps=max_steps, n_chunks=nc)["codes"])
        t = _time(lambda seed: ar_j(vars_["ar"], seed))
        print(f"B={b} n_chunks={nc:2d}: {t * 1e3:7.1f} ms "
              f"({b * max_steps / t:.0f} tok/s)", flush=True)


if __name__ == "__main__":
    import os

    import jax

    if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser("~/.cache/jatts_tpu/xla"),
        )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    b = 32
    mode = "profile"
    for a in sys.argv[1:]:
        if a.startswith("b="):
            b = int(a[2:])
        elif a == "sweep":
            mode = "sweep"
    if mode == "sweep":
        chunk_sweep(b=b)
    else:
        profile(b=b)
