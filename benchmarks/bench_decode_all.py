#!/usr/bin/env python3
"""Batched inference RTF for the non-FS2 mel families: MatchaTTS (ODE
decoder, n_timesteps Euler steps) and mel-VITS — the driver bench covers
FS2+HiFi-GAN and VALL-E.

Host-fetch barriers; iterations chained by data dependency (see CLAUDE.md).

Measured v5e-1, bf16, round 4 (weights passed as jit ARGUMENTS — closing
over them baked ~120 MB of params into the HLO as constants, which is what
413'd the compile relay in round 3):
    matcha ODE-10 (B=8 x 1024f)   RTF 0.00024  (335k mel-frames/s)
    matcha ODE-32                 RTF 0.00063  (128k mel-frames/s)
    vits                          RTF 0.00016  (503k mel-frames/s)
    e2tts NFE-32 CFG (24L/1024d,
      B=4, doubled-batch CFG)     RTF 0.03940  (2k mel-frames/s)
E2-TTS is the one family above the 0.01 framework RTF target — inherent
to 32x2 full-transformer passes per utterance batch; every other family
is 10-60x under the target. The first benchmark in a process absorbs
~2.3 s/call of tunnel/session ramp-up — fixed by priming the chained
dispatch path untimed in _bench.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

SR, HOP = 24000, 300


def _bench(label, infer, feed, b, t_feats, n=5, quiet=False):
    out = infer(feed)
    base = float(out.sum())
    assert np.isfinite(base), f"{label}: non-finite output"
    import jax.numpy as jnp

    # prime the exact chained dispatch path: the first few dispatches of a
    # process pay seconds of tunnel/session ramp-up that otherwise lands in
    # whichever benchmark runs first (observed: identical configs measured
    # 2.3 s/call first-in-process vs 26 ms/call after)
    acc = jnp.zeros((), jnp.float32)
    for _ in range(3):
        out = infer(feed + (acc * 0.0).astype(feed.dtype))
        acc = out.sum() * jnp.float32(1e-12)
    float(acc)

    t0 = time.perf_counter()
    for _ in range(n):
        out = infer(feed + (acc * 0.0).astype(feed.dtype))
        acc = out.sum() * jnp.float32(1e-12)
    float(acc)
    dt = (time.perf_counter() - t0) / n
    rtf = dt / (b * t_feats * HOP / SR)
    if not quiet:
        print(f"{label}: RTF {rtf:.5f} ({b * t_feats / dt / 1e3:.0f}k mel-frames/s)")
    return rtf


def bench_matcha(n_timesteps=10, quiet=False):
    import jax
    import jax.numpy as jnp

    from jatts_tpu.models.matchatts import MatchaTTS

    b, t_text, t_feats = 8, 128, 1024
    model = MatchaTTS(idim=64, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.integers(1, 64, (b, t_text)).astype(np.int32))
    ilens = jnp.full((b,), t_text, jnp.int32)
    ds = jnp.asarray(np.full((b, t_text), t_feats // t_text, np.int32))
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1),
         "noise": jax.random.key(2)},
        xs, ilens, jnp.zeros((b, t_feats, 80), jnp.float32),
        jnp.full((b,), t_feats, jnp.int32), ds, deterministic=False,
    )

    # variables as ARGUMENTS, not a closure: jit embeds captured arrays as
    # HLO constants, ballooning the compile payload past the remote relay's
    # request limit (observed 178 MB stablehlo -> HTTP 413; ~1 MB without)
    variables = jax.device_put(variables)

    @jax.jit
    def infer_v(variables, xs):
        out = model.apply(
            variables, xs, ilens, t_feats, method=type(model).inference,
            rngs={"noise": jax.random.key(9)}, n_timesteps=n_timesteps,
        )
        return out["feat_gen"].astype(jnp.float32)

    return _bench(f"matcha ODE-{n_timesteps}",
                  lambda feed: infer_v(variables, feed), xs, b, t_feats,
                  quiet=quiet)


def bench_vits(quiet=False):
    import jax
    import jax.numpy as jnp

    from jatts_tpu.models.vits import VITS

    b, t_text, t_feats = 8, 128, 1024
    model = VITS(idim=64, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.integers(1, 64, (b, t_text)).astype(np.int32))
    ilens = jnp.full((b,), t_text, jnp.int32)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1),
         "noise": jax.random.key(2)},
        xs, ilens, jnp.zeros((b, t_feats, 80), jnp.float32),
        jnp.full((b,), t_feats, jnp.int32), deterministic=False,
    )

    variables = jax.device_put(variables)  # argument, not closure (see above)

    @jax.jit
    def infer_v(variables, xs):
        out = model.apply(
            variables, xs, ilens, t_feats, method=type(model).inference,
            rngs={"noise": jax.random.key(9)},
        )
        return out["feat_gen"].astype(jnp.float32)

    return _bench("vits", lambda feed: infer_v(variables, feed), xs, b,
                  t_feats, quiet=quiet)


def main():
    import os

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/jatts_tpu/xla"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    for fn in (lambda: bench_matcha(10), lambda: bench_matcha(32), bench_vits,
               bench_e2tts):
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — relay 413 / compile flakes
            print(f"# failed: {str(e)[:140]}")


def bench_e2tts(steps=32, dim=1024, depth=24, heads=16, b=4, quiet=False):
    """E2-TTS NFE-32 CFG inference (doubled-batch CFG Euler, bf16 compute,
    XLA attention — the round-3 default; full-size UNetT). May 413 on the
    compile relay — isolated by main()."""
    import jax
    import jax.numpy as jnp

    from jatts_tpu.models.e2tts import E2TTS

    t_max, nt = 1024, 96
    model = E2TTS(idim=64, odim=80, dim=dim, depth=depth, heads=heads,
                  dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.normal(size=(b, t_max, 80)).astype(np.float32))
    text = jnp.asarray(rng.integers(0, 64, (b, nt)).astype(np.int32))
    ref_lens = jnp.full((b,), 256, jnp.int32)
    duration = jnp.full((b,), t_max, jnp.int32)
    feats = jnp.asarray(rng.normal(size=(b, 128, 80)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1),
         "noise": jax.random.key(2)},
        text, feats, jnp.full((b,), 128, jnp.int32), deterministic=False,
    )

    variables = jax.device_put(variables)  # argument, not closure (see above)

    @jax.jit
    def infer_v(variables, cond):
        out = model.apply(
            variables, cond, text, ref_lens, duration,
            method=type(model).inference, rngs={"noise": jax.random.key(9)},
            steps=steps, sway_sampling_coef=-1.0,
        )
        return out["feat_gen"].astype(jnp.float32)

    return _bench(f"e2tts NFE-{steps} ({depth}L/{dim}d, B={b})",
                  lambda feed: infer_v(variables, feed), cond, b, t_max,
                  quiet=quiet)


if __name__ == "__main__":
    main()
