#!/usr/bin/env python3
"""Batched Pallas MAS kernel vs the XLA-scan MAS on hardware.

Run on the real chip (nothing else may hold the TPU tunnel). The round-1
per-sample kernel lost to the scan (5.5 ms vs 4.2 ms at 16x1024x128); the
batched v2 kernel processes all B lattices per vector step.

Timing: scalar host fetch per iteration (block_until_ready returns early
through the tunnel); iterations chained by data dependency.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def bench(fn, lp, tl, fl, n=10):
    import jax.numpy as jnp

    out = fn(lp, tl, fl)
    base = float(out.sum())  # compile + barrier
    # prime the chained path (first-in-process dispatches pay tunnel
    # ramp-up — see bench_decode_all.py)
    acc0 = 0
    for _ in range(3):
        out = fn(lp + (acc0 * 0.0), tl, fl)
        acc0 = out.sum() * jnp.float32(1e-12)
    float(acc0)
    t0 = time.perf_counter()
    acc = 0
    for _ in range(n):
        # chain: input depends on previous output's checksum (keeps device
        # executions serialized without a host fetch per step)
        out = fn(lp + (acc * 0.0), tl, fl)
        acc = out.sum() * jnp.float32(1e-12)
    float(acc)
    dt = (time.perf_counter() - t0) / n
    assert np.isfinite(base)
    return dt


def main():
    import os

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/jatts_tpu/xla"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from jatts_tpu.ops.mas import mas_path
    from jatts_tpu.ops.mas_pallas import mas_path_pallas

    b, t_feats, t_text = 16, 1024, 128
    rng = np.random.default_rng(0)
    lp = jax.nn.log_softmax(
        jnp.asarray(rng.normal(size=(b, t_feats, t_text)).astype(np.float32)),
        axis=-1,
    )
    tl = jnp.asarray(rng.integers(t_text // 2, t_text + 1, (b,)))
    fl = jnp.asarray(rng.integers(t_feats // 2, t_feats + 1, (b,)))

    # correctness on hardware first
    want = np.asarray(mas_path(lp, tl, fl))
    got = np.asarray(mas_path_pallas(lp, tl, fl))
    np.testing.assert_array_equal(got, want)
    print("hardware parity: exact")

    t_scan = bench(jax.jit(mas_path), lp, tl, fl)
    t_pallas = bench(jax.jit(mas_path_pallas), lp, tl, fl)
    print(f"scan   MAS: {t_scan * 1e3:.2f} ms  (B={b}, T_feats={t_feats}, T_text={t_text})")
    print(f"pallas MAS: {t_pallas * 1e3:.2f} ms  ({t_scan / t_pallas:.2f}x vs scan)")


if __name__ == "__main__":
    main()
