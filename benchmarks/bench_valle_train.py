#!/usr/bin/env python3
"""VALL-E AR training fwd+bwd: fused flash attention (default) vs unfused.

Measured v5e-1 (B=8, S~1019, 12L/1024d/16h): 1861 ms -> 284 ms (6.55x).
The [B,H,S,S] score/prob tensors never materialize on the flash path.

Timing: gradient steps chained by data dependency; one scalar host fetch
bounds all device work (block_until_ready lies through the tunnel).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def bench(backend, b=8, tx=64, tp=225, tr=728, n=5):
    import jax
    import jax.numpy as jnp

    from jatts_tpu.models.valle import VALLEAR

    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(0, 1024, (b, tx)).astype(np.int32))
    text_lens = jnp.asarray(rng.integers(tx // 2, tx + 1, (b,)).astype(np.int32))
    proms = jnp.asarray(rng.integers(0, 1024, (b, tp, 8)).astype(np.int32))
    prom_lens = jnp.asarray(rng.integers(tp // 2, tp + 1, (b,)).astype(np.int32))
    resps = jnp.asarray(rng.integers(0, 1024, (b, tr)).astype(np.int32))
    resp_lens = jnp.asarray(rng.integers(tr // 2, tr + 1, (b,)).astype(np.int32))

    model = VALLEAR(idim=0, n_tokens=1024, d_model=1024, n_heads=16,
                    n_layers=12, p_dropout=0.0, attn_backend=backend)
    v = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        text, text_lens, proms, prom_lens, resps, resp_lens,
        deterministic=True,
    )

    @jax.jit
    def loss(v):
        return model.apply(
            v, text, text_lens, proms, prom_lens, resps, resp_lens,
            deterministic=True,
        )["loss"]

    grad = jax.jit(jax.grad(loss))
    g = grad(v)
    float(jax.tree_util.tree_leaves(g)[0].sum())  # compile + barrier
    t0 = time.perf_counter()
    vv = v
    for _ in range(n):
        g = grad(vv)
        vv = jax.tree_util.tree_map(lambda a, g_: a + 0.0 * g_, vv, g)
    s = float(jax.tree_util.tree_leaves(vv)[0].sum())
    dt = (time.perf_counter() - t0) / n
    assert np.isfinite(s)
    print(f"{backend:>5}: fwd+bwd {dt * 1e3:.1f} ms (B={b}, S~{tx + tp + tr + 2})")
    return dt


def main():
    import os

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/jatts_tpu/xla"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    t_flash = bench("flash")
    t_xla = bench("xla")
    print(f"flash speedup: {t_xla / t_flash:.2f}x")


if __name__ == "__main__":
    main()
