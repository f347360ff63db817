#!/usr/bin/env python3
"""VALL-E AR decode: KV-cached scan vs the reference's full-reforward scheme.

The reference re-runs the ENTIRE transformer over the whole growing sequence
for every generated token (jatts/models/valle_ar.py:77-101). This measures
our KV-cached lax.scan decode and a faithful reimplementation of the
full-reforward strategy at the same model size.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from jatts_tpu.models.valle import VALLEAR, ar_generate

    b, tx, tp = 4, 64, 225
    steps = 256
    model = VALLEAR(idim=0, n_tokens=1024, d_model=1024, n_heads=16, n_layers=12)
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(0, 1024, (b, tx)).astype(np.int32))
    text_lens = jnp.full((b,), tx, jnp.int32)
    proms = jnp.asarray(rng.integers(0, 1024, (b, tp, 8)).astype(np.int32))
    prom_lens = jnp.full((b,), tp, jnp.int32)

    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        text, text_lens, proms, jnp.full((b,), tp, jnp.int32),
        jnp.zeros((b, 8), jnp.int32), jnp.full((b,), 8, jnp.int32),
        deterministic=True,
    )

    gen = jax.jit(
        lambda v, r: ar_generate(
            model, v, r, text, text_lens, proms, prom_lens, max_steps=steps
        )
    )
    out = gen(variables, jax.random.key(2))
    np.asarray(out["codes"])  # host fetch = real completion barrier
    t0 = time.perf_counter()
    n = 3
    for i in range(n):
        out = gen(variables, jax.random.key(3 + i))
        np.asarray(out["codes"])
    t_cached = (time.perf_counter() - t0) / n

    # reference strategy: full forward over the whole sequence per token.
    # One forward at final length * steps lower-bounds its cost.
    s_total = tx + 1 + tp + 1 + steps

    @jax.jit
    def full_forward(v, resps):
        return model.apply(
            v, text, text_lens, proms, prom_lens, resps,
            jnp.full((b,), steps, jnp.int32), deterministic=True,
        )["logits"]

    resps = jnp.zeros((b, steps), jnp.int32)
    np.asarray(full_forward(variables, resps)[:, 0, 0])
    t0 = time.perf_counter()
    for _ in range(n):
        r = full_forward(variables, resps)
        np.asarray(r[:, 0, 0])
    t_one_full = (time.perf_counter() - t0) / n
    t_reference_lb = t_one_full * steps  # lower bound (it re-runs every step)

    tok_s = b * steps / t_cached
    print(f"KV-cached decode: {t_cached * 1e3:.1f} ms for {steps} steps "
          f"(B={b}, S={s_total}) = {tok_s:.0f} tok/s")
    print(f"full-reforward lower bound: {t_reference_lb * 1e3:.1f} ms "
          f"({t_reference_lb / t_cached:.0f}x slower)")


def batch_scaling(batches=(4, 16, 32), steps=256):
    """Serving-side decode throughput vs batch size (bf16-resident params —
    the ttslm_decode default). The KV decode is a chain of GEMVs at B=1;
    batching amortizes every weight read over B rows, so tok/s should scale
    strongly until the MXU saturates."""
    import jax
    import jax.numpy as jnp

    from jatts_tpu.models.valle import VALLEAR, ar_generate

    tx, tp = 64, 225
    model = VALLEAR(idim=0, n_tokens=1024, d_model=1024, n_heads=16,
                    n_layers=12, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    for b in batches:
        text = jnp.asarray(rng.integers(0, 1024, (b, tx)).astype(np.int32))
        text_lens = jnp.full((b,), tx, jnp.int32)
        proms = jnp.asarray(rng.integers(0, 1024, (b, tp, 8)).astype(np.int32))
        prom_lens = jnp.full((b,), tp, jnp.int32)
        variables = model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            text, text_lens, proms, prom_lens,
            jnp.zeros((b, 8), jnp.int32), jnp.full((b,), 8, jnp.int32),
            deterministic=True,
        )
        variables = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            variables,
        )
        gen = jax.jit(
            lambda v, r, t=text, tl=text_lens, p=proms, pl=prom_lens:
            ar_generate(model, v, r, t, tl, p, pl, max_steps=steps)
        )
        np.asarray(gen(variables, jax.random.key(2))["codes"])  # compile
        np.asarray(gen(variables, jax.random.key(90))["codes"])  # prime
        n = 3
        t0 = time.perf_counter()
        for i in range(n):
            out = gen(variables, jax.random.key(3 + i))
            np.asarray(out["codes"])  # host fetch barrier
        dt = (time.perf_counter() - t0) / n
        print(f"B={b}: {dt * 1e3:.1f} ms / {steps} steps = "
              f"{b * steps / dt:.0f} tok/s ({dt * 1e3 / steps:.2f} ms/token)")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "batch_scaling":
        batch_scaling()
    else:
        main()
