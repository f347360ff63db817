#!/usr/bin/env python3
"""Isolate the NAR generate inefficiency at serving shapes (B=32).

nar_generate (7 levels via the lifted nn.scan) measured 1377 ms at B=32
before the hidden-row-gather fix (now 561 ms: the [B,Tr,V]-index logits
gather was ~127 ms/level — see models/valle.py trunk return_hidden) —
~197 ms per level-pass = ~29 TF/s, vs the 75 TF/s the AR *training* step
sustains at comparable token counts. Candidates: the lifted scan itself,
the AdaLN norm, the full-sequence f32 classifier + the [B,Tr,V]-index
take_along_axis glue, or the per-pass embeddings/pack.

Stages (each its own jitted program, weights as ARGS, host-fetch barriers,
chained dispatch):
  - trunk1:    ONE trunk pass (fixed level), full classifier
  - unroll7:   7 unrolled trunk passes + sampling glue (pre-lift semantics)
  - scan7:     nar_generate as shipped (lifted scan)

Run: python benchmarks/bench_nar_isolate.py [b=32]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _time(fn, n=3):
    np.asarray(fn(0))
    np.asarray(fn(100))
    t0 = time.perf_counter()
    for i in range(n):
        np.asarray(fn(3 + i))
    return (time.perf_counter() - t0) / n


def main(b=32, tr=256, tx=64, tp=225):
    import jax
    import jax.numpy as jnp

    from jatts_tpu.models.valle import VALLENAR, nar_generate

    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(0, 1024, (b, tx)).astype(np.int32))
    text_lens = jnp.full((b,), tx, jnp.int32)
    proms = jnp.asarray(rng.integers(0, 1024, (b, tp, 8)).astype(np.int32))
    prom_lens = jnp.full((b,), tp, jnp.int32)
    model = VALLENAR(idim=0, n_tokens=1024, d_model=1024, n_heads=16,
                     n_layers=12, dtype=jnp.bfloat16)
    v = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1),
         "noise": jax.random.key(2)},
        text, text_lens, proms, prom_lens,
        jnp.zeros((b, 8, 8), jnp.int32), jnp.full((b,), 8, jnp.int32),
        deterministic=True,
    )
    v = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, v
    )
    level0 = jnp.asarray(rng.integers(0, 1024, (b, tr)), jnp.int32)
    resp_lens = jnp.full((b,), tr, jnp.int32)
    codes0 = jnp.zeros((b, tr, 8), jnp.int32).at[:, :, 0].set(level0)

    # ---- one trunk pass, fixed level q=3 ------------------------------
    def one_pass(v, codes, seed):
        q = jnp.full((b,), 3, jnp.int32)
        logits, total = model.apply(
            v, text, text_lens, proms, prom_lens, codes, resp_lens,
            q + 1, q, True, method=VALLENAR.trunk,
        )
        return logits.sum(), logits

    j1 = jax.jit(lambda v, codes, seed: one_pass(v, codes, seed)[0])
    t1 = _time(lambda s: j1(v, codes0, s))
    print(f"B={b} trunk1 : {t1 * 1e3:7.1f} ms  (x7 = {7e3 * t1:.0f} ms)",
          flush=True)

    # ---- 7 unrolled passes + sampling glue ----------------------------
    def unroll(v, codes, seed):
        r = jax.random.PRNGKey(seed)
        for level in range(7):
            q = jnp.full((b,), level, jnp.int32)
            logits, total = model.apply(
                v, text, text_lens, proms, prom_lens, codes, resp_lens,
                q + 1, q, True, method=VALLENAR.trunk,
            )
            s = logits.shape[1]
            start = text_lens[:, None] + prom_lens[:, None] + 2
            pos = jnp.clip(jnp.arange(tr)[None, :] + start, 0, s - 1)
            resp_logits = jnp.take_along_axis(
                logits, pos[..., None].repeat(logits.shape[-1], -1), axis=1
            )
            r, rs = jax.random.split(r)
            sampled = jax.random.categorical(rs, resp_logits / 0.2, axis=-1)
            codes = jax.lax.dynamic_update_slice_in_dim(
                codes, sampled[..., None].astype(codes.dtype), level + 1, axis=2
            )
        return codes

    ju = jax.jit(unroll)
    tu = _time(lambda s: ju(v, codes0, s))
    print(f"B={b} unroll7: {tu * 1e3:7.1f} ms", flush=True)

    # ---- honest single pass: tanh barrier (a plain .sum() lets XLA
    # factor the classifier matmul into x @ (W @ 1) and skip it) ---------
    jt = jax.jit(lambda v, codes, seed: jnp.tanh(
        one_pass(v, codes, seed)[1]).sum())
    tt = _time(lambda s: jt(v, codes0, s))
    print(f"B={b} trunk1t: {tt * 1e3:7.1f} ms  (x7 = {7e3 * tt:.0f} ms)",
          flush=True)

    # ---- glue bisections ----------------------------------------------
    def unroll_var(v, codes, seed, sample="categorical", gather=True):
        r = jax.random.PRNGKey(seed)
        for level in range(7):
            q = jnp.full((b,), level, jnp.int32)
            logits, total = model.apply(
                v, text, text_lens, proms, prom_lens, codes, resp_lens,
                q + 1, q, True, method=VALLENAR.trunk,
            )
            s = logits.shape[1]
            if gather:
                start = text_lens[:, None] + prom_lens[:, None] + 2
                pos = jnp.clip(jnp.arange(tr)[None, :] + start, 0, s - 1)
                resp_logits = jnp.take_along_axis(
                    logits, pos[..., None].repeat(logits.shape[-1], -1), axis=1
                )
            else:
                resp_logits = logits[:, :tr]  # wrong region, same shape/cost
            r, rs = jax.random.split(r)
            if sample == "categorical":
                sampled = jax.random.categorical(rs, resp_logits / 0.2, axis=-1)
            else:
                sampled = jnp.argmax(resp_logits, axis=-1)
            codes = jax.lax.dynamic_update_slice_in_dim(
                codes, sampled[..., None].astype(codes.dtype), level + 1, axis=2
            )
        return codes

    for label, kw in (
        ("unroll7_argmax  ", dict(sample="argmax")),
        ("unroll7_nogather", dict(gather=False)),
        ("unroll7_neither ", dict(sample="argmax", gather=False)),
    ):
        jv = jax.jit(lambda v, codes, seed, kw=kw: unroll_var(
            v, codes, seed, **kw))
        tv = _time(lambda s: jv(v, codes0, s))
        print(f"B={b} {label}: {tv * 1e3:7.1f} ms", flush=True)

    # ---- shipped lifted-scan path -------------------------------------
    js = jax.jit(lambda v, seed: nar_generate(
        model, v, jax.random.PRNGKey(seed), text, text_lens, proms,
        prom_lens, level0, resp_lens))
    ts = _time(lambda s: js(v, s))
    print(f"B={b} scan7  : {ts * 1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    import os

    import jax

    if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser("~/.cache/jatts_tpu/xla"),
        )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    main(b)
