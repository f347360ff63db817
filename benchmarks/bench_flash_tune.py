#!/usr/bin/env python3
"""Explain (or beat) the Pallas flash-attention ceiling — VERDICT r3 item 5.

Round 3 measured the stock `jax.experimental.pallas.ops.tpu.flash_attention`
at ~8 TFLOP/s on v5e-1 while XLA materialized attention reached ~26, and
reversed the default backend to XLA for every S<=4096 without explaining the
gap. Hypothesis under test here: the stock kernel's DEFAULT BlockSizes are
128 everywhere (`BlockSizes.get_default` — "TODO: select better parameters")
— 128x128 tiles at d_head 64 under-feed the MXU and pay grid overhead per
(128-row q block, 128-col k block) step. This sweep times the kernel over
block-size configs at S in {2048, 4096, 8192}, fwd and fwd+bwd, bf16,
d_head 64 (the VALL-E / E2-TTS head shape), against the XLA baseline.

Outputs TF/s per config; the winner feeds `attention._flash_block_sizes`
and the measured crossover updates the `auto` policy threshold.

Usage (TPU, single-client tunnel — nothing else on the chip):
    python benchmarks/bench_flash_tune.py [--seqs 2048 4096 8192] [--bwd]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _bench_chain(fn, q, flops, n_rep=3, prime=2, label=""):
    """Scanned k-iteration program; host scalar fetch as the barrier."""
    import jax.numpy as jnp

    out = fn(q)
    assert np.isfinite(float(out)), f"{label}: non-finite"
    for _ in range(prime):
        float(fn(q))
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(n_rep):
        acc += float(fn(q))
    dt = (time.perf_counter() - t0) / n_rep
    tf = flops / dt / 1e12
    print(f"{label:48s} {dt * 1e3:8.2f} ms  {tf:6.2f} TF/s", flush=True)
    return tf


def run(seqs, do_bwd, b=4, h=16, dh=64, k=8):
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    def make_cfg(bq, bk, bb=1):
        return BlockSizes(
            block_q=bq, block_k_major=bk, block_k=bk, block_b=bb,
            block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk,
            block_q_dkv=bq, block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
        )

    def xla_attn(q, kk, v):
        e = jnp.einsum("bhid,bhjd->bhij", q, kk) * (dh**-0.5)
        a = jax.nn.softmax(e, axis=-1)
        return jnp.einsum("bhij,bhjd->bhid", a, v)

    results = {}
    for n in seqs:
        q = jnp.asarray(np.random.default_rng(0).standard_normal(
            (b, h, n, dh)), jnp.bfloat16)
        flops_f = 4 * b * h * n * n * dh * k

        variants = [("xla", None, xla_attn)]
        for bq, bk in ((128, 128), (256, 256), (512, 512), (512, 1024),
                       (1024, 512), (1024, 1024), (2048, 1024)):
            if bq > n or bk > n:
                continue
            cfg = make_cfg(bq, bk)
            variants.append((
                f"flash q{bq} k{bk}", cfg,
                lambda q_, k_, v_, c=cfg: flash_attention(
                    q_, k_, v_, sm_scale=dh**-0.5, block_sizes=c),
            ))
        # block_b > 1: batch-tiled grid (fewer, fatter grid steps)
        if n >= 512 and b >= 2:
            cfg_b = make_cfg(512, 512, bb=2)
            variants.append((
                "flash q512 k512 b2", cfg_b,
                lambda q_, k_, v_, c=cfg_b: flash_attention(
                    q_, k_, v_, sm_scale=dh**-0.5, block_sizes=c),
            ))

        for name, _cfg, f in variants:
            @jax.jit
            def fwd(q, f=f):
                def body(c, _):
                    o = f(c, c, c)
                    return o * jnp.asarray(0.5, o.dtype) + c * 0.5, None
                c, _ = jax.lax.scan(body, q, None, length=k)
                return c.astype(jnp.float32).mean()

            label = f"attn fwd n={n} {name}"
            try:
                tf = _bench_chain(fwd, q, flops_f, label=label)
                results[label] = tf
            except Exception as e:  # noqa: BLE001 — Mosaic layout/OOM per cfg
                print(f"{label:48s} FAILED: {str(e)[:90]}", flush=True)

            if not do_bwd:
                continue

            @jax.jit
            def fwdbwd(q, f=f):
                def body(c, _):
                    g = jax.grad(lambda x: (
                        f(x, x, x).astype(jnp.float32) ** 2).mean())(c)
                    return c - g.astype(c.dtype), None
                c, _ = jax.lax.scan(body, q, None, length=k)
                return c.astype(jnp.float32).mean()

            label = f"attn f+b n={n} {name}"
            try:
                tf = _bench_chain(fwdbwd, q, 3 * flops_f, label=label)
                results[label] = tf
            except Exception as e:  # noqa: BLE001
                print(f"{label:48s} FAILED: {str(e)[:90]}", flush=True)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqs", type=int, nargs="+", default=[2048, 4096, 8192])
    ap.add_argument("--bwd", action="store_true")
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    import os

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/jatts_tpu/xla"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    run(args.seqs, args.bwd, b=args.batch)


if __name__ == "__main__":
    main()
