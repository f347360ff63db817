#!/usr/bin/env python3
"""Bisect the flagship (VALL-E AR) train-step time on the real chip.

Question under test: every train step in BENCH saturates at ~7-8 effective
TFLOP/s (FS2 2.1%, VALL-E/E2-TTS 1.8% MFU) while chained big matmuls were
calibrated at ~170 TFLOP/s sustained — is the gap (a) measurement
contamination from the per-dispatch tunnel ramp-up, (b) a hardware/tunnel
ceiling on real programs, or (c) something pathological in our step programs?

Stages:
  ceiling    — chained 4096^3 bf16 matmuls (sustained-TFLOPs calibration)
  skeleton   — 12-layer matmul-only transformer at VALL-E shapes, fwd+bwd+sgd
  valle, K sweep — the real trainer step at K=5 vs K=20 steps/dispatch with
               extra priming: if ms/step drops with K, the K=5 numbers were
               ramp-contaminated, not device time

Run: python benchmarks/bench_flagship_profile.py [stage ...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

PEAK = 394e12  # v5e-1 bf16 peak (CLAUDE.md)


def _bench_scanned(fn, args, flops_per_iter, k, n_rep=3, prime=3, label=""):
    """fn(args) -> array; fn internally scans k iterations chained by data
    dependency. Times n_rep dispatches after `prime` untimed ones; barrier =
    scalar host fetch."""
    out = None
    for _ in range(prime):
        out = fn(*args)
        _ = float(out.sum())  # full completion barrier through the tunnel
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = fn(*args)
    barrier = float(out.sum())
    dt = (time.perf_counter() - t0) / (n_rep * k)
    tflops = flops_per_iter / dt / 1e12
    print(f"{label}: {dt * 1e3:.1f} ms/iter, {tflops:.1f} TFLOP/s "
          f"({100 * tflops * 1e12 / PEAK:.1f}% of 394 peak)  [barrier {barrier:.3g}]")
    return dt


def ceiling(n=4096, k=32):
    """Sustained bf16 matmul throughput: x <- x @ w chained k times."""
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(np.random.randn(n, n), jnp.bfloat16)
    w = jnp.asarray(np.random.randn(n, n) / np.sqrt(n), jnp.bfloat16)

    @jax.jit
    def run(x, w):
        def body(c, _):
            c = jnp.dot(c, w)
            # keep magnitudes bounded so the chain never overflows
            return c * jnp.asarray(0.99, c.dtype), None
        c, _ = jax.lax.scan(body, x, None, length=k)
        return c.astype(jnp.float32).mean()[None]

    _bench_scanned(run, (x, w), 2 * n**3, k, label=f"ceiling matmul {n}^3")


def skeleton(b=32, s=896, d=1024, layers=12, k=5):
    """Matmul-only 12-layer 'transformer' (qkv, attn-shaped batched matmuls,
    out, ffn x4) at VALL-E recipe shapes — fwd+bwd+sgd, no norm/dropout/mask.
    This is the shape-for-shape MXU ceiling for the real model."""
    import jax
    import jax.numpy as jnp

    h = 16
    dh = d // h
    params = {
        f"l{i}": {
            "qkv": jnp.asarray(np.random.randn(d, 3 * d) / np.sqrt(d), jnp.bfloat16),
            "out": jnp.asarray(np.random.randn(d, d) / np.sqrt(d), jnp.bfloat16),
            "fi": jnp.asarray(np.random.randn(d, 4 * d) / np.sqrt(d), jnp.bfloat16),
            "fo": jnp.asarray(np.random.randn(4 * d, d) / (2 * np.sqrt(d)), jnp.bfloat16),
        }
        for i in range(layers)
    }
    x = jnp.asarray(np.random.randn(b, s, d), jnp.bfloat16)

    def fwd(params, x):
        for i in range(layers):
            p = params[f"l{i}"]
            qkv = x @ p["qkv"]
            q, kk, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(b, s, h, dh).transpose(0, 2, 1, 3)
            kk = kk.reshape(b, s, h, dh).transpose(0, 2, 1, 3)
            v = v.reshape(b, s, h, dh).transpose(0, 2, 1, 3)
            e = jnp.einsum("bhid,bhjd->bhij", q, kk) * (dh**-0.5)
            a = jax.nn.softmax(e, axis=-1)
            o = jnp.einsum("bhij,bhjd->bhid", a, v)
            o = o.transpose(0, 2, 1, 3).reshape(b, s, d)
            x = x + o @ p["out"]
            x = x + jax.nn.gelu(x @ p["fi"]) @ p["fo"]
        return x

    @jax.jit
    def run(params, x):
        def body(c, _):
            params, x = c

            def loss_fn(p):
                return (fwd(p, x).astype(jnp.float32) ** 2).mean()

            g = jax.grad(loss_fn)(params)
            params = jax.tree_util.tree_map(
                lambda p, g: p - jnp.asarray(1e-6, p.dtype) * g, params, g
            )
            return (params, x), None

        (params, _), _ = jax.lax.scan(body, (params, x), None, length=k)
        return params["l0"]["qkv"].astype(jnp.float32).mean()[None]

    # fwd+bwd matmul FLOPs = 3x fwd; fwd = B*S*(2d*3d + 2d*d + 2*2*S*dh*h + 16d^2)
    per_layer = 2 * b * s * (3 * d * d + d * d + 8 * d * d) + 4 * b * h * s * s * dh
    flops = 3 * per_layer * layers
    _bench_scanned(run, (params, x), flops, k,
                   label=f"skeleton B{b} S{s} d{d} L{layers}")


def valle_k(k, b=32, prime=4, n_rep=2, **kw):
    """The real trainer step with extra priming at K steps/dispatch."""
    from benchmarks.bench_train_mfu import run_valle

    # patch the module-level bench to vary priming
    import benchmarks.bench_train_mfu as m

    orig = m._run_trainer_bench

    def patched(model, loss_fn, kwargs_fn, batch, kk, dtype_name, **kwargs):
        kwargs["n_rep"] = n_rep
        kwargs["prime"] = prime
        return orig(model, loss_fn, kwargs_fn, batch, kk, dtype_name, **kwargs)

    m._run_trainer_bench = patched
    try:
        ms, mfu = run_valle(b=b, k=k, **kw)
    finally:
        m._run_trainer_bench = orig
    return ms, mfu


def main():
    stages = sys.argv[1:] or ["ceiling", "skeleton", "valle_k5", "valle_k20"]
    for st in stages:
        if st == "ceiling":
            ceiling()
        elif st == "skeleton":
            skeleton()
        elif st.startswith("valle_k"):
            valle_k(int(st[len("valle_k"):]))
        else:
            print(f"unknown stage {st}")


if __name__ == "__main__":
    main()
