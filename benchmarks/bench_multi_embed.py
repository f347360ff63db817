#!/usr/bin/env python3
"""VALL-E multi-level embedding lever (VERDICT r3 item 4a).

`VALLEBase._multi_embed` gathers a [B, T, L, D] stack then contracts it
with the per-batch level-mask (`einsum('btld,bl->btd')`). At recipe shapes
(B=16, T~856 packed, L=8, D=1024, f32 embeddings) that intermediate is
~450 MB of HBM write+read per call — docs/perf_valle_step.md attributes
~10 ms/step to it. Candidates timed here, fwd and fwd+bwd (the train path
— the gather's transpose is a scatter-add over the embedding table):

  take+einsum   the shipped path
  masked-sum    point inactive levels at an appended zero row, then
                plain .sum(2) — gives XLA a gather->reduce to fuse with
                no mask multiply on the [B,T,L,D] operand
  level-loop    L separate [B,T,D] gathers accumulated in f32 — never
                materializes the L axis (at the cost of L gather launches)

All on device via lax.scan chains with scalar host-fetch barriers.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def run(b=16, t=856, l_levels=8, v=1026, d=1024, k=8, n_rep=3):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    weight = jnp.asarray(rng.standard_normal((l_levels, v, d)).astype(np.float32))
    codes = jnp.asarray(rng.integers(0, v, (b, t, l_levels)).astype(np.int32))
    n_active = jnp.asarray(rng.integers(1, l_levels + 1, (b,)).astype(np.int32))

    flat = weight.reshape(l_levels * v, d)
    idx = codes.astype(jnp.int32) + (jnp.arange(l_levels) * v)[None, None, :]
    active = (jnp.arange(l_levels)[None, :] < n_active[:, None])

    def take_einsum(flat, idx):
        emb = jnp.take(flat, idx, axis=0)  # [B, T, L, D]
        return jnp.einsum("btld,bl->btd", emb, active.astype(emb.dtype))

    zero_row = l_levels * v  # one appended zero row
    flat_z = jnp.concatenate([flat, jnp.zeros((1, d), flat.dtype)])
    idx_masked = jnp.where(active[:, None, :], idx, zero_row)

    def masked_sum(flat_z, idx_masked):
        return jnp.take(flat_z, idx_masked, axis=0).sum(2)

    def level_loop(flat, idx):
        out = jnp.zeros((b, t, d), jnp.float32)
        for li in range(l_levels):
            g = jnp.take(flat, idx[:, :, li], axis=0)
            out = out + g * active[:, li, None, None].astype(g.dtype)
        return out

    # parity first
    ref = np.asarray(jax.jit(take_einsum)(flat, idx))
    for name, f, a in (("masked-sum", masked_sum, (flat_z, idx_masked)),
                       ("level-loop", level_loop, (flat, idx))):
        got = np.asarray(jax.jit(f)(*a))
        err = np.abs(got - ref).max()
        assert err < 1e-4, f"{name} mismatch {err}"

    def bench(name, f, table, indices, bwd):
        @jax.jit
        def prog(table, chain):
            def body(c, _):
                if bwd:
                    g = jax.grad(lambda w: (f(w, indices) ** 2).mean())(c)
                    return c - g * 1e-9, None
                o = f(c, indices)
                # fold the output back into the table so iterations chain
                upd = o.mean() * 1e-9
                return c + upd.astype(c.dtype), None
            c, _ = jax.lax.scan(body, table + chain, None, length=k)
            return c.sum()

        z = jnp.zeros((), jnp.float32)
        float(prog(table, z))
        for _ in range(2):
            float(prog(table, z))
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(n_rep):
            acc += float(prog(table, z))
        dt = (time.perf_counter() - t0) / n_rep / k
        tag = "f+b" if bwd else "fwd"
        print(f"multi_embed {tag} {name:12s} {dt * 1e3:7.2f} ms/call", flush=True)
        return dt

    out = {}
    for bwd in (False, True):
        out[("take+einsum", bwd)] = bench("take+einsum", take_einsum, flat, idx, bwd)
        out[("masked-sum", bwd)] = bench("masked-sum", masked_sum, flat_z,
                                         idx_masked, bwd)
        out[("level-loop", bwd)] = bench("level-loop", level_loop, flat, idx, bwd)
    return out


def main():
    import os

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jatts_tpu/xla")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    run()


if __name__ == "__main__":
    main()
