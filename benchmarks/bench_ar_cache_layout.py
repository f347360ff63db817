"""Isolate the VALL-E AR decode KV-cache update cost: per-row scatter vs
uniform-slot dynamic_update_slice vs split prefix/decode caches.

Round-3/4 measurements put the AR scan at 5.8 ms/step (B=32, 12L/1024d,
S_cap=547) against an HBM roofline of ~1.4 ms/step (300 MB weights +
857 MB KV read per step at 819 GB/s on v5e). Hypothesis: the per-row
``write_pos`` cache update (vmapped dynamic_update_slice == scatter with
batched start indices) defeats XLA's in-place aliasing of the scan carry,
so every step pays a full cache copy (R+W) on top of the attention read.

Three layouts, same attention math, jitted scan over ``steps`` iterations:

  scatter   — current ``decode_step``: [B, S, H, Dh] caches in the carry,
              per-row write position (rows have different prefix lengths).
  uniform   — same monolithic caches, but every row writes the SAME slot
              (prefix padded to capacity; mask hides the gap). The update
              is a plain dynamic_update_slice -> alias-friendly.
  split     — prefix caches constant OUTSIDE the carry (scan closure);
              carry holds only the [B, steps, H, Dh] decode-region caches,
              written at the uniform slot; attention concatenates both
              regions' scores.

All variants time pure cache+attention traffic (to_qkv/FFN matmuls are
identical across layouts and excluded) so the delta is the cache-update
mechanism itself. Host-fetch barrier; chained by data dependency.

Usage: python benchmarks/bench_ar_cache_layout.py [--b 32] [--layers 12]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def _enable_compile_cache():
    import os

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/jatts_tpu/xla"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def run(b=32, layers=12, heads=16, dh=64, prefix=291, steps=256, dtype="bfloat16"):
    import jax
    import jax.numpy as jnp

    dt = jnp.dtype(dtype)
    s_cap = prefix + steps
    rng = np.random.default_rng(0)
    # per-row prefix lengths (ragged, like real text+prom packing)
    plens = jnp.asarray(rng.integers(prefix // 2, prefix + 1, (b,)).astype(np.int32))

    def mk_caches(shape):
        return [
            (jnp.asarray(rng.normal(size=shape).astype(np.float32)).astype(dt),
             jnp.asarray(rng.normal(size=shape).astype(np.float32)).astype(dt))
            for _ in range(layers)
        ]

    q0 = jnp.asarray(rng.normal(size=(b, heads, dh)).astype(np.float32)).astype(dt)
    scale = dh**-0.5

    def attend(q, k_all, v_all, valid):
        e = jnp.einsum("bhd,bjhd->bhj", q, k_all) * scale
        e = jnp.where(valid[:, None, :], e, -1e9)
        a = jax.nn.softmax(e, axis=-1)
        return jnp.einsum("bhj,bjhd->bhd", a, v_all)

    # ---- layout 1: monolithic caches, per-row scatter (current decode_step)
    def scatter_step(carry, i):
        q, caches = carry
        pos = plens + i  # per-row absolute slot
        upd = jax.vmap(
            lambda c, x, p: jax.lax.dynamic_update_slice(c, x[None], (p, 0, 0))
        )
        new = []
        o_acc = q
        for (ck, cv) in caches:
            kv = o_acc[:, :, :]  # data-dependent new K/V stand-in
            ck = upd(ck, kv, pos)
            cv = upd(cv, kv, pos)
            valid = jnp.arange(s_cap)[None, :] <= pos[:, None]
            o_acc = attend(o_acc, ck, cv, valid)
            new.append((ck, cv))
        return (o_acc, new), ()

    # ---- layout 2: monolithic caches, uniform slot (prefix padded to cap)
    def uniform_step(carry, i):
        q, caches = carry
        slot = prefix + i  # SAME for every row
        new = []
        o_acc = q
        prefix_valid = jnp.arange(s_cap)[None, :] < plens[:, None]
        for (ck, cv) in caches:
            kv = o_acc[:, None, :, :]
            ck = jax.lax.dynamic_update_slice(ck, kv, (0, slot, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, kv, (0, slot, 0, 0))
            dec_valid = (jnp.arange(s_cap)[None, :] >= prefix) & (
                jnp.arange(s_cap)[None, :] <= slot
            )
            valid = prefix_valid | dec_valid
            o_acc = attend(o_acc, ck, cv, valid)
            new.append((ck, cv))
        return (o_acc, new), ()

    # ---- layout 2b: uniform slot, caches stored [B, H, S, Dh] — the
    # attention GEMV then reads each head's [S, Dh] panel contiguously
    # instead of striding across heads
    def uniform_bhsd_step(carry, i):
        q, caches = carry
        slot = prefix + i
        new = []
        o_acc = q
        prefix_valid = jnp.arange(s_cap)[None, :] < plens[:, None]
        for (ck, cv) in caches:  # [B, H, S, Dh]
            kv = o_acc[:, :, None, :]  # [B, H, 1, Dh]
            ck = jax.lax.dynamic_update_slice(ck, kv, (0, 0, slot, 0))
            cv = jax.lax.dynamic_update_slice(cv, kv, (0, 0, slot, 0))
            dec_valid = (jnp.arange(s_cap)[None, :] >= prefix) & (
                jnp.arange(s_cap)[None, :] <= slot
            )
            valid = prefix_valid | dec_valid
            e = jnp.einsum("bhd,bhjd->bhj", o_acc, ck) * scale
            e = jnp.where(valid[:, None, :], e, -1e9)
            a = jax.nn.softmax(e, axis=-1)
            o_acc = jnp.einsum("bhj,bhjd->bhd", a, cv)
            new.append((ck, cv))
        return (o_acc, new), ()

    # ---- layout 2c: uniform slot, caches stored FOLDED [B, S, H*Dh] —
    # a [.., H, Dh=64] minormost cache gets lane-padded 64->128 in TPU
    # layout, physically DOUBLING the HBM bytes behind every KV read; a
    # [.., H*Dh] minormost buffer is dense, and the head split happens in
    # the fused operand read of the einsum
    def uniform_fold_step(carry, i):
        q, caches = carry
        slot = prefix + i
        new = []
        o_acc = q
        prefix_valid = jnp.arange(s_cap)[None, :] < plens[:, None]
        for (ck, cv) in caches:  # [B, S, H*Dh]
            kv = o_acc.reshape(b, 1, heads * dh)
            ck = jax.lax.dynamic_update_slice(ck, kv, (0, slot, 0))
            cv = jax.lax.dynamic_update_slice(cv, kv, (0, slot, 0))
            dec_valid = (jnp.arange(s_cap)[None, :] >= prefix) & (
                jnp.arange(s_cap)[None, :] <= slot
            )
            valid = prefix_valid | dec_valid
            k4 = ck.reshape(b, s_cap, heads, dh)
            v4 = cv.reshape(b, s_cap, heads, dh)
            o_acc = attend(o_acc, k4, v4, valid)
            new.append((ck, cv))
        return (o_acc, new), ()

    # ---- layout 3: split caches — prefix constant, decode region in carry.
    # The prefix caches MUST enter via jit arguments, not closure: closed-over
    # arrays become HLO constants (457 MB here), which 413s the remote-compile
    # relay — the same defect round 4 fixed in serving (weights_as_args).
    def split_step_of(prefix_caches):
        def split_step(carry, i):
            q, dcaches = carry
            new = []
            o_acc = q
            pvalid = jnp.arange(prefix)[None, :] < plens[:, None]
            dvalid = jnp.broadcast_to(
                jnp.arange(steps)[None, :] <= i, (b, steps)
            )
            for (pk, pv), (dk, dv) in zip(prefix_caches, dcaches):
                kv = o_acc[:, None, :, :]
                dk = jax.lax.dynamic_update_slice(dk, kv, (0, i, 0, 0))
                dv = jax.lax.dynamic_update_slice(dv, kv, (0, i, 0, 0))
                k_all = jnp.concatenate([pk, dk], axis=1)
                v_all = jnp.concatenate([pv, dv], axis=1)
                valid = jnp.concatenate([pvalid, dvalid], axis=1)
                o_acc = attend(o_acc, k_all, v_all, valid)
                new.append((dk, dv))
            return (o_acc, new), ()

        return split_step

    # ---- layout 0: attention ONLY — caches enter as jit args and are never
    # written; isolates the pure KV read bandwidth of the attend pattern from
    # whatever the scan carry costs (copy-on-update, double-buffering)
    def attn_only_of(caches):
        def attn_only_step(carry, i):
            o_acc, _ = carry
            valid = jnp.arange(s_cap)[None, :] <= (plens[:, None] + i)
            for (ck, cv) in caches:
                o_acc = attend(o_acc, ck, cv, valid)
            return (o_acc, ()), ()

        return attn_only_step

    # ---- layout 3b: split WITHOUT concat — prefix caches via jit args
    # (never copied), decode-region caches in the carry; the softmax merges
    # the two regions' SCORES (tiny [B,H,S] concat) instead of materializing
    # a concatenated [B,S,H,Dh] cache (which is what sank layout 3). The
    # per-step carry copy shrinks from the full capacity to the decode
    # region only.
    def split2_of(prefix_caches):
        def split2_step(carry, i):
            q, dcaches = carry
            new = []
            o_acc = q
            pvalid = jnp.arange(prefix)[None, :] < plens[:, None]
            dvalid = jnp.broadcast_to(
                jnp.arange(steps)[None, :] <= i, (b, steps)
            )
            for (pk, pv), (dk, dv) in zip(prefix_caches, dcaches):
                kv = o_acc[:, None, :, :]
                dk = jax.lax.dynamic_update_slice(dk, kv, (0, i, 0, 0))
                dv = jax.lax.dynamic_update_slice(dv, kv, (0, i, 0, 0))
                ep = jnp.einsum("bhd,bjhd->bhj", o_acc, pk) * scale
                ep = jnp.where(pvalid[:, None, :], ep, -1e9)
                ed = jnp.einsum("bhd,bjhd->bhj", o_acc, dk) * scale
                ed = jnp.where(dvalid[:, None, :], ed, -1e9)
                a = jax.nn.softmax(jnp.concatenate([ep, ed], axis=-1), axis=-1)
                o_acc = jnp.einsum(
                    "bhj,bjhd->bhd", a[..., :prefix], pv
                ) + jnp.einsum("bhj,bjhd->bhd", a[..., prefix:], dv)
                new.append((dk, dv))
            return (o_acc, new), ()

        return split2_step

    results = {}

    def bench(name, make_fn, init_carry, aux, n_timed=3):
        stepped = jax.jit(
            lambda c, a: jax.lax.scan(
                make_fn(a), c, jnp.arange(steps, dtype=jnp.int32)
            )[0][0]
        )
        out = stepped(init_carry, aux)
        float(out.sum())  # compile + barrier
        # prime the chained-dispatch path (first dispatches pay ramp-up)
        for _ in range(2):
            out = stepped((init_carry[0] + (out.sum() * 0).astype(dt),
                           init_carry[1]), aux)
        float(out.sum())
        t0 = time.perf_counter()
        acc = out
        for _ in range(n_timed):
            acc = stepped((init_carry[0] + (acc.sum() * 0).astype(dt),
                           init_carry[1]), aux)
        float(acc.sum())
        dt_s = (time.perf_counter() - t0) / n_timed
        ms_per_step = dt_s / steps * 1e3
        results[name] = ms_per_step
        print(f"{name:10s}: {ms_per_step:7.3f} ms/step "
              f"({dt_s * 1e3:8.1f} ms / {steps} steps)", flush=True)
        return ms_per_step

    # ---- layout 4: CHUNKED decode carry — trace-time-unrolled outer loop
    # over chunks; each inner scan carries only a [B, chunk] cache and
    # closes over the prefix + all COMPLETED chunks as invariants. Shrinks
    # the per-step carry copy to the chunk AND reads only materialized
    # regions (later chunks read more; early chunks read less).
    def bench_chunked(pfx, chunk, n_timed=3):
        n_chunks = steps // chunk

        def full(q, pfx):
            pvalid = jnp.arange(prefix)[None, :] < plens[:, None]
            done = [[] for _ in range(layers)]  # [(k, v), ...] per layer

            for _c in range(n_chunks):
                dck = tuple(
                    (jnp.zeros((b, chunk, heads, dh), dt),
                     jnp.zeros((b, chunk, heads, dh), dt))
                    for _ in range(layers)
                )

                def step(carry, i, done=tuple(tuple(d) for d in done)):
                    o_acc, dc = carry
                    dvalid = jnp.broadcast_to(
                        jnp.arange(chunk)[None, :] <= i, (b, chunk)
                    )
                    new_dc = []
                    for li in range(layers):
                        pk, pv = pfx[li]
                        dk, dv = dc[li]
                        kv = o_acc[:, None, :, :]
                        dk = jax.lax.dynamic_update_slice(dk, kv, (0, i, 0, 0))
                        dv = jax.lax.dynamic_update_slice(dv, kv, (0, i, 0, 0))
                        ep = jnp.einsum("bhd,bjhd->bhj", o_acc, pk) * scale
                        es = [jnp.where(pvalid[:, None, :], ep, -1e9)]
                        vs = [pv]
                        for (fk, fv) in done[li]:
                            es.append(
                                jnp.einsum("bhd,bjhd->bhj", o_acc, fk) * scale
                            )
                            vs.append(fv)
                        ed = jnp.einsum("bhd,bjhd->bhj", o_acc, dk) * scale
                        es.append(jnp.where(dvalid[:, None, :], ed, -1e9))
                        vs.append(dv)
                        a = jax.nn.softmax(jnp.concatenate(es, axis=-1), axis=-1)
                        o_new = jnp.zeros_like(o_acc)
                        off = 0
                        for blk_v in vs:
                            w = blk_v.shape[1]
                            o_new = o_new + jnp.einsum(
                                "bhj,bjhd->bhd", a[..., off:off + w], blk_v
                            )
                            off += w
                        o_acc = o_new
                        new_dc.append((dk, dv))
                    return (o_acc, tuple(new_dc)), ()

                (q, dc_fin), _ = jax.lax.scan(
                    step, (q, dck), jnp.arange(chunk, dtype=jnp.int32)
                )
                for li in range(layers):
                    done[li].append(dc_fin[li])
            return q

        jfull = jax.jit(full)
        out = jfull(q0, pfx)
        float(out.sum())
        for _ in range(2):
            out = jfull(q0 + (out.sum() * 0).astype(dt), pfx)
        float(out.sum())
        t0 = time.perf_counter()
        acc = out
        for _ in range(n_timed):
            acc = jfull(q0 + (acc.sum() * 0).astype(dt), pfx)
        float(acc.sum())
        dt_s = (time.perf_counter() - t0) / n_timed
        ms_per_step = dt_s / steps * 1e3
        results[f"chunk{chunk}"] = ms_per_step
        print(f"chunk{chunk:<5d}: {ms_per_step:7.3f} ms/step "
              f"({dt_s * 1e3:8.1f} ms / {steps} steps)", flush=True)

    mono = mk_caches((b, s_cap, heads, dh))
    bench("attn_only", attn_only_of, (q0, ()), mono)
    bench("scatter", lambda _: scatter_step, (q0, mono), ())
    bench("uniform", lambda _: uniform_step, (q0, mono), ())
    mono_bhsd = [(jnp.moveaxis(k, 1, 2), jnp.moveaxis(v, 1, 2)) for k, v in mono]
    bench("uni_bhsd", lambda _: uniform_bhsd_step, (q0, mono_bhsd), ())
    mono_fold = [
        (k.reshape(b, s_cap, heads * dh), v.reshape(b, s_cap, heads * dh))
        for k, v in mono
    ]
    bench("uni_fold", lambda _: uniform_fold_step, (q0, mono_fold), ())
    pfx = mk_caches((b, prefix, heads, dh))
    dec = [
        (jnp.zeros((b, steps, heads, dh), dt), jnp.zeros((b, steps, heads, dh), dt))
        for _ in range(layers)
    ]
    bench("split", split_step_of, (q0, dec), pfx)
    bench("split2", split2_of, (q0, dec), pfx)
    bench_chunked(pfx, max(steps // 4, 1))
    bench_chunked(pfx, max(steps // 8, 1))

    kv_bytes = b * s_cap * heads * dh * dt.itemsize * 2 * layers
    print(f"# KV read/step (monolithic): {kv_bytes / 1e6:.0f} MB "
          f"-> roofline {kv_bytes / 819e9 * 1e3:.3f} ms/step at 819 GB/s")
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=32)
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--dh", type=int, default=64)
    ap.add_argument("--prefix", type=int, default=291)
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--cpu", action="store_true", help="CPU smoke")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    _enable_compile_cache()
    run(b=args.b, layers=args.layers, heads=args.heads, dh=args.dh,
        prefix=args.prefix, steps=args.steps)


if __name__ == "__main__":
    main()
