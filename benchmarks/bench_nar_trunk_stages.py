#!/usr/bin/env python3
"""Decompose ONE NAR trunk pass at serving shapes (B=32, S=547).

Single-dispatch timings through the tunnel carry O(100 ms)/call overhead
(CLAUDE.md), so each stage is measured as a MARGINAL cost: an on-device
``lax.scan`` repeats the stage K1 and K2 times (chained by data
dependency) and the per-repeat cost is (t_K2 - t_K1) / (K2 - K1) — the
dispatch overhead and any loop-invariant hoisting cancel.

Stages:
  - embed:   text_emb + 2x multi_embed + pack_three + sin PE + cast
             (codes perturbed per repeat so nothing hoists)
  - blocks:  the 12 VALLEBlocks on a packed bf16 input, S in {547, 512, 640}
  - head:    resp-row gather + classifier + categorical (the glue)

Run: python benchmarks/bench_nar_trunk_stages.py [B]
"""

import os
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

    from jatts_tpu.models.valle import VALLENAR, pack_three
    from jatts_tpu.ops.masks import sequence_mask

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
    codes = jnp.zeros((b, tr, 8), jnp.int32).at[:, :, 0].set(level0)
    s = tx + 1 + tp + 1 + tr
    d = 1024
    K1, K2 = 2, 8

    def marginal(mk_repeat, label):
        ts = {}
        for k in (K1, K2):
            jf = jax.jit(mk_repeat(k))
            ts[k] = _time(lambda sd, jf=jf: jf(v, sd))
        per = (ts[K2] - ts[K1]) / (K2 - K1)
        print(f"B={b} {label}: {per * 1e3:7.1f} ms/rep "
              f"(K{K1}={ts[K1]*1e3:.0f} ms, K{K2}={ts[K2]*1e3:.0f} ms)",
              flush=True)
        return per

    # ---- embed+pack stage --------------------------------------------
    def embed_once(mdl, codes):
        q = jnp.full((b,), 3, jnp.int32)
        e_text = mdl.text_emb(text)
        e_prom = mdl._multi_embed(
            mdl.proms_weight, proms, jnp.full((b,), proms.shape[-1])
        )
        e_resp = mdl._multi_embed(mdl.resps_weight, codes, q + 1)
        x, total = pack_three(
            e_text, text_lens, e_prom, prom_lens, e_resp, resp_lens,
            mdl.sep.astype(e_text.dtype),
        )
        return mdl.sin_emb(x).astype(mdl.dtype)

    def mk_embed(k):
        def run(v, seed):
            def body(c, _):
                cd, acc = c
                x = model.apply(v, cd, method=embed_once)
                bump = (x.sum() * 0).astype(jnp.int32)
                return ((cd + bump) % 1024, acc + x.sum()), None

            (_, acc), _ = jax.lax.scan(
                body, (codes + seed % 2, jnp.bfloat16(0)), None, length=k)
            return acc
        return run

    marginal(mk_embed, "embed ")

    # ---- blocks stage (shape-preserving: chain x -> blocks(x)) --------
    total = text_lens + prom_lens + resp_lens + 2

    def mk_blocks(s_run):
        x0 = jnp.asarray(
            np.random.default_rng(1).normal(size=(b, s_run, d)), jnp.bfloat16)

        def blocks_once(mdl, x):
            q = jnp.full((b,), 3, jnp.int32)
            m = sequence_mask(total, x.shape[1], x.dtype)[..., None]
            for block in mdl.blocks:
                x = block(x, m, q, True)
            return x

        def mk(k):
            def run(v, seed):
                def body(x, _):
                    x = model.apply(v, x, method=blocks_once)
                    return x * jnp.bfloat16(0.05), None

                x, _ = jax.lax.scan(
                    body, x0 + jnp.bfloat16(seed % 2), None, length=k)
                return x.sum()
            return run
        return mk

    for s_run in (s, 512, 640):
        marginal(mk_blocks(s_run), f"blk{s_run}")

    # ---- flash-backend blocks: the materialized [B,H,S,S] score tensors
    # are ~30 ms of the 70 ms XLA block cost at S=547 (25 GB/pass HBM);
    # the forward-only Pallas kernel never materializes them. S=640
    # (the %128 the trunk pads to), ragged valid mask as in serving.
    model_f = VALLENAR(idim=0, n_tokens=1024, d_model=1024, n_heads=16,
                       n_layers=12, dtype=jnp.bfloat16, attn_backend="flash")

    def mk_blocks_flash(s_run):
        x0 = jnp.asarray(
            np.random.default_rng(1).normal(size=(b, s_run, d)), jnp.bfloat16)

        def blocks_once(mdl, x):
            q = jnp.full((b,), 3, jnp.int32)
            m = sequence_mask(total, x.shape[1], x.dtype)[..., None]
            for block in mdl.blocks:
                x = block(x, m, q, True)
            return x

        def mk(k):
            def run(v, seed):
                def body(x, _):
                    x = model_f.apply(v, x, method=blocks_once)
                    return x * jnp.bfloat16(0.05), None

                x, _ = jax.lax.scan(
                    body, x0 + jnp.bfloat16(seed % 2), None, length=k)
                return x.sum()
            return run
        return mk

    marginal(mk_blocks_flash(640), "blk640-flash")

    # ---- head (gather + classifier + sample) stage --------------------
    x0 = jnp.asarray(rng.normal(size=(b, s, d)), jnp.bfloat16)

    def head_once(mdl, hidden, r):
        start = (text_lens + prom_lens + 2)[:, None]
        pos = jnp.clip(jnp.arange(tr)[None, :] + start, 0, s - 1)
        resp_h = jnp.take_along_axis(hidden, pos[..., None], axis=1)
        valid = (jnp.arange(tr)[None, :] < resp_lens[:, None])[..., None]
        logits = (mdl.classifier(resp_h) * valid.astype(resp_h.dtype)
                  ).astype(jnp.float32)
        return jax.random.categorical(r, logits / 0.2, axis=-1)

    def mk_head(k):
        def run(v, seed):
            rs = jax.random.split(jax.random.PRNGKey(seed), k)

            def body(acc, r):
                toks = model.apply(v, x0 + acc * jnp.bfloat16(0), r,
                                   method=head_once)
                return acc + toks.sum().astype(jnp.bfloat16), None

            acc, _ = jax.lax.scan(body, jnp.bfloat16(0), rs)
            return acc
        return run

    marginal(mk_head, "head  ")


if __name__ == "__main__":
    import jax

    if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser("~/.cache/jatts_tpu/xla"),
        )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
