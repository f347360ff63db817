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

PEAK = 197e12  # v5e published bf16 peak/chip (394 is the INT8 TOPS figure
# rounds 1-2 mistakenly used — see benchmarks/bench_train_mfu.py)


def _bench_scanned(fn, args, flops_per_iter, k, n_rep=3, prime=3, label=""):
    """fn(*args, chain) -> scalar[1]; fn internally scans k iterations
    chained by data dependency AND must mix the `chain` scalar into its
    inputs, so successive dispatches are also data-dependent (CLAUDE.md
    benchmark rule: completion signals through the tunnel are unreliable, so
    only a dependency chain + final scalar host fetch times device work).
    Times n_rep dispatches after `prime` untimed ones."""
    import jax.numpy as jnp

    chain = jnp.zeros((1,), jnp.float32)
    for _ in range(prime):
        chain = fn(*args, chain)
        _ = float(chain.sum())  # full completion barrier through the tunnel
    t0 = time.perf_counter()
    for _ in range(n_rep):
        chain = fn(*args, chain)
    barrier = float(chain.sum())
    dt = (time.perf_counter() - t0) / (n_rep * k)
    tflops = flops_per_iter / dt / 1e12
    print(f"{label}: {dt * 1e3:.1f} ms/iter, {tflops:.1f} TFLOP/s "
          f"({100 * tflops * 1e12 / PEAK:.1f}% of 197 peak)  [barrier {barrier:.3g}]")
    return dt


def _mix(x, chain):
    """Data-dependency tap: numerically negligible (chain*1e-30 vs O(1)
    data) but not removable by the compiler (float 0*x folding is unsound,
    XLA keeps it)."""
    import jax.numpy as jnp

    return x + chain.astype(x.dtype)[0] * jnp.asarray(1e-30, x.dtype)


def _bench_sgd(label, init_params, loss_fn, extra_args, k, n_rep=2, prime=3):
    """Shared scan-SGD harness for the bisect ladders: k fwd+bwd+sgd steps
    per dispatch, XLA cost_analysis FLOPs (scan body counted once), chained
    dispatches via _bench_scanned's chain scalar."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(params, *args_chain):
        *args, chain = args_chain
        params = jax.tree_util.tree_map(lambda p: _mix(p, chain), params)

        def body(c, _):
            p = c
            g = jax.grad(loss_fn)(p, *args)
            p = jax.tree_util.tree_map(
                lambda a, b_: a - jnp.asarray(1e-6, a.dtype) * b_, p, g
            )
            return p, None

        p, _ = jax.lax.scan(body, params, None, length=k)
        leaf = jax.tree_util.tree_leaves(p)[0]
        return leaf.astype(jnp.float32).sum()[None]

    flops = None
    try:
        cost = run.lower(
            init_params, *extra_args, jnp.zeros((1,), jnp.float32)
        ).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        if cost and cost.get("flops"):
            flops = float(cost["flops"])  # scan body counted once
    except Exception as e:  # noqa: BLE001
        print(f"# cost_analysis failed: {str(e)[:100]}")
    _bench_scanned(run, (init_params, *extra_args), flops or 0.0, k,
                   n_rep=n_rep, prime=prime, label=label)


def ceiling(n=4096, k=32):
    """Sustained bf16 matmul throughput: x <- x @ w chained k times."""
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(np.random.randn(n, n), jnp.bfloat16)
    w = jnp.asarray(np.random.randn(n, n) / np.sqrt(n), jnp.bfloat16)

    @jax.jit
    def run(x, w, chain):
        def body(c, _):
            c = jnp.dot(c, w)
            # keep magnitudes bounded so the chain never overflows
            return c * jnp.asarray(0.99, c.dtype), None
        c, _ = jax.lax.scan(body, _mix(x, chain), None, length=k)
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
    def run(params, x, chain):
        def body(c, _):
            params, x = c

            def loss_fn(p):
                return (fwd(p, x).astype(jnp.float32) ** 2).mean()

            g = jax.grad(loss_fn)(params)
            params = jax.tree_util.tree_map(
                lambda p, g: p - jnp.asarray(1e-6, p.dtype) * g, params, g
            )
            return (params, x), None

        (params, _), _ = jax.lax.scan(
            body, (params, _mix(x, chain)), None, length=k
        )
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


def valle_bisect(b=16, s=896, d=1024, h=16, layers=12, k=5):
    """Decompose the VALL-E AR step's MFU gap vs its matmul skeleton.

    Ladder (all fwd+bwd+sgd, same scanned harness, XLA-counted FLOPs):
      skeleton    — matmul-only transformer (bench stage `skeleton` at B16)
      blocks      — real VALLEBlock stack (adds LN/bias/mask/softmax/dropout)
      blocks_nodrop — same with p_dropout=0 (isolates dropout)
      trunk       — full VALLEAR.trunk (adds embeds, pack gathers, classifier)
    Compare with the full trainer step (`valle_b16`: adds CE + AdamW + clip).
    """
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from jatts_tpu.models.valle import VALLEAR
    from jatts_tpu.modules.valle_modules import VALLEBlock

    rng = np.random.default_rng(0)
    drop_key = jax.random.key(1, impl="rbg")  # recipe rng_impl

    def bench_sgd(label, init_params, loss_fn, extra_args=()):
        _bench_sgd(label, init_params, loss_fn, extra_args, k)

    class BlocksOnly(nn.Module):
        p_drop: float = 0.1

        @nn.compact
        def __call__(self, x, m, deterministic=False):
            for i in range(layers):
                x = VALLEBlock(d, h, self.p_drop, True, "ln", 1,
                               attn_backend="xla", dtype=jnp.bfloat16,
                               name=f"b{i}")(x, m, None,
                                             deterministic=deterministic)
            return x

    x = jnp.asarray(rng.standard_normal((b, s, d)), jnp.bfloat16)
    m = jnp.ones((b, s, 1), jnp.bfloat16)
    for p_drop, label in ((0.1, "blocks"), (0.0, "blocks_nodrop")):
        mod = BlocksOnly(p_drop=p_drop)
        variables = mod.init({"params": jax.random.key(0), "dropout": drop_key},
                             x, m)

        def loss(params, x, m, mod=mod):
            out = mod.apply({"params": params}, x, m, deterministic=False,
                            rngs={"dropout": drop_key})
            return (out.astype(jnp.float32) ** 2).mean()

        bench_sgd(f"{label} B{b} S{s}", variables["params"], loss, (x, m))

    # full trunk: embeds + pack + blocks + classifier, mean-logits loss
    tx_n, tp_n, tr_n = 64, 225, 600
    model = VALLEAR(idim=0, n_tokens=1024, d_model=d, n_heads=h,
                    n_layers=layers, dtype=jnp.bfloat16)
    batch = dict(
        text=jnp.asarray(rng.integers(0, 1024, (b, tx_n)), jnp.int32),
        text_lens=jnp.full((b,), tx_n, jnp.int32),
        proms=jnp.asarray(rng.integers(0, 1024, (b, tp_n, 8)), jnp.int32),
        prom_lens=jnp.full((b,), tp_n, jnp.int32),
        resps=jnp.asarray(rng.integers(0, 1024, (b, tr_n)), jnp.int32),
        resp_lens=jnp.full((b,), tr_n, jnp.int32),
    )
    variables = model.init(
        {"params": jax.random.key(0), "dropout": drop_key},
        **batch, deterministic=True,
    )

    def loss_trunk(params, batch):
        logits, _ = model.apply(
            {"params": params}, batch["text"], batch["text_lens"],
            batch["proms"], batch["prom_lens"], batch["resps"][..., None],
            batch["resp_lens"], jnp.ones((b,), jnp.int32), None, False,
            method=VALLEAR.trunk, rngs={"dropout": drop_key},
        )
        return (logits ** 2).mean()

    bench_sgd(f"trunk B{b}", variables["params"], loss_trunk, (batch,))


def e2tts_bisect(b=8, n=1025, d=1024, layers=24, k=5):
    """Decompose the E2-TTS step's MFU gap vs its matmul skeleton.

    Ladder (all fwd+bwd+sgd, same scanned harness, XLA-counted FLOPs):
      skeleton_e2    — matmul-only UNetT-shaped flat transformer: separate
                       q/k/v, out, ffn x4, skip-concat Dense in the 2nd half
      backbone       — real UNetT fwd (RMSNorm, rope head, conv-pos, text
                       embed, CFG drops, dropout) with an MSE loss
      backbone_nodrop — same with dropout 0 (isolates dropout)
    Compare with the full trainer step (`bench_train_mfu.run_e2tts`: adds CFM
    noise/interp/masked-MSE + AdamW + clip); N=1025 = 1024 frames + time tok.
    """
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from jatts_tpu.modules.e2tts_backbone import UNetT

    rng = np.random.default_rng(0)
    drop_key = jax.random.key(1, impl="rbg")  # recipe rng_impl
    h_heads, dh = 16, 64

    def bench_sgd(label, init_params, loss_fn, extra_args=()):
        _bench_sgd(label, init_params, loss_fn, extra_args, k)

    # --- skeleton: matmuls only, UNetT topology (flat + skip concats) ---
    params = {}
    for i in range(layers):
        p = {
            "q": jnp.asarray(rng.standard_normal((d, d)) / np.sqrt(d), jnp.bfloat16),
            "k": jnp.asarray(rng.standard_normal((d, d)) / np.sqrt(d), jnp.bfloat16),
            "v": jnp.asarray(rng.standard_normal((d, d)) / np.sqrt(d), jnp.bfloat16),
            "out": jnp.asarray(rng.standard_normal((d, d)) / np.sqrt(d), jnp.bfloat16),
            "fi": jnp.asarray(rng.standard_normal((d, 4 * d)) / np.sqrt(d), jnp.bfloat16),
            "fo": jnp.asarray(rng.standard_normal((4 * d, d)) / (2 * np.sqrt(d)), jnp.bfloat16),
        }
        if i >= layers // 2:
            p["skip"] = jnp.asarray(
                rng.standard_normal((2 * d, d)) / np.sqrt(2 * d), jnp.bfloat16
            )
        params[f"l{i}"] = p
    x0 = jnp.asarray(rng.standard_normal((b, n, d)), jnp.bfloat16)

    def fwd_skel(params, x):
        skips = []
        for i in range(layers):
            p = params[f"l{i}"]
            if i < layers // 2:
                skips.append(x)
            else:
                x = jnp.concatenate([x, skips.pop()], axis=-1) @ p["skip"]
            q = (x @ p["q"]).reshape(b, n, h_heads, dh).transpose(0, 2, 1, 3)
            kk = (x @ p["k"]).reshape(b, n, h_heads, dh).transpose(0, 2, 1, 3)
            v = (x @ p["v"]).reshape(b, n, h_heads, dh).transpose(0, 2, 1, 3)
            e = jnp.einsum("bhid,bhjd->bhij", q, kk) * (dh**-0.5)
            a = jax.nn.softmax(e, axis=-1)
            o = jnp.einsum("bhij,bhjd->bhid", a, v)
            x = x + o.transpose(0, 2, 1, 3).reshape(b, n, d) @ p["out"]
            x = x + jax.nn.gelu(x @ p["fi"]) @ p["fo"]
        return x

    def loss_skel(params, x):
        return (fwd_skel(params, x).astype(jnp.float32) ** 2).mean()

    bench_sgd(f"skeleton_e2 B{b} N{n}", params, loss_skel, (x0,))

    # --- real UNetT backbone, MSE loss ---
    nf = n - 1  # mel frames (backbone prepends the time token)
    xs = jnp.asarray(rng.standard_normal((b, nf, 80)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((b, nf, 80)), jnp.float32)
    text = jnp.asarray(rng.integers(0, 64, (b, 128)), jnp.int32)
    tvec = jnp.asarray(rng.uniform(0, 1, (b,)), jnp.float32)
    nodrop = jnp.zeros((b,), bool)
    for p_drop, label in ((0.1, "backbone"), (0.0, "backbone_nodrop")):
        mod = UNetT(text_num_embeds=64, dim=d, depth=layers, heads=h_heads,
                    dropout_rate=p_drop, dtype=jnp.bfloat16)
        variables = mod.init(
            {"params": jax.random.key(0), "dropout": drop_key},
            xs, cond, text, tvec, nodrop, nodrop, None, True,
        )

        def loss_bb(params, mod=mod):
            out = mod.apply(
                {"params": params}, xs, cond, text, tvec, nodrop, nodrop,
                None, False, rngs={"dropout": drop_key},
            )
            return (out.astype(jnp.float32) ** 2).mean()

        bench_sgd(f"{label} B{b} N{n}", variables["params"], loss_bb)


def attn_micro(b=4, h=16, dh=64, k=8):
    """Crossover sweep: fused Pallas flash vs XLA materialized attention,
    fwd-only (inference) and fwd+bwd (training), over sequence length.
    Decides the 'auto' backend policy threshold."""
    import jax
    import jax.numpy as jnp

    from jatts_tpu.modules.attention import _flash_attend

    def xla_attn(q, kk, v):
        e = jnp.einsum("bhid,bhjd->bhij", q, kk) * (dh**-0.5)
        a = jax.nn.softmax(e, axis=-1)
        return jnp.einsum("bhij,bhjd->bhid", a, v)

    for n in (512, 1024, 2048, 4096):
        q = jnp.asarray(np.random.randn(b, h, n, dh), jnp.bfloat16)
        flops_f = 4 * b * h * n * n * dh  # qk + av

        for name, f in (("xla", xla_attn),
                        ("flash", lambda q, kk, v: _flash_attend(
                            q, kk, v, None, None, dh**-0.5))):
            @jax.jit
            def fwd(q, chain):
                def body(c, _):
                    o = f(c, c, c)
                    return o * jnp.asarray(0.5, o.dtype) + c * 0.5, None
                c, _ = jax.lax.scan(body, _mix(q, chain), None, length=k)
                return c.astype(jnp.float32).mean()[None]

            @jax.jit
            def fwdbwd(q, chain):
                def body(c, _):
                    g = jax.grad(
                        lambda x: (f(x, x, x).astype(jnp.float32) ** 2).mean()
                    )(c)
                    return c - g.astype(c.dtype), None
                c, _ = jax.lax.scan(body, _mix(q, chain), None, length=k)
                return c.astype(jnp.float32).mean()[None]

            _bench_scanned(fwd, (q,), flops_f, k, n_rep=2, prime=2,
                           label=f"attn fwd  n={n} {name}")
            _bench_scanned(fwdbwd, (q,), 3 * flops_f, k, n_rep=2, prime=2,
                           label=f"attn f+b  n={n} {name}")


def flash_parity(b=2, h=4, t=256, dh=64):
    """On-device check: unpadded dh<128 flash == XLA attention (causal+mask)."""
    import jax
    import jax.numpy as jnp

    from jatts_tpu.modules.attention import _flash_attend

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, t, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, dh)), jnp.float32)
    mask = jnp.asarray(np.arange(t)[None, :] < np.array([[t], [t - 37]]))
    pad = jnp.zeros((b, h, t, 128 - dh), jnp.float32)
    for causal in (False, True):
        out = jax.jit(lambda q, k, v: _flash_attend(
            q, k, v, None, mask, dh**-0.5, causal=causal))(q, k, v)
        # manually pre-padded to 128 -> exercises the kernel's padded config
        out_padded = jax.jit(lambda q, k, v: _flash_attend(
            jnp.concatenate([q, pad], -1), jnp.concatenate([k, pad], -1),
            jnp.concatenate([v, pad], -1), None, mask, dh**-0.5,
            causal=causal))(q, k, v)[..., :dh]

        def ref(q, k, v):
            e = jnp.einsum("bhid,bhjd->bhij", q, k) * dh**-0.5
            m2 = mask[:, None, None, :] & mask[:, None, :, None]
            if causal:
                m2 = m2 & jnp.tril(jnp.ones((t, t), bool))[None, None]
            a = jax.nn.softmax(jnp.where(m2, e, -1e9), axis=-1)
            return jnp.einsum("bhij,bhjd->bhid", a, v)

        want = jax.jit(ref)(q, k, v)
        valid = np.asarray(mask)[:, None, :, None] & np.ones((b, h, t, dh), bool)
        err_pad = float(jnp.max(jnp.abs(jnp.where(valid, out - out_padded, 0.0))))
        err_xla = float(jnp.max(jnp.abs(jnp.where(valid, out - want, 0.0))))
        print(f"flash_parity dh={dh} causal={causal}: vs_padded={err_pad:.2e} "
              f"vs_xla={err_xla:.2e}")
        # unpadded must match the padded kernel bit-for-bit-ish; vs XLA the
        # bound is MXU default-precision (bf16-truncated) noise
        assert err_pad < 1e-6, "flash unpadded != padded kernel"
        # both paths bf16-truncate in the MXU (TPU default precision) with
        # different accumulation orders; causal rows with few valid keys
        # amplify the noise
        assert err_xla < 2e-2, "flash vs XLA out of tolerance"


def main():
    stages = sys.argv[1:] or ["ceiling", "skeleton", "valle_k5", "valle_k20"]
    for st in stages:
        if st == "flash_parity":
            flash_parity()
        elif st == "attn_micro":
            attn_micro()
        elif st == "ceiling":
            ceiling()
        elif st == "skeleton":
            skeleton()
        elif st == "skeleton_b16":
            skeleton(b=16)
        elif st == "valle_bisect":
            valle_bisect()
        elif st == "e2tts_bisect":
            e2tts_bisect()
        elif st == "valle_b16":
            # remat cost: B=16 fits WITHOUT remat; compare 2x this vs B=32+remat
            print("# valle b16 no-remat:")
            valle_k(5, b=16, use_remat=False)
        elif st == "valle_b16_remat":
            print("# valle b16 remat:")
            valle_k(5, b=16, use_remat=True)
        elif st == "valle_nodrop":
            print("# valle b32 remat p_dropout=0:")
            valle_k(5, b=32, use_remat=True, p_dropout=0.0)
        elif st == "valle_xla_attn":
            print("# valle b16 no-remat xla attention:")
            valle_k(5, b=16, use_remat=False, attn_backend="xla")
        elif st == "valle_b16_flash":
            print("# valle b16 no-remat flash (dh64 unpadded):")
            valle_k(5, b=16, use_remat=False, attn_backend="flash")
        elif st == "valle_b32_xla_remat":
            print("# valle b32 remat xla attention:")
            valle_k(5, b=32, use_remat=True, attn_backend="xla")
        elif st.startswith("e2tts_"):
            from benchmarks.bench_train_mfu import run_e2tts
            backend = st[len("e2tts_"):]
            print(f"# e2tts b8 {backend} attention:")
            run_e2tts(attn_backend=backend)
        elif st.startswith("valle_k"):
            valle_k(int(st[len("valle_k"):]))
        else:
            print(f"unknown stage {st}")


if __name__ == "__main__":
    main()
