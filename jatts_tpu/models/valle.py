"""VALL-E AR/NAR neural-codec LM (reference jatts/models/valle_base.py:27-280,
valle_ar.py:16-101, valle_nar.py:15-119).

TPU re-design:
  * the reference's "list of variable-length tensors" batches become packed
    padded arrays: each sample's [text | sep | prompt | sep | response]
    sequence is packed contiguously via gathers (static shapes, no ragged
    tensors);
  * AR decode is a KV-cached ``lax.scan`` — the reference re-runs the FULL
    transformer over the whole sequence for every generated token
    (valle_ar.py:77-101, "no KV cache" — SURVEY.md §3.4 hot spot);
  * NAR runs 7 level passes, each one jitted forward.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from jatts_tpu.modules.valle_modules import (
    SinusoidalEmbedding,
    VALLEBlock,
)
from jatts_tpu.ops.masks import sequence_mask

IGNORE = -100


def pack_three(
    e_text, text_lens, e_prom, prom_lens, e_resp, resp_lens, sep
):
    """Pack [text | sep | prom | sep | resp] contiguously per sample.

    e_*: [B, T_i, D] embeddings; sep: [D].
    Returns packed [B, S, D] (S = Tx+1+Tp+1+Tr), total_lens [B].

    Implemented as ONE gather from a [text | sep | prom | resp | zero]
    source buffer with the per-position source index computed in [B, S]
    integer space — ~3 HBM passes over [B, S, D] instead of the ~8 a
    three-gather + four-where formulation costs (the index select fuses
    into cheap int ops). Positions past a sample's total length read the
    trailing zero row, so the output is identical to masking.
    """
    b, tx, d = e_text.shape
    tp = e_prom.shape[1]
    tr = e_resp.shape[1]
    s = tx + 1 + tp + 1 + tr
    pos = jnp.arange(s)[None, :]  # [1, S]
    lx = text_lens[:, None]
    lp = prom_lens[:, None]
    lr = resp_lens[:, None]

    sep_row = jnp.broadcast_to(sep[None, None, :], (b, 1, d)).astype(e_text.dtype)
    zero_row = jnp.zeros((b, 1, d), e_text.dtype)
    # [B, tx+1+tp+tr+1, D]: text rows, one sep row, prom rows, resp rows,
    # one zero row (read by every position beyond the packed total)
    src = jnp.concatenate([e_text, sep_row, e_prom, e_resp, zero_row], axis=1)
    sep_idx = tx
    zero_idx = tx + 1 + tp + tr

    is_text = pos < lx
    is_sep = (pos == lx) | (pos == lx + 1 + lp)
    is_prom = (pos > lx) & (pos < lx + 1 + lp)
    is_resp = (pos > lx + 1 + lp) & (pos < lx + 2 + lp + lr)

    idx = jnp.where(
        is_text, pos,
        jnp.where(
            is_sep, sep_idx,
            jnp.where(
                is_prom, pos - (lx + 1) + (tx + 1),
                jnp.where(is_resp, pos - (lx + lp + 2) + (tx + 1 + tp),
                          zero_idx),
            ),
        ),
    )
    # take_along_axis is silently out-of-bounds under jit; the regions above
    # are in range by construction, this is a pure safety clamp
    idx = jnp.clip(idx, 0, zero_idx)
    packed = jnp.take_along_axis(src, idx[..., None], axis=1)
    total = text_lens + prom_lens + resp_lens + 2
    return packed, total


def pack_ids(vals_text, text_lens, tp, prom_lens, vals_resp, resp_lens, fill=IGNORE):
    """Same layout as pack_three but for integer ids; prompt/sep -> fill."""
    b, tx = vals_text.shape
    tr = vals_resp.shape[1]
    s = tx + 1 + tp + 1 + tr
    pos = jnp.arange(s)[None, :]
    lx = text_lens[:, None]
    lp = prom_lens[:, None]
    lr = resp_lens[:, None]
    off_text = jnp.clip(pos, 0, tx - 1)
    off_resp = jnp.clip(pos - (lx + lp + 2), 0, tr - 1)
    g_text = jnp.take_along_axis(vals_text, off_text, axis=1)
    g_resp = jnp.take_along_axis(vals_resp, off_resp, axis=1)
    out = jnp.full((b, s), fill, jnp.int32)
    out = jnp.where(pos < lx, g_text, out)
    out = jnp.where((pos > lx + 1 + lp) & (pos < lx + 2 + lp + lr), g_resp, out)
    return out


class VALLEBase(nn.Module):
    idim: int  # unused (parity with reference signature)
    n_tokens: int = 1024
    d_model: int = 512
    n_heads: int = 8
    n_layers: int = 12
    p_dropout: float = 0.1
    n_prom_levels: int = 8
    n_resp_levels: int = 7
    prompt_prefix_mode: int = 1
    prompt_max_frame_length: int = 225
    dtype: Any = jnp.float32

    # subclass properties
    causal: bool = True
    use_stop_token: bool = True
    norm_type: str = "ln"
    # activation checkpointing over blocks (reference wraps attention in
    # torch.utils.checkpoint, valle/modules.py:212,233-237)
    use_remat: bool = False
    # SELECTIVE remat: a jax.checkpoint_policies name (e.g. 'dots_saveable')
    # — matmul outputs are saved (no MXU recompute in the bwd pass), only
    # the cheap elementwise/softmax fabric is rematerialized. None = full
    # remat of the block (the round-2 all-or-nothing that lost 2x vs
    # batch-16 + accumulation for NAR B=32).
    remat_policy: Optional[str] = None
    # 'xla' (default): round-3 sweeps (benchmarks/bench_flagship_profile.py)
    # measured XLA materialized attention FASTER than the stock Pallas flash
    # kernel at EVERY S<=4096 on v5e-1 (kernel caps at ~8 TFLOP/s through
    # this toolchain vs 26 for XLA; train step 209.8 vs 361.7 ms at B=16).
    # 'flash' remains opt-in for memory-bound long-S cases ('auto' applies
    # exactly that policy: flash only at S>4096); either way the KV-cached
    # decode_step path and off-TPU runs use XLA. No semantic delta: neither
    # path applies attention-prob dropout.
    attn_backend: str = "xla"

    @property
    def stop_token(self) -> int:
        return self.n_tokens

    @property
    def n_resp_tokens(self) -> int:
        return self.n_tokens + (1 if self.use_stop_token else 0)

    def setup(self):
        self.text_emb = nn.Embed(self.n_tokens, self.d_model, name="text_emb")
        self.proms_weight = self.param(
            "proms_emb",
            nn.initializers.normal(1.0),
            (self.n_prom_levels, self.n_tokens, self.d_model),
        )
        self.resps_weight = self.param(
            "resps_emb",
            nn.initializers.normal(1.0),
            (self.n_resp_levels, self.n_resp_tokens, self.d_model),
        )
        self.sin_emb = SinusoidalEmbedding(self.d_model)
        self.sep = self.param("sep", nn.initializers.normal(1.0), (self.d_model,))
        self.blocks = [
            VALLEBlock(
                self.d_model, self.n_heads, self.p_dropout, self.causal,
                self.norm_type, self.n_resp_levels,
                attn_backend=self.attn_backend, dtype=self.dtype,
                name=f"blocks_{i}",
            )
            for i in range(self.n_layers)
        ]
        self.classifier = nn.Dense(
            self.n_resp_tokens, dtype=self.dtype, name="classifier"
        )

    def _multi_embed(self, weight, codes, n_active):
        """Sum embeddings over the first ``n_active[b]`` RVQ levels
        (reference MultiEmbedding, valle/modules.py:249-297).

        codes: [B, T, L]; n_active: [B] number of levels to include
        (n_active never exceeds the embedding's level count — extra input
        levels, e.g. the 8th EnCodec level entering a 7-level NAR embed,
        are dropped like the reference's prev_list slicing)."""
        l = min(codes.shape[-1], weight.shape[0])
        v = weight.shape[1]
        # ONE gather from the level-flattened table (offset indices) instead
        # of L takes + a [L,B,T,D] stack — the stack cost an extra HBM
        # write+read of the full multi-level embedding per step
        flat = weight[:l].reshape(l * v, weight.shape[-1])
        idx = codes[:, :, :l].astype(jnp.int32) + (jnp.arange(l) * v)[None, None, :]
        emb = jnp.take(flat, idx, axis=0)  # [B, T, L, D]
        active = (jnp.arange(l)[None, :] < n_active[:, None]).astype(emb.dtype)
        return jnp.einsum("btld,bl->btd", emb, active)

    def trunk(
        self, text, text_lens, proms, prom_lens, resps, resp_lens,
        resp_levels, quant_levels=None, deterministic: bool = True,
        return_hidden: bool = False, pad_to_128: bool = False,
    ):
        """Packed forward -> logits [B, S, n_resp_tokens], layout info.

        ``return_hidden=True`` returns the pre-classifier hidden states
        [B, S, D] instead of logits: decode paths that only need a REGION
        of the sequence (NAR resp rows, AR last prefix position) gather the
        hidden rows first and run the classifier on just those — skipping
        the [B, S, V] f32 logits materialization plus the classifier FLOPs
        on the text/prom region (measured: the per-element resp-logits
        gather this replaces cost ~127 ms/level at B=32,
        benchmarks/bench_nar_isolate.py).

        ``pad_to_128=True`` pads the packed length to a multiple of 128
        before the blocks (pad rows fully masked, sliced off on return;
        semantically inert on valid rows — masked keys contribute
        exp(-1e9)=0 to the softmax; only reduction-order jitter ~1e-6 from
        the changed contraction tiling, test_trunk_pad_to_128_exact).
        NEGATIVE RESULT — left opt-in, nothing enables it: padding the NAR
        serving pass S=547->640 measured 19% SLOWER at B=32 (561->669 ms,
        benchmarks/bench_valle_fused_profile.py) — the extra pad-row FLOPs
        with no tiling win; XLA handles the awkward 547 fine in the real
        program (the earlier 547-vs-512 "2x tax" reading came from a
        dispatch-overhead-polluted single-shot measurement)."""
        b = text.shape[0]
        e_text = self.text_emb(text)
        e_prom = self._multi_embed(
            self.proms_weight, proms, jnp.full((b,), proms.shape[-1])
        )
        e_resp = self._multi_embed(self.resps_weight, resps, resp_levels)
        x, total = pack_three(
            e_text, text_lens, e_prom, prom_lens, e_resp, resp_lens,
            self.sep.astype(e_text.dtype),
        )
        # cast the residual stream (and mask) to the compute dtype ONCE:
        # embeddings/pack/sin_emb are f32, and without this every block's
        # `(x + h) * m` promoted the bf16 block outputs back to f32 —
        # doubling the HBM bytes of all residual/mask plumbing per layer
        x = self.sin_emb(x).astype(self.dtype)
        s_orig = x.shape[1]
        from jatts_tpu.modules.attention import flash_pad_needed

        if pad_to_128 or flash_pad_needed(self.attn_backend, s_orig):
            # flash kernel blocks are 128-wide: pad the packed length (the
            # pad rows are masked everywhere and sliced off below). Gated on
            # the policy, not `== "flash"`, so 'auto' can reach the kernel
            # at long S (it requires S % 128 == 0)
            s_pad = -s_orig % 128
            if s_pad:
                x = jnp.pad(x, ((0, 0), (0, s_pad), (0, 0)))
        m = sequence_mask(total, x.shape[1], x.dtype)[..., None]
        remat_kw = {}
        if self.use_remat and self.remat_policy:
            import jax

            remat_kw["policy"] = getattr(
                jax.checkpoint_policies, self.remat_policy
            )
        for block in self.blocks:
            if self.use_remat:
                x = nn.remat(
                    type(block).__call__, static_argnums=(4,), **remat_kw
                )(block, x, m, quant_levels, deterministic)
            else:
                x = block(x, m, quant_levels, deterministic=deterministic)
        if return_hidden:
            return x[:, :s_orig], total
        # f32 logits regardless of compute dtype (loss/sampling stability)
        logits = (self.classifier(x) * m).astype(jnp.float32)
        return logits[:, :s_orig], total


class VALLEAR(VALLEBase):
    causal: bool = True
    use_stop_token: bool = True
    norm_type: str = "ln"
    # AR trains/decodes on codec level 0 only (reference valle_ar.py:17-19)
    n_resp_levels: int = 1

    def __call__(
        self,
        text: jnp.ndarray,       # [B, Tx]
        text_lens: jnp.ndarray,
        proms: jnp.ndarray,      # [B, Tp, Lp]
        prom_lens: jnp.ndarray,
        resps: jnp.ndarray,      # [B, Tr] level-0 codes
        resp_lens: jnp.ndarray,
        deterministic: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """Training: next-token CE over the packed sequence
        (reference valle_base.py:149-263 with shift_targ_list=True)."""
        b, tx = text.shape
        tp = proms.shape[1]
        tr = resps.shape[1]
        logits, total = self.trunk(
            text, text_lens, proms, prom_lens, resps[..., None], resp_lens,
            jnp.ones((b,), jnp.int32), None, deterministic,
        )
        # target ids: text next-token; prompt/sep ignored; resp next-token
        # with stop at the end (reference target roll semantics).
        y = pack_ids(text, text_lens, tp, prom_lens, resps, resp_lens)
        s = y.shape[1]
        pos = jnp.arange(s)[None, :]
        nxt = jnp.concatenate([y[:, 1:], jnp.full((b, 1), IGNORE, jnp.int32)], axis=1)
        lx = text_lens[:, None]
        lp = prom_lens[:, None]
        lr = resp_lens[:, None]
        # boundary positions whose "next" crosses segments -> IGNORE
        tgt = jnp.where(pos == lx - 1, IGNORE, nxt)
        resp_last = lx + lp + 1 + lr
        tgt = jnp.where(pos == resp_last, self.stop_token, tgt)
        tgt = jnp.where(pos >= total[:, None], IGNORE, tgt)

        tgt = jnp.where(pos == lx + lp + 1, IGNORE, tgt)  # sep2 ignored (merge sep)
        valid = (tgt != IGNORE)
        safe = jnp.where(valid, tgt, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        loss = jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)
        return {"loss": loss, "logits": logits, "total": total}

    def prefix_forward(
        self,
        text: jnp.ndarray,
        text_lens: jnp.ndarray,
        proms: jnp.ndarray,
        prom_lens: jnp.ndarray,
    ):
        """Run the [text | sep | prom | sep] prefix once, returning last-
        position logits and the prefix K/V caches ([B, Sp, H, Dh] — the
        decode-region caches live in the AR scan carry, see decode_one)."""
        b, tx = text.shape
        tp = proms.shape[1]
        prefix_len = text_lens + prom_lens + 2
        e_text = self.text_emb(text)
        e_prom = self._multi_embed(
            self.proms_weight, proms, jnp.full((b,), proms.shape[-1])
        )
        empty = jnp.zeros((b, 1, self.d_model), e_text.dtype)
        x, _ = pack_three(
            e_text, text_lens, e_prom, prom_lens, empty, jnp.zeros((b,), jnp.int32),
            self.sep.astype(e_text.dtype),
        )
        x = x[:, : tx + 1 + tp + 1]  # drop resp capacity
        x = self.sin_emb(x)
        m = sequence_mask(prefix_len, x.shape[1], x.dtype)[..., None]

        caches_k, caches_v = [], []
        h = x
        for block in self.blocks:
            # prefill returns this block's K/V alongside the output, so the
            # per-layer to_qkv projection runs ONCE (it used to run again
            # inside block())
            h, k, v = block.prefill(h, m)
            caches_k.append(k)
            caches_v.append(v)
        # gather the last prefix row FIRST (broadcast row gather), classify
        # only that row — the full-prefix [B, S, V] f32 classifier was
        # wasted on positions never read (cf. nar_generate's same fix)
        idx = (prefix_len - 1)[:, None, None]
        last_h = jnp.take_along_axis(h, idx, axis=1)  # [B, 1, D]
        last = self.classifier(last_h).astype(jnp.float32)[:, 0, :]
        return last, prefix_len, tuple(caches_k), tuple(caches_v)

    def decode_one(
        self, tok, pos, step, prefix_len,
        prefix_ck, prefix_cv, done_k, done_v, caches_k, caches_v,
    ):
        """One KV-cached AR step: token [B] at absolute positions [B] ->
        (logits [B, V], updated current-chunk caches).

        ``pos`` (= per-row prefix_len + global step) feeds the sinusoidal
        PE — positions stay per-row exact. The CACHE layout is decoupled
        from positions (benchmarks/bench_ar_cache_layout.py, v5e-1, B=32):
        - prefix K/V (``prefix_ck/cv``) and COMPLETED decode chunks
          (``done_k/v``: per-layer tuples of fully-written chunk caches)
          are scan INVARIANTS — never written again, so the scan never
          copies them;
        - only the CURRENT chunk (``caches_k/v``, [B, chunk, H, Dh]) is
          the carry; every row writes slot ``step`` (batch-uniform — a
          per-row slot lowers to a scatter, which XLA will not alias
          in-place in the carry, costing a full cache copy per step);
        - attention merges all regions in the softmax over concatenated
          SCORES, not concatenated caches (a cache concat materializes the
          full capacity every step and loses).
        Together on the cache+attention path: 4.69 (per-row scatter) ->
        2.45 (split+uniform) -> 1.71 ms/step (chunked carry); pure
        attention reads bound at 1.41. See ar_generate for the chunk loop.
        """
        e = jnp.take(
            self.resps_weight[0], jnp.clip(tok, 0, self.n_resp_tokens - 1), axis=0
        )
        e = e[:, None, :] + self.sin_emb.table(pos.astype(jnp.float32))[
            :, None, :
        ].astype(e.dtype)
        h = e
        sp = prefix_ck[0].shape[1]
        sd = caches_k[0].shape[1]
        pvalid = jnp.arange(sp)[None, :] < prefix_len[:, None]
        dvalid = jnp.broadcast_to(
            jnp.arange(sd)[None, :] <= step, (tok.shape[0], sd)
        )
        new_ck, new_cv = [], []
        for i, block in enumerate(self.blocks):
            h, k_i, v_i = block.decode_step(
                h, prefix_ck[i], prefix_cv[i],
                tuple(zip(done_k[i], done_v[i])),
                caches_k[i], caches_v[i], step, pvalid, dvalid,
            )
            new_ck.append(k_i)
            new_cv.append(v_i)
        logits = self.classifier(h)[:, 0, :].astype(jnp.float32)
        return logits, tuple(new_ck), tuple(new_cv)


def ar_generate(
    model: "VALLEAR",
    variables,
    rng,
    text: jnp.ndarray,
    text_lens: jnp.ndarray,
    proms: jnp.ndarray,
    prom_lens: jnp.ndarray,
    max_steps: int = 1000,
    sampling_temperature: float = 1.0,
    n_chunks: Optional[int] = None,
) -> Dict[str, jnp.ndarray]:
    """KV-cached AR decode loop (replaces reference valle_ar.py:77-101's
    full-reforward-per-token loop). Pure function: jittable wholesale; the
    scan body calls ``model.apply`` (no flax-in-scan restriction).

    ``n_chunks`` overrides the batch-size heuristic for the decode-cache
    chunking (see decode_one); chunking is sampling-EXACT — any value
    produces bit-identical tokens (tests/test_valle_chunked_decode.py)."""
    b = text.shape[0]
    last, prefix_len, pck, pcv = model.apply(
        variables, text, text_lens, proms, prom_lens,
        method=VALLEAR.prefix_forward,
    )
    r0, rng = jax.random.split(rng)
    tok0 = jax.random.categorical(r0, last / sampling_temperature, axis=-1)
    stop = model.n_tokens  # stop_token
    # chunked decode caches: an unrolled outer loop over ~4 chunks; only the
    # CURRENT chunk's K/V live in the scan carry (prefix caches + finished
    # chunks are closed over -> scan invariants, never copied), and every
    # row writes slot `step` within the chunk — see decode_one for the
    # measured rationale (2.7x on the cache+attention path vs round 3)
    _, _, h, dh = pck[0].shape
    n_layers = len(pck)
    t_total = max_steps - 1  # tok0 is sampled from the prefix logits
    # chunking pays for the extra score-block bookkeeping only when the
    # carry is large: B=32 9654->11417 tok/s, fused B=16 RTF 0.0204->0.0191,
    # but B=4 4801->4434 — so small batches keep a single chunk
    if n_chunks is None:
        n_chunks = 4 if b >= 8 else 1
    n_chunks = min(n_chunks, t_total) if t_total > 0 else 0
    sizes = [
        t_total // n_chunks + (1 if i < t_total % n_chunks else 0)
        for i in range(n_chunks)
    ]
    all_rngs = jax.random.split(rng, max(t_total, 1))
    done_k = tuple(() for _ in range(n_layers))
    done_v = tuple(() for _ in range(n_layers))
    carry3 = (tok0, prefix_len, jnp.zeros((b,), bool))
    toks_parts = []
    off = 0
    for sz in sizes:
        dck = tuple(
            jnp.zeros((b, sz, h, dh), pck[i].dtype) for i in range(n_layers)
        )
        dcv = tuple(
            jnp.zeros((b, sz, h, dh), pcv[i].dtype) for i in range(n_layers)
        )

        def step(carry, inp, done_k=done_k, done_v=done_v):
            step_i, step_rng = inp
            tok, pos, stopped, ck, cv = carry
            logits, ck, cv = model.apply(
                variables, tok, pos, step_i, prefix_len, pck, pcv,
                done_k, done_v, ck, cv, method=VALLEAR.decode_one,
            )
            nxt = jax.random.categorical(
                step_rng, logits / sampling_temperature, axis=-1
            )
            stopped_now = stopped | (tok == stop)
            nxt = jnp.where(stopped_now, stop, nxt)
            return (nxt, pos + 1, stopped_now, ck, cv), nxt

        carry = (*carry3, dck, dcv)
        (tok_c, pos_c, stop_c, dck, dcv), toks_c = jax.lax.scan(
            step, carry,
            (jnp.arange(sz, dtype=jnp.int32), all_rngs[off:off + sz]),
        )
        carry3 = (tok_c, pos_c, stop_c)
        done_k = tuple(done_k[i] + (dck[i],) for i in range(n_layers))
        done_v = tuple(done_v[i] + (dcv[i],) for i in range(n_layers))
        toks_parts.append(toks_c)
        off += sz
    if toks_parts:
        toks = jnp.concatenate(toks_parts, axis=0)
        toks_all = jnp.concatenate(
            [tok0[:, None], jnp.moveaxis(toks, 0, 1)], axis=1
        )
    else:
        toks_all = tok0[:, None]
    stop_mask = toks_all == stop
    any_stop = jnp.any(stop_mask, axis=1)
    first_stop = jnp.where(any_stop, jnp.argmax(stop_mask, axis=1), max_steps)
    return {"codes": toks_all, "resp_lens": first_stop}


def nar_generate(
    model: "VALLENAR",
    variables,
    rng,
    text: jnp.ndarray,
    text_lens: jnp.ndarray,
    proms: jnp.ndarray,
    prom_lens: jnp.ndarray,
    level0: jnp.ndarray,     # [B, Tr] may carry pad/stop garbage past lens
    resp_lens: jnp.ndarray,
    sampling_temperature: float = 0.2,
) -> jnp.ndarray:
    """Fixed-capacity NAR fill (jittable wholesale; pairs with ar_generate).

    ``level0`` straight from the AR scan carries the stop token (== n_tokens)
    at and beyond each row's stop position — out of range for the NAR's
    n_tokens-entry embedding table, whose flattened gather would silently
    read out of bounds under jit. Sanitize in-program: zero everything past
    ``resp_lens`` and clamp into the codebook (positions past the lens are
    masked out of the packed sequence anyway). This keeps decode/serving on
    ONE compiled program at fixed capacity instead of per-length recompiles.
    """
    tr = level0.shape[1]
    pos = jnp.arange(tr)[None, :]
    valid = pos < resp_lens[:, None]
    level0 = jnp.where(valid, jnp.clip(level0, 0, model.n_tokens - 1), 0)
    return model.apply(
        variables, text, text_lens, proms, prom_lens, level0, resp_lens,
        sampling_temperature, method=VALLENAR.generate, rngs={"noise": rng},
    )


class VALLENAR(VALLEBase):
    causal: bool = False
    use_stop_token: bool = False
    norm_type: str = "adaln"

    def __call__(
        self,
        text: jnp.ndarray,
        text_lens: jnp.ndarray,
        proms: jnp.ndarray,      # [B, Tp, 8]
        prom_lens: jnp.ndarray,
        resps: jnp.ndarray,      # [B, Tr, 8] all levels (training)
        resp_lens: jnp.ndarray,
        quant_levels: Optional[jnp.ndarray] = None,  # [B] in [0, n_resp_levels)
        deterministic: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """Training: random level per sample, CE on level q+1 tokens at resp
        positions (reference valle_nar.py:60-82)."""
        b, tx = text.shape
        tp = proms.shape[1]
        tr = resps.shape[1]
        if quant_levels is None:
            quant_levels = jax.random.randint(
                self.make_rng("noise"), (b,), 0, self.n_resp_levels
            )
        logits, total = self.trunk(
            text, text_lens, proms, prom_lens, resps, resp_lens,
            quant_levels + 1, quant_levels, deterministic,
        )
        targ = jnp.take_along_axis(
            resps, (quant_levels + 1)[:, None, None], axis=2
        )[..., 0]  # [B, Tr] level q+1 codes
        y = pack_ids(
            jnp.full_like(text, IGNORE), text_lens, tp, prom_lens, targ, resp_lens
        )
        pos = jnp.arange(y.shape[1])[None, :]
        y = jnp.where(pos >= total[:, None], IGNORE, y)
        valid = y != IGNORE
        safe = jnp.where(valid, y, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        loss = jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)
        return {"loss": loss, "logits": logits}

    def generate(
        self,
        text: jnp.ndarray,
        text_lens: jnp.ndarray,
        proms: jnp.ndarray,
        prom_lens: jnp.ndarray,
        level0: jnp.ndarray,     # [B, Tr] AR output codes
        resp_lens: jnp.ndarray,
        sampling_temperature: float = 0.2,
    ) -> jnp.ndarray:
        """Fill levels 1..7 sequentially (reference valle_nar.py:88-118).
        Returns [B, Tr, 8].

        The level loop is a LIFTED scan (one trunk body in the HLO instead
        of n_resp_levels unrolled copies — ~7x smaller program, which keeps
        the fused serving export under the remote-compile relay's payload
        limits). The level index and per-level rng ride the scan xs; the
        accumulating codes tensor is the carry. Levels stay strictly
        sequential — level q+1 conditions on all codes <= q — so this is
        layout, not semantics."""
        b, tr = level0.shape
        codes = jnp.zeros((b, tr, self.n_resp_levels + 1), jnp.int32)
        codes = codes.at[:, :, 0].set(level0)
        rngs = jax.random.split(self.make_rng("noise"), self.n_resp_levels)

        def body(mdl, codes, xs):
            level, r = xs
            q = jnp.full((b,), level, jnp.int32)
            hidden, total = mdl.trunk(
                text, text_lens, proms, prom_lens, codes, resp_lens,
                q + 1, q, True, return_hidden=True,
            )
            # gather the resp-region HIDDEN rows (broadcast index -> a row
            # gather), then classify just those rows. A take_along_axis on
            # the full logits with a repeated [B,Tr,V] index lowers to a
            # per-ELEMENT gather — measured ~127 ms/level at B=32
            # (benchmarks/bench_nar_isolate.py); this form is ~free and
            # also skips the classifier on the text/prom rows.
            s = hidden.shape[1]
            lx = text_lens[:, None]
            lp = prom_lens[:, None]
            start = lx + lp + 2
            # clamp: for long text+prompt, start+tr can exceed the packed
            # length S — take_along_axis is silently out-of-bounds under jit
            pos = jnp.clip(jnp.arange(tr)[None, :] + start, 0, s - 1)  # [B, Tr]
            resp_h = jnp.take_along_axis(hidden, pos[..., None], axis=1)
            # zero logits past each row's resp_lens, matching the trunk's
            # `* m` masking at those packed positions (keeps the padded-
            # capacity rows sampling from uniform logits exactly as before)
            valid = (jnp.arange(tr)[None, :] < resp_lens[:, None])[..., None]
            resp_logits = (
                mdl.classifier(resp_h) * valid.astype(resp_h.dtype)
            ).astype(jnp.float32)
            sampled = jax.random.categorical(
                r, resp_logits / sampling_temperature, axis=-1
            )
            codes = jax.lax.dynamic_update_slice_in_dim(
                codes, sampled[..., None].astype(codes.dtype), level + 1,
                axis=2,
            )
            return codes, None

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": False, "noise": False},
            in_axes=0,
            out_axes=0,
        )
        codes, _ = scan(
            self, codes,
            (jnp.arange(self.n_resp_levels, dtype=jnp.int32), rngs),
        )
        return codes
