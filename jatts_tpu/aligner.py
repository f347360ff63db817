"""TPU-native forced aligner: phoneme durations from scratch, no Julius.

The reference's tts1 recipes depend on an external HMM forced-alignment
sub-pipeline (Julius binaries + in-tree acoustic models:
reference utils/run_julius.sh:29-39, utils/julius_models/,
utils/data_prep_post_julius.py:23-148) to produce the per-token frame
durations FastSpeech2/MatchaTTS train on.  This module replaces that whole
sub-pipeline with an in-framework aligner built from components the MAS
models already use:

    token embed + conv text encoder
      -> AlignmentModule (-L2 log-softmax lattice, modules/alignment.py)
      -> ForwardSum CTC loss + binarization loss  (losses/align.py)
      -> batched Viterbi (Pallas MAS kernel, ops/mas_pallas.py)

Forced alignment is transductive: the aligner is trained on exactly the
corpus it aligns (train+dev+test csvs together), so "overfitting" is the
point.  A few thousand steps of a tiny model suffice — the whole job is a
single jitted program per padded bucket shape.

Edge silence: when a csv row has no start/end crop yet (raw corpus), a
``<sil>`` token is prepended/appended for alignment only; its aligned frames
become the row's start/end crop (the reference gets the same from Julius's
silB/silE segments, utils/data_prep_post_julius.py:110-145), and the inner
durations then sum exactly to the cropped waveform's mel frame count
(1 + n_samples // hop — text/julius.py:expected_total_frames), which is the
invariant bin/preprocess.py asserts.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from jatts_tpu.losses.align import ForwardSumLoss
from jatts_tpu.modules.alignment import AlignmentModule
from jatts_tpu.ops.mas import viterbi_decode
from jatts_tpu.ops.masks import sequence_mask

SIL_TOKEN = "<sil>"


class Aligner(nn.Module):
    """Lightweight text encoder + alignment lattice.

    Small on purpose: the aligner only needs per-token acoustic templates
    discriminative enough for a monotonic DP, not a TTS-quality encoder.
    """

    idim: int            # vocabulary size (incl. <sil> at id 0)
    odim: int            # mel bins
    adim: int = 256
    elayers: int = 2
    dropout_rate: float = 0.1
    mas_backend: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, ilens, ys, olens, deterministic: bool = True):
        """xs: [B, T_text] int ids; ys: [B, T_feats, odim] normalized mel.

        Returns dict(log_p_attn [B, T_feats, T_text], ds [B, T_text],
        bin_loss scalar).
        """
        x_masks = sequence_mask(ilens, xs.shape[1])  # [B, T_text] bool
        h = nn.Embed(self.idim, self.adim, dtype=self.dtype, name="embed")(xs)
        h = h * x_masks[..., None]
        for i in range(self.elayers):
            r = nn.Conv(self.adim, (3,), padding="SAME", dtype=self.dtype,
                        name=f"conv{i}")(h)
            r = nn.relu(r)
            r = nn.LayerNorm(name=f"ln{i}")(r)
            r = nn.Dropout(self.dropout_rate)(r, deterministic=deterministic)
            h = (h + r) * x_masks[..., None]
        log_p_attn = AlignmentModule(
            self.adim, self.odim, dtype=self.dtype, name="alignment"
        )(h, ys, x_masks)
        ds, bin_loss = viterbi_decode(
            log_p_attn, ilens, olens, backend=self.mas_backend
        )
        return {"log_p_attn": log_p_attn, "ds": ds, "bin_loss": bin_loss}


# --------------------------------------------------------------------------
# corpus preparation
# --------------------------------------------------------------------------

def build_vocab(rows_lists: Sequence[Sequence[dict]]) -> Dict[str, int]:
    """Internal token->id map over every csv's ``phonemes`` column.

    Id 0 is reserved for the edge-silence token; the mapping is private to
    the aligner (durations are id-agnostic), so no tokens.txt is needed —
    alignment runs at stage 0, before the recipe's token list exists.
    """
    toks = set()
    for rows in rows_lists:
        for row in rows:
            toks.update((row.get("phonemes") or "").split())
    vocab = {SIL_TOKEN: 0}
    for t in sorted(toks):
        vocab[t] = len(vocab)
    return vocab


def prepare_item(
    row: dict,
    mel: np.ndarray,
    vocab: Dict[str, int],
    n_samples: int,
    hop: int,
) -> Optional[dict]:
    """One csv row + its (un-normalized) mel -> aligner work item.

    ``n_samples`` is the sample count of the waveform the mel was computed
    from (after any existing start/end crop).  Returns None when the row
    cannot be aligned (no phonemes, or more tokens than frames).
    """
    phonemes = (row.get("phonemes") or "").split()
    if not phonemes:
        return None
    edge_sil = not (row.get("start") or "").strip()
    ids = [vocab[p] for p in phonemes]
    if edge_sil:
        ids = [0, *ids, 0]
    n_frames = min(len(mel), 1 + n_samples // hop)
    if len(ids) > n_frames:
        return None
    return {
        "row": row,
        "tokens": np.asarray(ids, np.int32),
        "mel": np.asarray(mel[:n_frames], np.float32),
        "n_frames": n_frames,
        "n_samples": n_samples,
        "edge_sil": edge_sil,
    }


def normalize_mels(items: List[dict]) -> None:
    """In-place corpus mean/var normalization (stabilizes the -L2 lattice)."""
    tot = np.zeros(items[0]["mel"].shape[-1], np.float64)
    tot2 = np.zeros_like(tot)
    n = 0
    for it in items:
        m = it["mel"]
        tot += m.sum(axis=0)
        tot2 += (m.astype(np.float64) ** 2).sum(axis=0)
        n += len(m)
    mean = tot / max(n, 1)
    std = np.sqrt(np.maximum(tot2 / max(n, 1) - mean**2, 1e-8))
    for it in items:
        it["mel"] = ((it["mel"] - mean) / std).astype(np.float32)


def _round_up(n: int, mult: int) -> int:
    return ((n + mult - 1) // mult) * mult


def make_batches(
    items: List[dict],
    batch_size: int,
    tok_mult: int = 8,
    frame_mult: int = 64,
) -> List[dict]:
    """Sort by frame length, chunk, pad to rounded static shapes.

    Shapes are rounded to multiples so the whole corpus compiles to a
    handful of programs (the XLA analog of the reference's
    DynamicBatchSampler bucketing, tts_dataset.py:215-299).
    """
    order = sorted(range(len(items)), key=lambda i: items[i]["n_frames"])
    batches = []
    for c in range(0, len(order), batch_size):
        idx = order[c : c + batch_size]
        t_tok = _round_up(max(len(items[i]["tokens"]) for i in idx), tok_mult)
        t_frm = _round_up(max(items[i]["n_frames"] for i in idx), frame_mult)
        b = len(idx)
        xs = np.zeros((b, t_tok), np.int32)
        ys = np.zeros((b, t_frm, items[idx[0]]["mel"].shape[-1]), np.float32)
        ilens = np.zeros((b,), np.int32)
        olens = np.zeros((b,), np.int32)
        for j, i in enumerate(idx):
            it = items[i]
            xs[j, : len(it["tokens"])] = it["tokens"]
            ys[j, : it["n_frames"]] = it["mel"]
            ilens[j] = len(it["tokens"])
            olens[j] = it["n_frames"]
        batches.append(
            {"xs": xs, "ys": ys, "ilens": ilens, "olens": olens, "items": idx}
        )
    return batches


# --------------------------------------------------------------------------
# training
# --------------------------------------------------------------------------

def train_aligner(
    model: Aligner,
    batches: List[dict],
    steps: int = 2000,
    lr: float = 1e-3,
    bin_loss_start_frac: float = 0.5,
    lambda_bin: float = 1.0,
    seed: int = 0,
    log_every: int = 200,
) -> dict:
    """Train on the padded batches; returns the final params pytree.

    Loss schedule mirrors the MAS trainers (reference
    jatts/trainers/matchatts.py:56-104): ForwardSum CTC from step 0, the
    binarization loss gated in after ``bin_loss_start_frac`` of training so
    the soft lattice settles before Viterbi hardening.
    """
    import optax

    fsum = ForwardSumLoss()
    bin_start = int(steps * bin_loss_start_frac)

    b0 = batches[0]
    params = model.init(
        {"params": jax.random.key(seed), "dropout": jax.random.key(seed + 1)},
        jnp.asarray(b0["xs"]), jnp.asarray(b0["ilens"]),
        jnp.asarray(b0["ys"]), jnp.asarray(b0["olens"]),
        deterministic=True,
    )["params"]

    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps=max(1, min(200, steps // 10)),
        decay_steps=max(2, steps),
    )
    tx = optax.adamw(sched, weight_decay=1e-6)
    opt_state = tx.init(params)

    @jax.jit
    def step_fn(params, opt_state, xs, ilens, ys, olens, rng, step):
        def loss_fn(p):
            out = model.apply(
                {"params": p}, xs, ilens, ys, olens, deterministic=False,
                rngs={"dropout": rng},
            )
            l_fsum = fsum(out["log_p_attn"], ilens, olens)
            gate = (step >= bin_start).astype(jnp.float32)
            loss = l_fsum + lambda_bin * gate * out["bin_loss"]
            return loss, (l_fsum, out["bin_loss"])

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    rng = np.random.default_rng(seed)
    key = jax.random.key(seed + 2)
    order = np.arange(len(batches))
    i = 0
    for s in range(steps):
        if i == 0:
            rng.shuffle(order)
        b = batches[order[i]]
        i = (i + 1) % len(batches)
        key, sub = jax.random.split(key)
        params, opt_state, loss, (l_f, l_b) = step_fn(
            params, opt_state, jnp.asarray(b["xs"]), jnp.asarray(b["ilens"]),
            jnp.asarray(b["ys"]), jnp.asarray(b["olens"]), sub,
            jnp.asarray(s, jnp.int32),
        )
        if log_every and (s % log_every == 0 or s == steps - 1):
            logging.info(
                "aligner step %d/%d: loss %.4f (fsum %.4f, bin %.4f)",
                s, steps, float(loss), float(l_f), float(l_b),
            )
    return params


# --------------------------------------------------------------------------
# duration dump
# --------------------------------------------------------------------------

def dump_durations(
    model: Aligner, params: dict, batches: List[dict], items: List[dict]
) -> List[Optional[np.ndarray]]:
    """Viterbi durations per item (aligned to ``items`` order; full token
    sequence incl. edge-sil)."""

    @jax.jit
    def infer(xs, ilens, ys, olens):
        out = model.apply(
            {"params": params}, xs, ilens, ys, olens, deterministic=True
        )
        return out["ds"]

    result: List[Optional[np.ndarray]] = [None] * len(items)
    for b in batches:
        ds = np.asarray(
            infer(jnp.asarray(b["xs"]), jnp.asarray(b["ilens"]),
                  jnp.asarray(b["ys"]), jnp.asarray(b["olens"]))
        )
        for j, i in enumerate(b["items"]):
            n_tok = len(items[i]["tokens"])
            result[i] = np.rint(ds[j, :n_tok]).astype(np.int64)
    return result


def row_updates_from_durations(
    item: dict, ds: np.ndarray, hop: int, fs: int
) -> dict:
    """Durations (+ start/end crop from edge-sil frames) for the csv row.

    Invariant: the returned durations sum to ``1 + n_cropped // hop`` — the
    mel frame count bin/preprocess.py computes for the (re-)cropped waveform
    (text/julius.py:expected_total_frames).
    """
    n = item["n_samples"]
    total = int(ds.sum())
    if item["edge_sil"]:
        s0, s1 = int(ds[0]), int(ds[-1])
        inner = ds[1:-1].copy()
        # keep >= 1 frame per real token even if MAS gave everything to sil
        a = min(s0 * hop, max(n - hop * len(inner), 0))
        b_samp = max(n - s1 * hop, a + hop * len(inner))
        b_samp = min(b_samp, n)
        expected = 1 + (b_samp - a) // hop
        # half-sample offset: read_audio crops via int(float(start) * fs)
        # (truncation), so land mid-sample to make the crop exact regardless
        # of decimal-repr rounding
        start, end = (a + 0.5) / fs, (b_samp + 0.5) / fs
        upd = {"start": f"{start:.9f}", "end": f"{end:.9f}"}
    else:
        inner = ds.copy()
        expected = 1 + n // hop
        upd = {}
    # distribute any rounding residual (largest-duration tokens first, the
    # same repair the reference applies to Julius intervals,
    # utils/data_prep_post_julius.py:52-80)
    residual = int(expected - inner.sum())
    if residual != 0 and len(inner):
        order = np.argsort(-inner)
        step = 1 if residual > 0 else -1
        k = 0
        while residual != 0:
            j = order[k % len(inner)]
            if step < 0 and inner[j] <= 1:
                k += 1
                continue
            inner[j] += step
            residual -= step
            k += 1
    assert int(inner.sum()) == expected, (int(inner.sum()), expected, total)
    upd["durations"] = " ".join(str(int(d)) for d in inner)
    return upd
