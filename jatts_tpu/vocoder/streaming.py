"""Streaming (chunked) HiFi-GAN vocoding for low time-to-first-audio serving.

The reference vocodes whole utterances offline (jatts/vocoder/vocoder.py:60-67
inside the tts_decode.py batch loop) — a listener hears nothing until the full
waveform exists. For interactive serving the metric that matters is
time-to-first-audio (TTFA): how long until the first playable chunk leaves the
device. The HiFi-GAN generator is a pure conv stack, so chunking is exact by
construction: vocode a mel window that extends ``context`` frames past the
chunk on each side, crop the interior, and — provided ``context`` covers the
stack's receptive field — every cropped sample sees exactly the mel values the
full-utterance program saw. No crossfades, no approximation.

Edge handling keeps utterance boundaries exact too: the first/last windows are
NOT padded — they start/end at the true mel boundary, so the conv stack's own
SAME zero-padding matches the full-utterance program's (an input-side zero-pad
would instead leak nonzero activations — conv bias, leaky-relu — into the
crop).

The receptive field is computed from the generator's hyperparameters
(``min_context_frames``), not hand-tuned: input conv + per-stage transposed
conv spread + the MRF residual stacks at each stage's sample rate + output
conv, all converted back to mel frames. Exactness at the computed context is
pinned by tests/test_streaming_vocoder.py (and a too-small context is pinned
to FAIL, so the test is sharp).

Per-window programs are jitted with static crop offsets; an utterance of any
length costs at most three compiles (first / interior / last window shapes).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def hop_size(voc) -> int:
    """Samples per mel frame: product of the generator's upsample scales."""
    h = 1
    for s in voc.upsample_scales:
        h *= int(s)
    return h


def _resblock_context(voc) -> int:
    """Per-stage one-sided receptive field of the MRF residual stacks, in
    samples at that stage's rate (max over parallel blocks; each block chains
    len(dilations) dilated convs + optional undilated follow-ups)."""
    worst = 0
    for rk, rds in zip(voc.resblock_kernel_sizes, voc.resblock_dilations):
        half = (rk - 1) // 2
        ctx = sum(half * d for d in rds)
        if voc.use_additional_convs:
            ctx += half * len(rds)
        worst = max(worst, ctx)
    return worst


def min_context_frames(voc) -> int:
    """One-sided receptive field of the generator, in mel frames (ceil)."""
    ctx = (voc.kernel_size - 1) / 2  # input conv
    res = _resblock_context(voc)
    rate = 1  # samples per mel frame at the current stage's INPUT
    for scale, k in zip(voc.upsample_scales, voc.upsample_kernel_sizes):
        # transposed conv: each output draws on <= ceil(k/s) input positions
        ctx += math.ceil(k / scale) / rate
        rate *= int(scale)
        ctx += res / rate  # residual stack at this stage's output rate
    ctx += (voc.kernel_size - 1) / 2 / rate  # output conv
    return int(math.ceil(ctx))


@partial(jax.jit, static_argnames=("voc", "crop_start", "crop_len", "hop"))
def _vocode_window(voc, variables, mel_win, crop_start: int, crop_len: int,
                   hop: int):
    wav = voc.apply(variables, mel_win)
    return jax.lax.slice_in_dim(
        wav, crop_start * hop, (crop_start + crop_len) * hop, axis=1
    )


def vocode_streaming(voc, variables, mel, *, chunk: int = 64,
                     context: int | None = None):
    """Yield waveform chunks left-to-right for a batch of mel spectrograms.

    Args:
        voc: HiFiGANGenerator (or any pure conv [B,T,C]->[B,T*hop,1] module
            exposing the same hyperparameter fields).
        variables: generator variables.
        mel: [B, T, n_mels] normalized log-mel.
        chunk: mel frames per emitted chunk (chunk*hop samples each; the
            final chunk covers the remainder).
        context: mel frames of look-back/look-ahead per window; defaults to
            the generator's computed receptive field. Values below the
            default break exactness.

    Yields:
        [B, chunk_i*hop, 1] arrays whose concatenation equals
        ``voc.apply(variables, mel)`` (up to XLA fusion rounding; pinned to
        ~1e-5 absolute in float32 by the tests).
    """
    if context is None:
        context = min_context_frames(voc)
    hop = hop_size(voc)
    t = mel.shape[1]
    for s in range(0, t, chunk):
        e = min(t, s + chunk)
        ws, we = max(0, s - context), min(t, e + context)
        yield _vocode_window(
            voc, variables, jax.lax.slice_in_dim(mel, ws, we, axis=1),
            s - ws, e - s, hop,
        )


def vocode_streaming_np(voc, variables, mel, *, chunk: int = 64,
                        context: int | None = None):
    """Host-side convenience: yields numpy chunks (each fetch is the
    completion barrier for its window — the pattern a serving loop wants:
    chunk k plays while chunk k+1 computes)."""
    import numpy as np

    for w in vocode_streaming(voc, variables, mel, chunk=chunk,
                              context=context):
        yield np.asarray(w)
