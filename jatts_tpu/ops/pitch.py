"""F0 estimation as a jitted XLA op.

The reference uses pyworld DIO+StoneMask on the CPU per utterance
(jatts/modules/feature_extract/dio.py:21-159). pyworld is a C extension and
inherently sequential; here f0 is a batched frame-wise normalized
autocorrelation (NCCF, RAPT-family) computed with FFTs on device:

  frame -> remove DC -> FFT autocorrelation -> normalize by energy ->
  restrict lag to [sr/f0max, sr/f0min] -> peak + parabolic interpolation ->
  voicing decision (NCCF threshold) -> median smoothing.

This is the whole-corpus-on-TPU path the BASELINE north-star asks for
("pitch extraction becomes a jitted XLA op").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(
    jax.jit,
    static_argnames=("fs", "hop", "frame_length", "f0min", "f0max", "threshold"),
)
def estimate_f0(
    audio: jnp.ndarray,
    fs: int,
    hop: int,
    frame_length: int = 2048,
    f0min: float = 40.0,
    f0max: float = 400.0,
    threshold: float = 0.35,
) -> jnp.ndarray:
    """``[T] -> [n_frames]`` f0 in Hz, 0 for unvoiced. n_frames = 1 + T//hop
    (matches the mel frame count convention)."""
    t = audio.shape[0]
    n_frames = 1 + t // hop
    pad = frame_length // 2
    x = jnp.pad(audio.astype(jnp.float32), (pad, pad), mode="reflect")
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(frame_length)[None, :]
    frames = x[idx]  # [N, L]
    frames = frames - jnp.mean(frames, axis=1, keepdims=True)

    # FFT autocorrelation
    nfft = 2 * frame_length
    spec = jnp.fft.rfft(frames, n=nfft, axis=1)
    ac = jnp.fft.irfft(spec * jnp.conj(spec), n=nfft, axis=1)[:, :frame_length]
    ac0 = jnp.maximum(ac[:, :1], 1e-10)
    nccf = ac / ac0  # normalized [-1, 1]

    lag_min = int(fs / f0max)
    lag_max = min(int(fs / f0min), frame_length - 2)
    lags = jnp.arange(lag_min, lag_max + 1)
    window = nccf[:, lag_min : lag_max + 1]  # [N, L_range]

    best = jnp.argmax(window, axis=1)
    peak = jnp.take_along_axis(window, best[:, None], axis=1)[:, 0]

    # parabolic interpolation around the peak
    bm1 = jnp.clip(best - 1, 0, window.shape[1] - 1)
    bp1 = jnp.clip(best + 1, 0, window.shape[1] - 1)
    y0 = jnp.take_along_axis(window, bm1[:, None], axis=1)[:, 0]
    y1 = peak
    y2 = jnp.take_along_axis(window, bp1[:, None], axis=1)[:, 0]
    denom = y0 - 2 * y1 + y2
    delta = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (y0 - y2) / denom, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    lag = lags[best].astype(jnp.float32) + delta

    f0 = fs / jnp.maximum(lag, 1.0)
    energy = ac0[:, 0]
    voiced = (peak > threshold) & (energy > 1e-6)
    f0 = jnp.where(voiced, f0, 0.0)

    # 3-point median smoothing to kill octave spikes
    f0_pad = jnp.pad(f0, (1, 1), mode="edge")
    stacked = jnp.stack([f0_pad[:-2], f0_pad[1:-1], f0_pad[2:]], axis=0)
    f0 = jnp.median(stacked, axis=0)
    return f0


def continuous_f0(f0: np.ndarray) -> np.ndarray:
    """Linear interpolation over unvoiced regions
    (reference dio.py:125-147)."""
    f0 = np.asarray(f0, dtype=np.float64).copy()
    if (f0 == 0).all():
        return f0
    nz = np.nonzero(f0)[0]
    f0[: nz[0]] = f0[nz[0]]
    f0[nz[-1] :] = f0[nz[-1]]
    nz = np.nonzero(f0)[0]
    f0 = np.interp(np.arange(len(f0)), nz, f0[nz])
    return f0
