"""Jitted DSP feature extraction (STFT / log-mel / energy).

TPU-native replacement for the reference's numpy/librosa preprocessing
(jatts/modules/feature_extract/mel.py:11-72, energy.py:17-122): the whole
stage-1 feature dump becomes batched XLA ops — framing as a gather, the FFT
on-device, and the mel projection a single matmul that rides the MXU.

Numerics are librosa-compatible: center=True reflect padding, periodic Hann
window, Slaney-scale mel filterbank with Slaney normalization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# windows / filterbanks (host-side constants, float64 then cast)
# ---------------------------------------------------------------------------


def periodic_hann(win_length: int) -> np.ndarray:
    """scipy.signal.get_window('hann', n, fftbins=True) equivalent."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float64)


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mel = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(f / min_log_hz) / logstep, mel)


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = f_sp * m
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs
    )


def mel_filterbank(
    sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float
) -> np.ndarray:
    """librosa.filters.mel-compatible (htk=False, norm='slaney') -> [n_mels, n_fft//2+1]."""
    fftfreqs = np.linspace(0.0, sr / 2.0, n_fft // 2 + 1)
    mel_pts = np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax), n_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float64)


# ---------------------------------------------------------------------------
# jitted transforms
# ---------------------------------------------------------------------------


def frame_signal(audio: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Centered framing with reflect padding: ``[T] -> [n_frames, n_fft]``."""
    pad = n_fft // 2
    x = jnp.pad(audio, (pad, pad), mode="reflect")
    n_frames = 1 + audio.shape[0] // hop
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    return x[idx]


@functools.partial(
    jax.jit, static_argnames=("n_fft", "hop", "win_length")
)
def stft_magnitude(
    audio: jnp.ndarray, n_fft: int, hop: int, win_length: int | None = None
) -> jnp.ndarray:
    """|STFT| with librosa semantics -> ``[n_frames, n_fft//2 + 1]``."""
    win_length = win_length or n_fft
    window = periodic_hann(win_length)
    if win_length < n_fft:  # center-pad window to n_fft like librosa
        lpad = (n_fft - win_length) // 2
        window = np.pad(window, (lpad, n_fft - win_length - lpad))
    frames = frame_signal(audio.astype(jnp.float32), n_fft, hop)
    frames = frames * jnp.asarray(window, dtype=jnp.float32)[None, :]
    return jnp.abs(jnp.fft.rfft(frames, axis=-1))


@functools.partial(
    jax.jit,
    static_argnames=(
        "sampling_rate", "fft_size", "hop_size", "win_length", "num_mels",
        "fmin", "fmax", "log_base",
    ),
)
def logmelfilterbank(
    audio: jnp.ndarray,
    sampling_rate: int,
    fft_size: int = 1024,
    hop_size: int = 256,
    win_length: int | None = None,
    num_mels: int = 80,
    fmin: float | None = None,
    fmax: float | None = None,
    eps: float = 1e-10,
    log_base: float | None = 10.0,
) -> jnp.ndarray:
    """Log-mel feature ``[n_frames, num_mels]`` (reference mel.py:11-72)."""
    fmin = 0.0 if fmin is None else fmin
    fmax = sampling_rate / 2.0 if fmax is None else fmax
    spc = stft_magnitude(audio, fft_size, hop_size, win_length)
    basis = jnp.asarray(
        mel_filterbank(sampling_rate, fft_size, num_mels, fmin, fmax),
        dtype=jnp.float32,
    )
    mel = jnp.maximum(eps, spc @ basis.T)
    if log_base is None:
        return jnp.log(mel)
    if log_base == 10.0:
        return jnp.log10(mel)
    if log_base == 2.0:
        return jnp.log2(mel)
    raise ValueError(f"{log_base} is not supported.")


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "win_length"))
def energy(
    audio: jnp.ndarray, n_fft: int = 1024, hop: int = 256, win_length: int | None = None
) -> jnp.ndarray:
    """Per-frame RMS-over-frequency energy ``[n_frames]``
    (reference energy.py:70-100)."""
    spc = stft_magnitude(audio, n_fft, hop, win_length)
    return jnp.sqrt(jnp.maximum((spc**2).sum(axis=-1), 1e-10))


def adjust_num_frames(x: np.ndarray, num_frames: int) -> np.ndarray:
    """Pad/crop trailing frames (reference dio.py:115-123)."""
    if num_frames > len(x):
        pad = [(0, num_frames - len(x))] + [(0, 0)] * (x.ndim - 1)
        return np.pad(x, pad)
    return x[:num_frames]
