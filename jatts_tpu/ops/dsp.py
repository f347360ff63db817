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
    # np.where evaluates both branches: keep the log's argument positive for
    # f=0 rows (they take the linear branch anyway) to avoid a divide warning
    f_safe = np.maximum(f, 1e-10)
    return np.where(
        f >= min_log_hz, min_log_mel + np.log(f_safe / min_log_hz) / logstep, mel
    )


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


def _stft_complex(audio: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    window = jnp.asarray(periodic_hann(n_fft), jnp.float32)
    frames = frame_signal(audio.astype(jnp.float32), n_fft, hop)
    return jnp.fft.rfft(frames * window[None, :], axis=-1)


def _istft(spec: jnp.ndarray, n_fft: int, hop: int, length: int) -> jnp.ndarray:
    """Inverse STFT with windowed overlap-add (librosa center semantics)."""
    window = jnp.asarray(periodic_hann(n_fft), jnp.float32)
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * window[None, :]
    n_frames = frames.shape[0]
    total = n_fft + hop * (n_frames - 1)
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    wav = jnp.zeros(total, jnp.float32).at[idx.reshape(-1)].add(frames.reshape(-1))
    wsum = jnp.zeros(total, jnp.float32).at[idx.reshape(-1)].add(
        jnp.broadcast_to(window[None, :] ** 2, idx.shape).reshape(-1)
    )
    wav = wav / jnp.maximum(wsum, 1e-8)
    pad = n_fft // 2
    return wav[pad : pad + length]


@functools.partial(
    jax.jit,
    static_argnames=(
        "sampling_rate", "fft_size", "hop_size", "num_mels", "fmin", "fmax",
        "log_base", "n_iter", "length",
    ),
)
def griffin_lim(
    log_mel: jnp.ndarray,
    sampling_rate: int,
    fft_size: int = 1024,
    hop_size: int = 256,
    num_mels: int = 80,
    fmin: float | None = None,
    fmax: float | None = None,
    log_base: float | None = 10.0,
    n_iter: int = 32,
    length: int | None = None,
) -> jnp.ndarray:
    """Weights-free mel inversion: log-mel ``[T, num_mels]`` -> waveform.

    Pseudo-inverse of the Slaney mel basis recovers a linear magnitude
    estimate, then ``n_iter`` Griffin-Lim phase iterations run as one jitted
    ``lax.fori_loop`` (each step = ISTFT -> STFT -> magnitude projection).
    The reference has no vocoderless path at all — decoding there requires a
    parallel_wavegan checkpoint (jatts/vocoder/vocoder.py:16-44); this is
    the debugging / no-weights fallback used by ``tts_decode --vocoder
    griffin_lim`` and the quality E2E tests.
    """
    fmin = 0.0 if fmin is None else fmin
    fmax = sampling_rate / 2.0 if fmax is None else fmax
    if log_base is None:
        mel = jnp.exp(log_mel)
    elif log_base == 10.0:
        mel = jnp.power(10.0, log_mel)
    elif log_base == 2.0:
        mel = jnp.power(2.0, log_mel)
    else:
        raise ValueError(f"{log_base} is not supported.")
    basis = np.asarray(
        mel_filterbank(sampling_rate, fft_size, num_mels, fmin, fmax),
        np.float32,
    )  # [num_mels, n_bins]
    inv = jnp.asarray(np.linalg.pinv(basis), jnp.float32)  # [n_bins, num_mels]
    mag = jnp.maximum(mel @ inv.T, 0.0) ** 1.0  # [T, n_bins]

    t_frames = log_mel.shape[0]
    length = length if length is not None else t_frames * hop_size
    # frame_signal produces 1 + length//hop frames; match the magnitude grid
    wav_len = (t_frames - 1) * hop_size

    def step(_, wav):
        spec = _stft_complex(wav, fft_size, hop_size)
        phase = spec / jnp.maximum(jnp.abs(spec), 1e-8)
        return _istft(mag[: spec.shape[0]] * phase, fft_size, hop_size, wav_len)

    wav0 = _istft(mag.astype(jnp.complex64), fft_size, hop_size, wav_len)
    wav = jax.lax.fori_loop(0, n_iter, step, wav0)
    out = jnp.zeros(length, jnp.float32)
    n = min(length, wav_len)
    return out.at[:n].set(wav[:n])
