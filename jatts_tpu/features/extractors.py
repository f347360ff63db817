"""Stage-1 feature extractors, jitted-XLA backed.

Interfaces mirror the reference's feature_extract classes
(jatts/modules/feature_extract/{mel,dio,energy}.py) so preprocess.py reads
identically, but the DSP runs on device (see jatts_tpu.ops.dsp / ops.pitch).
"""

from __future__ import annotations

import logging
from typing import Optional

import numpy as np

from jatts_tpu.ops.dsp import adjust_num_frames, energy as energy_op, logmelfilterbank
from jatts_tpu.ops.pitch import continuous_f0, estimate_f0

# Utterances have arbitrary lengths; jitted XLA ops have static shapes. Pad
# audio up to a bucket boundary (multiples of hop*BUCKET_FRAMES) so the whole
# corpus compiles a handful of programs instead of one per utterance, then
# crop back to the true frame count. Only the last ~n_fft/(2*hop) frames can
# differ marginally from unpadded extraction (zero- vs reflect-padding at the
# tail).
BUCKET_FRAMES = 64


def _pad_to_bucket(audio: np.ndarray, hop: int) -> tuple:
    n_frames = 1 + len(audio) // hop
    bucket = -(-n_frames // BUCKET_FRAMES) * BUCKET_FRAMES
    target_len = (bucket - 1) * hop + hop - 1  # ensures 1 + len//hop == bucket
    target_len = max(target_len, len(audio))
    return np.pad(audio, (0, target_len - len(audio))), n_frames


class LogMelExtractor:
    """reference mel.py:11-72."""

    def __init__(
        self,
        sampling_rate: int,
        fft_size: int = 1024,
        hop_size: int = 256,
        win_length: Optional[int] = None,
        window: str = "hann",
        num_mels: int = 80,
        fmin: Optional[float] = None,
        fmax: Optional[float] = None,
        log_base: Optional[float] = 10.0,
    ):
        self.kw = dict(
            sampling_rate=sampling_rate, fft_size=fft_size, hop_size=hop_size,
            win_length=win_length, num_mels=num_mels,
            fmin=fmin, fmax=fmax, log_base=log_base,
        )

    def __call__(self, audio: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        padded, n_frames = _pad_to_bucket(np.asarray(audio), self.kw["hop_size"])
        mel = np.asarray(logmelfilterbank(jnp.asarray(padded), **self.kw))
        return mel[:n_frames]


class Dio:
    """Pitch extractor with the reference Dio interface (dio.py:21-159):
    continuous log-f0, length adjustment, FastPitch token averaging.
    The core estimator is the jitted NCCF op (ops/pitch.py), not pyworld."""

    def __init__(
        self,
        fs: int = 22050,
        n_fft: int = 1024,
        hop_length: int = 256,
        f0min: float = 80.0,
        f0max: float = 400.0,
        use_token_averaged_f0: bool = True,
        use_continuous_f0: bool = True,
        use_log_f0: bool = True,
        reduction_factor: Optional[int] = 1,
    ):
        self.fs = fs
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.f0min = f0min
        self.f0max = f0max
        self.use_token_averaged_f0 = use_token_averaged_f0
        self.use_continuous_f0 = use_continuous_f0
        self.use_log_f0 = use_log_f0
        self.reduction_factor = reduction_factor or 1

    def __call__(
        self,
        audio: np.ndarray,
        feat_length: Optional[int] = None,
        durations: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        import jax.numpy as jnp

        padded, n_frames = _pad_to_bucket(np.asarray(audio), self.hop_length)
        f0 = np.asarray(
            estimate_f0(
                jnp.asarray(padded), self.fs, self.hop_length,
                frame_length=self.n_fft, f0min=self.f0min, f0max=self.f0max,
            )
        )[:n_frames]
        if (f0 == 0).all():
            logging.warning("All frames seem to be unvoiced.")
        if self.use_continuous_f0:
            f0 = continuous_f0(f0)
        if self.use_log_f0:
            with np.errstate(divide="ignore"):
                f0 = np.where(f0 > 0, np.log(np.maximum(f0, 1e-10)), 0.0)
        if feat_length is not None:
            f0 = adjust_num_frames(f0, feat_length)
        if self.use_token_averaged_f0 and durations is not None:
            d = np.asarray(durations) * self.reduction_factor
            f0 = self._average_by_duration(f0, d)
        return f0.astype(np.float32)

    def _average_by_duration(self, x: np.ndarray, d: np.ndarray) -> np.ndarray:
        """Voiced-only token averaging (reference dio.py:148-159)."""
        assert 0 <= len(x) - d.sum() < self.reduction_factor + 1, f"{len(x)}, {d.sum()}"
        d_cumsum = np.pad(np.cumsum(d).astype(int), (1, 0))
        out = []
        for start, end in zip(d_cumsum[:-1], d_cumsum[1:]):
            seg = x[start:end]
            seg = seg[seg > 0.0]
            out.append(seg.mean() if len(seg) else 0.0)
        return np.asarray(out)


class Energy:
    """reference energy.py:17-122."""

    def __init__(
        self,
        fs: int = 22050,
        n_fft: int = 1024,
        win_length: Optional[int] = None,
        hop_length: int = 256,
        window: str = "hann",
        use_token_averaged_energy: bool = True,
        reduction_factor: Optional[int] = 1,
    ):
        self.fs = fs
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.win_length = win_length
        self.use_token_averaged_energy = use_token_averaged_energy
        self.reduction_factor = reduction_factor or 1

    def __call__(
        self,
        audio: np.ndarray,
        feat_length: Optional[int] = None,
        durations: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        import jax.numpy as jnp

        padded, n_frames = _pad_to_bucket(np.asarray(audio), self.hop_length)
        e = np.asarray(
            energy_op(jnp.asarray(padded), self.n_fft, self.hop_length, self.win_length)
        )[:n_frames]
        if feat_length is not None:
            e = adjust_num_frames(e, feat_length)
        if self.use_token_averaged_energy and durations is not None:
            d = np.asarray(durations) * self.reduction_factor
            e = self._average_by_duration(e, d)
        return e.astype(np.float32)

    def _average_by_duration(self, x: np.ndarray, d: np.ndarray) -> np.ndarray:
        assert 0 <= len(x) - d.sum() < self.reduction_factor + 1
        d_cumsum = np.pad(np.cumsum(d).astype(int), (1, 0))
        out = []
        for start, end in zip(d_cumsum[:-1], d_cumsum[1:]):
            seg = x[start:end]
            seg = seg[seg > 0.0]
            out.append(seg.mean() if len(seg) else 0.0)
        return np.asarray(out)
