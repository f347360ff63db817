"""Quantified f0 accuracy on signals with KNOWN ground truth.

The reference extracts f0 with pyworld DIO+StoneMask on CPU
(jatts/modules/feature_extract/dio.py:21-159); our extractor is a batched
on-device NCCF (ops/pitch.py) with the same interface. pyworld is absent
from this image, so the divergence is quantified against synthetic
speech-like signals with exactly known f0 (glottal pulse train + formant
filter + shimmer + noise) instead of against DIO outputs. Measured bounds
(see docs/f0_accuracy.md and benchmarks/bench_f0_accuracy.py):

  gross error rate (>20% off truth)   0.0%        (all cases, SNR >= 10 dB)
  fine RMSE (voiced, within 20%)      0.04-4.3 Hz (flat/sweep/5Hz-vibrato,
                                                   90-300 Hz, SNR 25 dB)
  voicing decision error              <= 4%       (SNR >= 10 dB; boundary
                                                   frames of an 85 ms window)

For the BASELINE F0RMSE metric (~45-50 reported for real TTS systems) an
estimator error of <5 Hz is an order of magnitude below the signal.
"""

import numpy as np
import pytest

from jatts_tpu.ops.pitch import estimate_f0

SR, HOP = 24000, 300


def synth_speechlike(f0_contour, sr=SR, shimmer=0.05, snr_db=25, seed=0):
    """Glottal pulse train -> glottal resonator -> 3 formants + noise.
    ``f0_contour``: per-sample Hz, 0 = unvoiced (replaced by noise)."""
    from scipy.signal import lfilter

    rng = np.random.default_rng(seed)
    n = len(f0_contour)
    phase = np.cumsum(f0_contour / sr)
    x = np.zeros(n)
    onsets = np.where(np.diff(np.floor(phase)) > 0)[0]
    x[onsets] = 1.0 + shimmer * rng.standard_normal(len(onsets))
    x = lfilter([1.0], [1, -1.95, 0.9506], x)  # glottal pulse shaping
    for fc, bw in ((700, 130), (1220, 150), (2600, 200)):
        r = np.exp(-np.pi * bw / sr)
        th = 2 * np.pi * fc / sr
        x = lfilter([1.0], [1, -2 * r * np.cos(th), r * r], x)
    x = x / (np.abs(x).max() + 1e-9)
    noise = rng.standard_normal(n)
    noise *= np.sqrt((x**2).mean()) / np.sqrt((noise**2).mean()) * 10 ** (-snr_db / 20)
    y = x + noise
    unv = f0_contour == 0
    y[unv] = 0.4 * rng.standard_normal(int(unv.sum())) * np.sqrt((x**2).mean())
    return y.astype(np.float32)


def _metrics(f0, truth):
    tv, ev = truth > 0, f0 > 0
    vde = float((tv != ev).mean())
    both = tv & ev
    err = np.abs(f0[both] - truth[both])
    rel = err / truth[both]
    gross = float((rel > 0.2).mean()) if both.any() else 1.0
    fine = err[rel <= 0.2]
    rmse = float(np.sqrt((fine**2).mean())) if len(fine) else float("nan")
    return vde, gross, rmse


def _contour(kind, n, base):
    t = np.arange(n) / SR
    if kind == "flat":
        return np.full(n, float(base))
    if kind == "sweep":
        return base + 0.8 * base * (np.arange(n) / n)
    return base * 1.5 + 0.06 * base * np.sin(2 * np.pi * 5 * t)  # vibrato


@pytest.mark.parametrize("kind", ["flat", "sweep", "vibrato"])
@pytest.mark.parametrize("base", [90, 160, 300])
def test_f0_known_truth_accuracy(kind, base):
    n = SR
    c = _contour(kind, n, base)
    wav = synth_speechlike(c, seed=base)
    f0 = np.asarray(estimate_f0(wav, SR, HOP, f0min=70.0, f0max=600.0))
    truth = c[np.clip(np.arange(len(f0)) * HOP, 0, n - 1)]
    vde, gross, rmse = _metrics(f0, truth)
    assert gross == 0.0, f"gross errors: {gross}"
    assert rmse < 5.0, f"fine RMSE {rmse} Hz"
    assert vde < 0.02, f"voicing errors on fully-voiced signal: {vde}"


def test_stonemask_refine_wins_where_coarse_is_noisy():
    """The opt-in StoneMask stage (ops/pitch.py stonemask_refine, the
    reference's dio.py:110 second stage) must beat the coarse NCCF track
    exactly where coarse error is largest: harmonic tones (lag-quantization
    limited) and low-f0 vibrato (within-frame modulation). Interior frames
    only — boundary frames deliberately keep the coarse value."""
    from jatts_tpu.ops.pitch import stonemask_refine

    inner = slice(4, -4)

    # harmonic-rich steady tone: refinement must cut RMSE several-fold
    true = 110.3
    t = np.arange(2 * SR) / SR
    sig = sum(
        (0.6 / k) * np.sin(2 * np.pi * true * k * t + 0.3 * k) for k in range(1, 5)
    )
    sig += 0.01 * np.random.default_rng(0).standard_normal(len(t))
    wav = sig.astype(np.float32)
    f0c = np.asarray(estimate_f0(wav, SR, HOP, f0min=70.0, f0max=600.0))
    f0r = np.asarray(stonemask_refine(wav, f0c, SR, HOP, f0min=70.0))
    rc = float(np.sqrt(np.mean((f0c[inner] - true) ** 2)))
    rr = float(np.sqrt(np.mean((f0r[inner] - true) ** 2)))
    assert rr < 0.1, f"refined tone RMSE {rr}"
    assert rr < 0.5 * rc, f"refinement did not improve: {rc} -> {rr}"

    # low-f0 vibrato speech-like: refined interior tracking ~2x better
    n = SR
    c = _contour("vibrato", n, 90)
    wav = synth_speechlike(c, seed=90)
    truth = c[np.clip(np.arange(1 + n // HOP) * HOP, 0, n - 1)]
    f0c = np.asarray(estimate_f0(wav, SR, HOP, f0min=70.0, f0max=600.0))
    f0r = np.asarray(stonemask_refine(wav, f0c, SR, HOP, f0min=70.0))
    rc = float(np.sqrt(np.mean((f0c[inner] - truth[inner]) ** 2)))
    rr = float(np.sqrt(np.mean((f0r[inner] - truth[inner]) ** 2)))
    assert rr < 0.5, f"refined vibrato RMSE {rr}"
    assert rr < rc, f"refinement did not improve vibrato: {rc} -> {rr}"

    # unvoiced frames must stay unvoiced through refinement
    assert ((f0c == 0) == (f0r == 0)).all()


@pytest.mark.parametrize("snr_db", [25, 10])
def test_f0_voicing_decision_with_unvoiced_gap(snr_db):
    n = SR
    t = np.arange(n) / SR
    c = 150 + 50 * np.sin(2 * np.pi * 1.5 * t)
    c[int(0.4 * SR) : int(0.55 * SR)] = 0.0  # fricative-like gap
    wav = synth_speechlike(c, snr_db=snr_db, seed=7)
    f0 = np.asarray(estimate_f0(wav, SR, HOP, f0min=70.0, f0max=600.0))
    truth = c[np.clip(np.arange(len(f0)) * HOP, 0, n - 1)]
    vde, gross, rmse = _metrics(f0, truth)
    assert gross == 0.0
    assert rmse < 5.0
    # 85 ms analysis window -> ~3 boundary frames of a 150 ms gap ambiguous
    assert vde <= 0.06, f"voicing decision error {vde}"
