"""WORLD-comparable eval stack: sp2mc/mc2sp round trip, freqt inverse,
CheapTrick envelope sanity, spc2npow/extfrm exactness vs the reference's
formulas, and end-to-end MCD behavior on synthetic speech-like signals."""

import numpy as np
import pytest

from jatts_tpu.evaluate.dtw_based import calculate_mcd_f0, trim_silence_samples
from jatts_tpu.evaluate.world import (
    cheaptrick,
    extfrm,
    freqt,
    mc2sp,
    sp2mc,
    spc2npow,
)


def test_freqt_inverse_property():
    """Warping then unwarping with enough intermediate order recovers the
    cepstrum exactly (validates the recursion against its definition)."""
    rng = np.random.default_rng(0)
    c = rng.normal(size=(41,)) * (0.8 ** np.arange(41))
    w = freqt(c, 200, 0.466)
    back = freqt(w, 40, -0.466)
    np.testing.assert_allclose(back, c, rtol=0, atol=1e-10)


def test_sp2mc_mc2sp_roundtrip():
    """Full-order sp2mc followed by mc2sp is the identity on smooth spectra
    — pins the c0-halving and one-sided-cepstrum conventions."""
    rng = np.random.default_rng(1)
    fftl = 256
    true_c = np.zeros(fftl // 2 + 1)
    true_c[:6] = rng.normal(size=6) * 0.3
    logsp = np.fft.fft(np.concatenate([true_c, true_c[-2:0:-1]])).real[: fftl // 2 + 1]
    sp = np.exp(logsp)[None]
    mc = sp2mc(sp, order=fftl // 2, alpha=0.42)
    sp2 = mc2sp(mc, 0.42, fftl)
    np.testing.assert_allclose(np.log(sp2), logsp[None], atol=1e-12)


def test_sp2mc_alpha_zero_is_plain_cepstrum():
    """With alpha=0 the mel-cepstrum equals the truncated real cepstrum of
    log sp (c0 halved)."""
    rng = np.random.default_rng(2)
    fftl = 128
    sp = np.exp(rng.normal(size=(fftl // 2 + 1,)) * 0.2)
    mc = sp2mc(sp[None], order=20, alpha=0.0)[0]
    c = np.fft.irfft(np.log(sp))
    c0 = c[: 21].copy()
    c0[0] *= 0.5
    np.testing.assert_allclose(mc, c0, atol=1e-12)


def test_cheaptrick_flat_envelope_for_harmonic_signal():
    """A harmonic signal with equal-amplitude partials has an (approximately)
    flat envelope across the harmonics; CheapTrick must not ring at f0
    multiples (that is exactly what its smoothing+liftering removes)."""
    fs = 24000
    f0 = 200.0
    t = np.arange(fs) / fs
    x = sum(np.sin(2 * np.pi * f0 * k * t) for k in range(1, 20))
    pos = np.arange(0.1, 0.9, 0.005)
    sp = cheaptrick(x, np.full(len(pos), f0), pos, fs)
    assert np.isfinite(sp).all() and (sp > 0).all()
    # envelope sampled at harmonics 2..15 varies by < 10 dB
    freqs = np.arange(513) * fs / 1024
    mid = sp[len(sp) // 2]
    at_harm = [mid[int(round(k * f0 / fs * 1024))] for k in range(2, 16)]
    spread_db = 10 * (np.log10(max(at_harm)) - np.log10(min(at_harm)))
    assert spread_db < 10.0, spread_db


def test_spc2npow_matches_reference_formula():
    """spc2npow vectorization == the reference's per-frame loop
    (signal.py:31-75)."""
    rng = np.random.default_rng(3)
    sp = rng.uniform(0.1, 2.0, size=(7, 65))

    def ref_spvec2pow(v):
        fftl2 = len(v) - 1
        p = v[0] + v[fftl2]
        for k in range(1, fftl2):
            p += 2.0 * v[k]
        return p / (2 * fftl2)

    pw = np.array([ref_spvec2pow(v) for v in sp])
    want = 10.0 * np.log10(pw / pw.mean())
    np.testing.assert_allclose(spc2npow(sp), want, atol=1e-12)

    kept = extfrm(sp, spc2npow(sp), power_threshold=0.0)
    assert 0 < len(kept) < len(sp)


@pytest.mark.slow
def test_mcd_scale_on_synthetic_speech():
    """Identical signals -> MCD ~ 0; formant-shifted signals -> MCD in a
    plausible single-digit-to-low-teens range on the mcep scale (the
    published numbers are 5.6-13); DDUR reflects trimmed length diff."""
    fs = 24000
    rng = np.random.default_rng(4)

    def synth(dur, f0, formant):
        t = np.arange(int(dur * fs)) / fs
        src = np.zeros_like(t)
        for k in range(1, 40):
            if k * f0 < fs / 2:
                src += np.sin(2 * np.pi * k * f0 * t) / k
        # simple one-formant shaping via resonator-ish amplitude modulation
        from scipy.signal import lfilter

        r = 0.97
        w = 2 * np.pi * formant / fs
        b, a = [1 - r], [1, -2 * r * np.cos(w), r * r]
        out = lfilter(b, a, src)
        out = out / np.abs(out).max() * 0.5
        # leading/trailing silence for the trim/DDUR path
        pad = np.zeros(int(0.1 * fs))
        return np.concatenate([pad, out, pad]).astype(np.float64)

    x = synth(1.0, 140.0, 900.0)
    same = calculate_mcd_f0(x, x.copy(), fs)
    assert same["mcd"] < 0.5 and same["ddur"] == 0.0

    y = synth(1.15, 160.0, 1400.0)
    diff = calculate_mcd_f0(x, y, fs)
    assert 2.0 < diff["mcd"] < 25.0, diff
    assert diff["ddur"] > 0.05
    assert np.isfinite(diff["f0rmse"])


def test_trim_silence_samples():
    fs = 24000
    x = np.concatenate(
        [np.zeros(fs // 4), 0.5 * np.sin(np.linspace(0, 800, fs)), np.zeros(fs // 4)]
    )
    kept = trim_silence_samples(x)
    assert abs(kept - fs) < 4096  # within a couple of frames of the tone
