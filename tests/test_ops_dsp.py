import jax.numpy as jnp
import numpy as np
import pytest

from jatts_tpu.ops.dsp import (
    energy,
    frame_signal,
    logmelfilterbank,
    mel_filterbank,
    periodic_hann,
    stft_magnitude,
)


def test_frame_count_matches_librosa_convention():
    audio = jnp.zeros(24000)
    frames = frame_signal(audio, 2048, 300)
    assert frames.shape == (1 + 24000 // 300, 2048)


def test_stft_matches_torch_stft():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    audio = rng.normal(size=4096).astype(np.float32)
    got = np.asarray(stft_magnitude(jnp.array(audio), 1024, 256))
    want = (
        torch.stft(
            torch.from_numpy(audio),
            n_fft=1024,
            hop_length=256,
            window=torch.hann_window(1024, periodic=True),
            center=True,
            pad_mode="reflect",
            return_complex=True,
        )
        .abs()
        .numpy()
        .T
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_stft_sine_peak_bin():
    sr, n_fft, hop = 16000, 1024, 256
    f = 1000.0
    t = np.arange(sr) / sr
    audio = np.sin(2 * np.pi * f * t).astype(np.float32)
    spc = np.asarray(stft_magnitude(jnp.array(audio), n_fft, hop))
    peak_bin = spc[10].argmax()
    assert abs(peak_bin - f * n_fft / sr) <= 1


def test_mel_filterbank_properties():
    fb = mel_filterbank(24000, 2048, 80, 80.0, 7600.0)
    assert fb.shape == (80, 1025)
    assert (fb >= 0).all()
    # each filter has nonzero support and slaney norm makes rows integrate ~equal
    assert (fb.sum(axis=1) > 0).all()
    # filters only in [fmin, fmax]
    freqs = np.linspace(0, 12000, 1025)
    active = fb.sum(axis=0) > 0
    assert freqs[active].min() >= 75.0 and freqs[active].max() <= 7650.0


def test_logmel_shapes_and_range():
    rng = np.random.default_rng(1)
    audio = rng.normal(size=24000).astype(np.float32) * 0.1
    mel = np.asarray(
        logmelfilterbank(
            jnp.array(audio), 24000, fft_size=2048, hop_size=300,
            num_mels=80, fmin=80, fmax=7600,
        )
    )
    assert mel.shape == (81, 80)
    assert np.isfinite(mel).all()


def test_energy_positive():
    rng = np.random.default_rng(2)
    audio = rng.normal(size=8000).astype(np.float32)
    e = np.asarray(energy(jnp.array(audio), 1024, 256))
    assert e.shape == (1 + 8000 // 256,)
    assert (e > 0).all()


def test_periodic_hann_matches_torch():
    torch = pytest.importorskip("torch")
    np.testing.assert_allclose(
        periodic_hann(512), torch.hann_window(512, periodic=True).numpy(), atol=1e-6
    )
