import jax.numpy as jnp
import numpy as np

from jatts_tpu.features.extractors import Dio
from jatts_tpu.ops.pitch import continuous_f0, estimate_f0


def _tone(f0, sr=24000, dur=0.5):
    t = np.arange(int(sr * dur)) / sr
    return np.sin(2 * np.pi * f0 * t).astype(np.float32)


def test_f0_pure_tone():
    for f in [100.0, 220.0, 330.0]:
        audio = _tone(f)
        f0 = np.asarray(estimate_f0(jnp.asarray(audio), 24000, 300))
        mid = f0[5:-5]
        voiced = mid[mid > 0]
        assert len(voiced) > 0.9 * len(mid)
        np.testing.assert_allclose(np.median(voiced), f, rtol=0.03)


def test_f0_unvoiced_noise_and_silence():
    rng = np.random.default_rng(0)
    silence = np.zeros(12000, np.float32)
    f0 = np.asarray(estimate_f0(jnp.asarray(silence), 24000, 300))
    assert (f0 == 0).all()
    noise = rng.normal(size=12000).astype(np.float32)
    f0n = np.asarray(estimate_f0(jnp.asarray(noise), 24000, 300))
    assert (f0n > 0).mean() < 0.5  # mostly unvoiced


def test_continuous_f0_interp():
    f0 = np.array([0, 0, 100, 0, 0, 200, 0], float)
    c = continuous_f0(f0)
    assert c[0] == 100 and c[-1] == 200
    np.testing.assert_allclose(c[2:6], [100, 100 + 100 / 3, 100 + 200 / 3, 200])


def test_dio_extractor_token_average():
    # single steady tone split into two tokens: both token averages ≈ f0
    audio = _tone(150, dur=0.5)
    dio = Dio(fs=24000, n_fft=2048, hop_length=300, f0min=40, f0max=400)
    n_frames = 1 + len(audio) // 300
    durations = np.array([n_frames // 2, n_frames - n_frames // 2])
    lf0 = dio(audio, feat_length=n_frames, durations=durations)
    assert lf0.shape == (2,)
    np.testing.assert_allclose(np.exp(lf0[0]), 150, rtol=0.05)
    np.testing.assert_allclose(np.exp(lf0[1]), 150, rtol=0.05)


def test_f0_glottal_pulse_train_with_vibrato():
    """Speech-like signal (impulse train through a 2-formant resonator, f0
    gliding 120->180 Hz with vibrato): the NCCF tracker must follow the true
    contour within ~5% on voiced frames. This quantifies the divergence risk
    of using NCCF instead of the reference's DIO on realistic (non-sinusoid)
    excitation — pyworld is absent in-image, so the contract is accuracy
    against ground truth rather than DIO output."""
    import scipy.signal

    sr, hop = 24000, 300
    dur = 1.0
    n = int(sr * dur)
    t = np.arange(n) / sr
    f0_true_t = 120.0 + 60.0 * t + 4.0 * np.sin(2 * np.pi * 5.0 * t)
    phase = 2 * np.pi * np.cumsum(f0_true_t) / sr
    # glottal-ish excitation: rectified + sharpened periodic pulses
    exc = np.maximum(0.0, np.sin(phase)) ** 8
    # two formant resonators (500 Hz, 1500 Hz)
    sig = exc
    for fc, bw in ((500.0, 80.0), (1500.0, 120.0)):
        r = np.exp(-np.pi * bw / sr)
        theta = 2 * np.pi * fc / sr
        b0 = np.array([1.0], np.float64)
        a = np.array([1.0, -2 * r * np.cos(theta), r * r], np.float64)
        sig = scipy.signal.lfilter(b0, a, sig)
    sig = (sig / np.abs(sig).max() * 0.5).astype(np.float32)

    f0 = np.asarray(estimate_f0(jnp.asarray(sig), sr, hop, f0min=70, f0max=400))
    centers = np.arange(len(f0)) * hop / sr
    f0_true = 120.0 + 60.0 * centers + 4.0 * np.sin(2 * np.pi * 5.0 * centers)
    sel = (centers > 0.05) & (centers < dur - 0.05)
    voiced = sel & (f0 > 0)
    assert voiced.sum() > 0.8 * sel.sum(), "tracker lost voicing"
    rel_err = np.abs(f0[voiced] - f0_true[voiced]) / f0_true[voiced]
    # median within 3%, and few gross octave errors
    assert np.median(rel_err) < 0.03, np.median(rel_err)
    assert (rel_err > 0.2).mean() < 0.1, (rel_err > 0.2).mean()
