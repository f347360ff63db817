#!/usr/bin/env python3
"""DSP feature-extraction throughput on one chip: jitted log-mel + NCCF f0 +
energy (the whole stage-1 hot path) vs the reference's CPU numpy pipeline
model (librosa STFT ~20-80x realtime/core; pyworld DIO ~5-20x realtime/core).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from jatts_tpu.ops.dsp import energy, logmelfilterbank
    from jatts_tpu.ops.pitch import estimate_f0

    sr, hop, n_fft = 24000, 300, 2048
    seconds = 60.0
    audio = np.random.default_rng(0).normal(size=int(sr * seconds)).astype(np.float32) * 0.1
    a = jnp.asarray(audio)

    def run_all(a):
        mel = logmelfilterbank(a, sr, fft_size=n_fft, hop_size=hop, num_mels=80,
                               fmin=80, fmax=7600)
        f0 = estimate_f0(a, sr, hop, frame_length=n_fft, f0min=40, f0max=400)
        e = energy(a, n_fft, hop)
        return mel, f0, e

    import jax

    mel, f0, e = run_all(a)  # compile
    float(mel.sum() + f0.sum() + e.sum())  # host fetch barrier
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        mel, f0, e = run_all(a)
        chk = float(mel.sum() + f0.sum() + e.sum())
    dt = (time.perf_counter() - t0) / n
    xrt = seconds / dt
    print(
        f"stage-1 DSP (mel+f0+energy, {seconds:.0f}s audio): {dt * 1e3:.1f} ms "
        f"= {xrt:.0f}x realtime on one chip"
    )


if __name__ == "__main__":
    main()
