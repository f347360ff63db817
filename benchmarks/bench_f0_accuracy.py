"""f0 accuracy benchmark on known-ground-truth synthetic speech.

Quantifies the NCCF-vs-DIO divergence flagged in round 2: since pyworld is
absent from this image, accuracy is measured against signals with exactly
known f0 (tests/test_f0_accuracy.py synthesizer) rather than against DIO
output. Prints one JSON line per condition; results recorded in
docs/f0_accuracy.md.

Run: JAX_PLATFORMS=cpu python benchmarks/bench_f0_accuracy.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from jatts_tpu.ops.pitch import estimate_f0  # noqa: E402
from test_f0_accuracy import SR, HOP, _contour, _metrics, synth_speechlike  # noqa: E402


def main():
    n = SR
    for kind in ("flat", "sweep", "vibrato"):
        for base in (90, 160, 300):
            c = _contour(kind, n, base)
            wav = synth_speechlike(c, seed=base)
            f0 = np.asarray(estimate_f0(wav, SR, HOP, f0min=70.0, f0max=600.0))
            f0r = np.asarray(
                estimate_f0(wav, SR, HOP, f0min=70.0, f0max=600.0, refine=True)
            )
            truth = c[np.clip(np.arange(len(f0)) * HOP, 0, n - 1)]
            vde, gross, rmse = _metrics(f0, truth)
            _, _, rmse_r = _metrics(f0r, truth)
            print(json.dumps({
                "case": f"{kind}_{base}Hz", "snr_db": 25,
                "gross_error_pct": round(gross * 100, 2),
                "fine_rmse_hz": round(rmse, 3),
                "fine_rmse_hz_stonemask": round(rmse_r, 3),
                "voicing_err_pct": round(vde * 100, 2),
            }))
    t = np.arange(n) / SR
    c = 150 + 50 * np.sin(2 * np.pi * 1.5 * t)
    c[int(0.4 * SR) : int(0.55 * SR)] = 0.0
    for snr in (25, 10, 5):
        wav = synth_speechlike(c, snr_db=snr, seed=7)
        f0 = np.asarray(estimate_f0(wav, SR, HOP, f0min=70.0, f0max=600.0))
        truth = c[np.clip(np.arange(len(f0)) * HOP, 0, n - 1)]
        vde, gross, rmse = _metrics(f0, truth)
        print(json.dumps({
            "case": "gap_modulated_150Hz", "snr_db": snr,
            "gross_error_pct": round(gross * 100, 2),
            "fine_rmse_hz": round(rmse, 3),
            "voicing_err_pct": round(vde * 100, 2),
        }))


if __name__ == "__main__":
    main()
