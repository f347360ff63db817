#!/usr/bin/env python3
"""Build per-speaker conf/f0.yaml from f0 percentiles
(reference egs/jvs/tts1/local/prepare_f0_range.py:22-35) using the jitted
NCCF f0 op."""

from __future__ import annotations

import argparse
import os
import sys
from collections import defaultdict

import numpy as np
import yaml

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "../../../..")
)

from jatts_tpu.ops.pitch import estimate_f0  # noqa: E402
from jatts_tpu.utils.io import read_audio, read_csv  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--csv", required=True)
    parser.add_argument("--out", default="conf/f0.yaml")
    parser.add_argument("--sampling-rate", type=int, default=24000)
    parser.add_argument("--hop-size", type=int, default=300)
    parser.add_argument("--n-per-spk", type=int, default=20)
    args = parser.parse_args()

    import jax.numpy as jnp

    rows, _ = read_csv(args.csv, dict_reader=True)
    per_spk = defaultdict(list)
    for row in rows:
        per_spk[row["spk"]].append(row)

    ranges = {}
    for spk, spk_rows in sorted(per_spk.items()):
        f0s = []
        for row in spk_rows[: args.n_per_spk]:
            wav, _ = read_audio(row["wav_path"], args.sampling_rate)
            f0 = np.asarray(
                estimate_f0(jnp.asarray(wav), args.sampling_rate, args.hop_size,
                            f0min=40.0, f0max=800.0)
            )
            f0s.append(f0[f0 > 0])
        f0s = np.concatenate(f0s) if f0s else np.zeros(1)
        if f0s.size == 0:
            # all clips unvoiced (len-0 after the f0>0 filter): percentile
            # would raise on a zero-size array — fall back to full range
            f0s = np.zeros(1)
        # generous margins around the 1st/99th percentiles
        ranges[spk] = {
            "f0min": int(max(np.percentile(f0s, 1) * 0.8, 40)),
            "f0max": int(min(np.percentile(f0s, 99) * 1.2, 800)),
        }
        print(spk, ranges[spk])
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        yaml.dump(ranges, f)


if __name__ == "__main__":
    main()
