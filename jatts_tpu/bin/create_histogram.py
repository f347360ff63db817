"""F0 histogram plots per speaker to pick f0min/f0max
(reference jatts/bin/create_histogram.py:20-152) — uses the jitted NCCF f0
op instead of pyworld."""

from __future__ import annotations

import os as _os
import sys as _sys

# allow direct execution (python jatts_tpu/bin/<tool>.py) from anywhere
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

# persistent XLA compile cache: CLI stages are separate processes; without
# this every stage repays full compilation
import jax as _jax

if not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    # default persistent cache; an env override wins (e.g. tests point it at
    # the committed suite cache -- stale AOT entries compiled on another
    # machine load-fail loudly and slowly, see CLAUDE.md)
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.path.expanduser("~/.cache/jatts_tpu/xla"),
    )
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import argparse
import os
from collections import defaultdict

import numpy as np

from jatts_tpu.ops.pitch import estimate_f0
from jatts_tpu.utils.io import read_audio, read_csv


def main():
    parser = argparse.ArgumentParser(description="Create f0 histograms.")
    parser.add_argument("--csv", required=True)
    parser.add_argument("--outdir", required=True)
    parser.add_argument("--sampling-rate", type=int, default=24000)
    parser.add_argument("--hop-size", type=int, default=300)
    parser.add_argument("--n-per-spk", type=int, default=50)
    args = parser.parse_args()

    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows, _ = read_csv(args.csv, dict_reader=True)
    per_spk = defaultdict(list)
    for row in rows:
        per_spk[row.get("spk", "all")].append(row)

    os.makedirs(args.outdir, exist_ok=True)
    for spk, spk_rows in per_spk.items():
        f0s = []
        for row in spk_rows[: args.n_per_spk]:
            wav, _ = read_audio(row["wav_path"], args.sampling_rate)
            f0 = np.asarray(
                estimate_f0(
                    jnp.asarray(wav), args.sampling_rate, args.hop_size,
                    f0min=40.0, f0max=800.0,
                )
            )
            f0s.append(f0[f0 > 0])
        f0s = np.concatenate(f0s) if f0s else np.zeros(0)
        fig, ax = plt.subplots()
        ax.hist(f0s, bins=100, range=(0, 800))
        ax.set_title(f"{spk} f0 histogram (n={len(f0s)})")
        ax.set_xlabel("f0 [Hz]")
        fig.savefig(os.path.join(args.outdir, f"{spk}_f0_histogram.png"))
        plt.close(fig)
        if len(f0s):
            print(
                f"{spk}: p01={np.percentile(f0s, 1):.0f} "
                f"p99={np.percentile(f0s, 99):.0f}"
            )


if __name__ == "__main__":
    main()
