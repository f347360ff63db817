"""Fit per-feature mean/scale over the train set -> stats.h5
(reference jatts/bin/compute_statistics.py:66-110)."""

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
import logging

import numpy as np
import yaml

from jatts_tpu.utils.io import read_csv, read_hdf5, write_hdf5


def main():
    parser = argparse.ArgumentParser(description="Compute statistics (stage 1).")
    parser.add_argument("--csv", required=True)
    parser.add_argument("--config", required=True)
    parser.add_argument("--out", required=True, help="output stats.h5")
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()
    logging.basicConfig(
        force=True,
        level=logging.INFO if args.verbose > 0 else logging.WARNING)

    with open(args.config) as f:
        config = yaml.load(f, Loader=yaml.SafeLoader)
    feat_list = [f for f in config.get("feat_list", ["mel"]) if not f.startswith("encodec")]

    rows, _ = read_csv(args.csv, dict_reader=True)
    # streaming mean/var (sklearn StandardScaler.partial_fit equivalent)
    sums = {f: None for f in feat_list}
    sqs = {f: None for f in feat_list}
    counts = {f: 0 for f in feat_list}
    for row in rows:
        for feat in feat_list:
            x = np.asarray(read_hdf5(row["feat_path"], feat), dtype=np.float64)
            if x.ndim == 1:
                x = x[:, None]
            if sums[feat] is None:
                sums[feat] = x.sum(0)
                sqs[feat] = (x**2).sum(0)
            else:
                sums[feat] += x.sum(0)
                sqs[feat] += (x**2).sum(0)
            counts[feat] += len(x)
    for feat in feat_list:
        mean = sums[feat] / counts[feat]
        var = sqs[feat] / counts[feat] - mean**2
        scale = np.sqrt(np.maximum(var, 1e-12))
        write_hdf5(args.out, f"{feat}_mean", mean.astype(np.float32))
        write_hdf5(args.out, f"{feat}_scale", scale.astype(np.float32))
        logging.info(f"{feat}: n={counts[feat]} mean[0]={mean.flat[0]:.4f}")


if __name__ == "__main__":
    main()
