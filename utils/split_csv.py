#!/usr/bin/env python3
"""Split a csv into N shards (reference utils/split_csv.py:15-29)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from jatts_tpu.utils.io import read_csv, write_csv  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("csv")
    parser.add_argument("outdir")
    parser.add_argument("--n", type=int, required=True)
    args = parser.parse_args()
    rows, fieldnames = read_csv(args.csv, dict_reader=True)
    os.makedirs(args.outdir, exist_ok=True)
    for i in range(args.n):
        shard = rows[i :: args.n]
        if shard:
            write_csv(shard, os.path.join(args.outdir, f"{i + 1}.csv"), fieldnames)


if __name__ == "__main__":
    main()
