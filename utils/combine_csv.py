#!/usr/bin/env python3
"""Combine csv shards (reference utils/combine_csv.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from jatts_tpu.utils.io import read_csv, write_csv  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("csvs", nargs="+")
    parser.add_argument("--out", required=True)
    args = parser.parse_args()
    rows, fieldnames = [], None
    for path in args.csvs:
        r, f = read_csv(path, dict_reader=True)
        rows.extend(r)
        fieldnames = fieldnames or f
    write_csv(rows, args.out, fieldnames)


if __name__ == "__main__":
    main()
