#!/usr/bin/env python3
"""Regenerate test-set phonemes in Julius format — test utterances have no
forced alignment, so phonemes come straight from G2P (reference
utils/data_prep_post_for_test_set.py:18-45)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from jatts_tpu.text.julius import julius_transcript  # noqa: E402
from jatts_tpu.utils.io import read_csv, write_csv  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--original_csv", required=True)
    parser.add_argument("--out", required=True)
    args = parser.parse_args()

    rows, _ = read_csv(args.original_csv, dict_reader=True)
    out_rows = []
    for row in rows:
        new_row = dict(row)
        new_row["phonemes"] = julius_transcript(row["original_text"])
        out_rows.append(new_row)
    write_csv(out_rows, args.out)
    print(f"wrote {len(out_rows)} rows -> {args.out}")


if __name__ == "__main__":
    main()
