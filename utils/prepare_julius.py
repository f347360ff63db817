#!/usr/bin/env python3
"""Prepare kana transcripts for the Julius segmentation kit
(reference utils/prepare_julius.py:23-31): text -> kana (pyopenjtalk-gated)
-> hiragana -> space-separated, one file per utterance.

The Julius binary itself is external (reference utils/run_julius.sh:29-39
drives segment_julius.pl); this prepares its inputs and
egs/jsut/tts1/local/data_prep.py:lab_to_durations consumes its .lab outputs.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from jatts_tpu.text.julius import julius_transcript  # noqa: E402
from jatts_tpu.utils.io import read_csv  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--csv", required=True)
    parser.add_argument("--outdir", required=True)
    args = parser.parse_args()
    rows, _ = read_csv(args.csv, dict_reader=True)
    os.makedirs(args.outdir, exist_ok=True)
    for row in rows:
        with open(
            os.path.join(args.outdir, f"{row['sample_id']}.txt"), "w",
            encoding="utf-8",
        ) as f:
            f.write(julius_transcript(row["original_text"]) + "\n")
    print(f"prepared {len(rows)} transcripts")


if __name__ == "__main__":
    main()
