#!/usr/bin/env python3
"""Apply Julius segmentation results (.lab) to a csv: crop boundaries,
phonemes, frame durations (reference utils/data_prep_post_julius.py:82-148;
the seconds->frames math lives in jatts_tpu/text/julius.py and is
unit-tested against the reference implementation)."""

import argparse
import os
import sys
import wave

import yaml

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from jatts_tpu.text.julius import cropped_n_samples, post_process_csv_rows  # noqa: E402
from jatts_tpu.utils.io import read_csv, write_csv  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--juliusdir", required=True, help="julius .lab dir")
    parser.add_argument("--original_csv", required=True)
    parser.add_argument("--conf", required=True, help="config (fs + hop_size)")
    parser.add_argument("--out", required=True)
    args = parser.parse_args()

    with open(args.conf) as f:
        config = yaml.safe_load(f)
    hop_size, fs = config["hop_size"], config["sampling_rate"]

    rows, _ = read_csv(args.original_csv, dict_reader=True)

    def n_samples_fn(row):
        with wave.open(row["wav_path"], "rb") as w:
            wav_len = w.getnframes()
            wav_fs = w.getframerate()
        # crop length at the feature-extraction rate fs
        return cropped_n_samples(
            row.get("start", ""), row.get("end", ""), fs,
            int(round(wav_len * fs / wav_fs)),
        )

    out_rows = post_process_csv_rows(rows, args.juliusdir, hop_size, fs, n_samples_fn)
    write_csv(out_rows, args.out)
    print(f"wrote {len(out_rows)}/{len(rows)} rows -> {args.out}")


if __name__ == "__main__":
    main()
