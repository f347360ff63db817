#!/usr/bin/env python3
"""Regenerate test-set phonemes in Julius format — test utterances have no
forced alignment, so phonemes come straight from G2P (reference
utils/data_prep_post_for_test_set.py:18-45)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from jatts_tpu.text.japanese import kana_to_phonemes, text_to_kana  # noqa: E402
from jatts_tpu.utils.io import read_csv, write_csv  # noqa: E402


def _g2p_julius_format(text: str) -> str:
    """text -> 'k o N ... sp ...' — space-separated PHONEME tokens with 'sp'
    at pauses, matching what the train csvs carry from the .lab files
    (reference: pyopenjtalk kana -> jaconv.hiragana2julius, :36-41).
    julius_transcript() is the aligner-INPUT (kana chunks), NOT phonemes —
    using it here made every test token an <unk>."""
    kana = text_to_kana(text).replace("。", "").replace("’", "")
    chunks = [c for c in kana.split("、") if c]
    parts = []
    for i, chunk in enumerate(chunks):
        if i:
            parts.append("sp")
        parts.extend(kana_to_phonemes(chunk))
    return " ".join(parts)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--original_csv", required=True)
    parser.add_argument("--out", required=True)
    args = parser.parse_args()

    rows, _ = read_csv(args.original_csv, dict_reader=True)
    out_rows = []
    for row in rows:
        new_row = dict(row)
        new_row["phonemes"] = _g2p_julius_format(row["original_text"])
        out_rows.append(new_row)
    write_csv(out_rows, args.out)
    print(f"wrote {len(out_rows)} rows -> {args.out}")


if __name__ == "__main__":
    main()
