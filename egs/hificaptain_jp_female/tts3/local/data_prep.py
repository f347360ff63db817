#!/usr/bin/env python3
"""VALL-E data preparation (reference egs/hificaptain_jp_female/tts3/local/
data_prep.py:103-111): builds csv rows with phonemes and assigns each
utterance a RANDOM TRAIN utterance as the speaker prompt."""

from __future__ import annotations

import argparse
import os
import random
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "../../../..")
)

from jatts_tpu.text import g2p_phonemes  # noqa: E402
from jatts_tpu.utils.io import find_files, write_csv  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--db-root", required=True)
    parser.add_argument("--transcript", required=True, help="utt:text lines")
    parser.add_argument("--outdir", default="data")
    parser.add_argument("--n-dev", type=int, default=100)
    parser.add_argument("--n-test", type=int, default=100)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    wavs = {
        os.path.splitext(os.path.basename(p))[0]: p
        for p in find_files(args.db_root, "*.wav")
    }
    rows = []
    with open(args.transcript, encoding="utf-8") as f:
        for line in f:
            if ":" not in line:
                continue
            utt, text = line.strip().split(":", 1)
            if utt not in wavs:
                continue
            rows.append(
                {
                    "sample_id": utt,
                    "spk": "hfc_female",
                    "wav_path": wavs[utt],
                    "start": "",
                    "end": "",
                    "original_text": text,
                    "phonemes": " ".join(g2p_phonemes(text)),
                }
            )

    rng = random.Random(args.seed)
    test = rows[: args.n_test]
    dev = rows[args.n_test : args.n_test + args.n_dev]
    train = rows[args.n_test + args.n_dev :]
    # each utterance gets a random TRAIN utterance as prompt (reference
    # "given" strategy)
    for subset in (train, dev, test):
        for r in subset:
            p = rng.choice(train)
            r["prompt_wav_path"] = p["wav_path"]
            r["prompt_phonemes"] = p["phonemes"]

    os.makedirs(args.outdir, exist_ok=True)
    write_csv(train, os.path.join(args.outdir, "train.csv"))
    write_csv(dev, os.path.join(args.outdir, "dev.csv"))
    write_csv(test, os.path.join(args.outdir, "test.csv"))
    print(f"train/dev/test = {len(train)}/{len(dev)}/{len(test)}")


if __name__ == "__main__":
    main()
