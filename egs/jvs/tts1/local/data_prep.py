#!/usr/bin/env python3
"""JVS multi-speaker data preparation (reference egs/jvs/tts2/local/
data_prep.py:43-99): walks jvs001..jvs100 parallel100 transcripts, emits csv
rows with spk column and a per-speaker reference wav for spkemb extraction.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "../../../..")
)

from jatts_tpu.text import g2p_phonemes  # noqa: E402
from jatts_tpu.utils.io import write_csv  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--db-root", required=True)
    parser.add_argument("--outdir", default="data")
    parser.add_argument("--dev-per-spk", type=int, default=3)
    parser.add_argument("--test-per-spk", type=int, default=3)
    args = parser.parse_args()

    train, dev, test = [], [], []
    for spk in sorted(os.listdir(args.db_root)):
        spk_dir = os.path.join(args.db_root, spk, "parallel100")
        transcript = os.path.join(spk_dir, "transcripts_utf8.txt")
        wavdir = os.path.join(spk_dir, "wav24kHz16bit")
        if not os.path.exists(transcript):
            continue
        rows = []
        with open(transcript, encoding="utf-8") as f:
            for line in f:
                if ":" not in line:
                    continue
                utt, text = line.strip().split(":", 1)
                wav_path = os.path.join(wavdir, f"{utt}.wav")
                if not os.path.exists(wav_path):
                    continue
                rows.append(
                    {
                        "sample_id": f"{spk}_{utt}",
                        "spk": spk,
                        "wav_path": wav_path,
                        "start": "",
                        "end": "",
                        "original_text": text,
                        "phonemes": " ".join(g2p_phonemes(text)),
                        "ref_wav_path": "",
                    }
                )
        if not rows:
            continue
        # first utterance as spkemb reference for held-out decoding
        for r in rows:
            r["ref_wav_path"] = rows[0]["wav_path"]
        test.extend(rows[: args.test_per_spk])
        dev.extend(rows[args.test_per_spk : args.test_per_spk + args.dev_per_spk])
        train.extend(rows[args.test_per_spk + args.dev_per_spk :])

    os.makedirs(args.outdir, exist_ok=True)
    write_csv(train, os.path.join(args.outdir, "train.csv"))
    write_csv(dev, os.path.join(args.outdir, "dev.csv"))
    write_csv(test, os.path.join(args.outdir, "test.csv"))
    print(f"train/dev/test = {len(train)}/{len(dev)}/{len(test)}")


if __name__ == "__main__":
    main()
