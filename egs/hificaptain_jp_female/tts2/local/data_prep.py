#!/usr/bin/env python3
"""Hi-Fi-Captain (ja, female) tts2 data preparation (reference
egs/hificaptain_jp_female/tts2/local/data_prep.py:20-95): implicit-alignment
recipe — energy-based silence trim start/end, G2P phonemes, and a random
training utterance assigned as the prompt for each eval sample (used by the
E2-TTS infill decode)."""

from __future__ import annotations

import argparse
import os
import random
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "../../../..")
)

from jatts_tpu.text import g2p_phonemes  # noqa: E402
from jatts_tpu.utils.io import read_audio, write_csv  # noqa: E402

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "../../../jsut/tts2/local")
)
from data_prep import trim_silence  # noqa: E402  (shared energy trim)

SETS = ["train_parallel", "train_non_parallel", "dev", "eval"]
# reference trim settings (data_prep.py:22-24), scaled to 48 kHz
TRIM_TOP_DB = 40.0
TRIM_FRAME = 4096
TRIM_HOP = 600


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--db-root", required=True)
    parser.add_argument("--outdir", default="data")
    parser.add_argument("--sampling-rate", type=int, default=48000)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    random.seed(args.seed)

    texts = {}
    for _set in SETS:
        path = os.path.join(args.db_root, "text", f"{_set}.txt")
        with open(path, encoding="utf-8") as f:
            lines = f.read().splitlines()
        texts[_set] = {ln.split(" ")[0]: ln.split(" ", 1)[1] for ln in lines if ln}

    splits = {"train": [], "dev": [], "test": []}
    for _set in SETS:
        split = "train" if _set.startswith("train") else (
            "dev" if _set == "dev" else "test"
        )
        for sample_id, text in texts[_set].items():
            wav_path = os.path.join(args.db_root, "wav", _set, sample_id + ".wav")
            if not os.path.exists(wav_path):
                continue
            wav, sr = read_audio(wav_path, args.sampling_rate)
            start, end = trim_silence(
                wav, sr, top_db=TRIM_TOP_DB, frame=TRIM_FRAME, hop=TRIM_HOP
            )
            row = {
                "sample_id": sample_id,
                "spk": "female",
                "wav_path": wav_path,
                "start": f"{start:.4f}",
                "end": f"{end:.4f}",
                "original_text": text,
                "phonemes": " ".join(g2p_phonemes(text)),
            }
            if split == "test" and splits["train"]:
                # random training utterance as prompt (reference :75-82)
                p = random.choice(splits["train"])
                for k in ("sample_id", "wav_path", "original_text", "phonemes",
                          "start", "end"):
                    row[f"prompt_{k}"] = p[k]
            splits[split].append(row)

    os.makedirs(args.outdir, exist_ok=True)
    for name, rows in splits.items():
        write_csv(rows, os.path.join(args.outdir, f"{name}.csv"))
    print(
        "train/dev/test = "
        f"{len(splits['train'])}/{len(splits['dev'])}/{len(splits['test'])}"
    )


if __name__ == "__main__":
    main()
