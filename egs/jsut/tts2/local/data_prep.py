#!/usr/bin/env python3
"""JSUT tts2 data preparation (reference egs/jsut/tts2/local/data_prep.py:26-90):
implicit-alignment recipe — no durations; adds energy-based silence trim
start/end columns (the reference uses librosa.effects.trim) and G2P phonemes.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "../../../..")
)

from jatts_tpu.text import g2p_phonemes  # noqa: E402
from jatts_tpu.utils.io import read_audio, write_csv  # noqa: E402


def trim_silence(wav: np.ndarray, sr: int, top_db: float = 30.0, frame: int = 2048, hop: int = 512):
    """librosa.effects.trim-style energy trim -> (start_s, end_s)."""
    if len(wav) < frame:
        return 0.0, len(wav) / sr
    n = 1 + (len(wav) - frame) // hop
    idx = np.arange(n)[:, None] * hop + np.arange(frame)[None, :]
    rms = np.sqrt((wav[idx] ** 2).mean(axis=1) + 1e-12)
    db = 20 * np.log10(rms / max(rms.max(), 1e-12))
    keep = np.where(db > -top_db)[0]
    if len(keep) == 0:
        return 0.0, len(wav) / sr
    start = keep[0] * hop / sr
    end = min(keep[-1] * hop + frame, len(wav)) / sr
    return start, end


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--db-root", required=True)
    parser.add_argument("--outdir", default="data")
    parser.add_argument("--n-dev", type=int, default=250)
    parser.add_argument("--n-test", type=int, default=250)
    parser.add_argument("--sampling-rate", type=int, default=24000)
    args = parser.parse_args()

    transcript = os.path.join(args.db_root, "basic5000", "transcript_utf8.txt")
    wavdir = os.path.join(args.db_root, "basic5000", "wav")
    rows = []
    with open(transcript, encoding="utf-8") as f:
        for line in f:
            utt, text = line.strip().split(":", 1)
            wav_path = os.path.join(wavdir, f"{utt}.wav")
            if not os.path.exists(wav_path):
                continue
            wav, sr = read_audio(wav_path, args.sampling_rate)
            start, end = trim_silence(wav, sr)
            rows.append(
                {
                    "sample_id": utt,
                    "spk": "jsut",
                    "wav_path": wav_path,
                    "start": f"{start:.3f}",
                    "end": f"{end:.3f}",
                    "original_text": text,
                    "phonemes": " ".join(g2p_phonemes(text)),
                }
            )

    os.makedirs(args.outdir, exist_ok=True)
    test = rows[: args.n_test]
    dev = rows[args.n_test : args.n_test + args.n_dev]
    train = rows[args.n_test + args.n_dev :]
    write_csv(train, os.path.join(args.outdir, "train.csv"))
    write_csv(dev, os.path.join(args.outdir, "dev.csv"))
    write_csv(test, os.path.join(args.outdir, "test.csv"))
    print(f"train/dev/test = {len(train)}/{len(dev)}/{len(test)}")


if __name__ == "__main__":
    main()
