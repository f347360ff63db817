#!/usr/bin/env python3
"""JSUT data preparation (reference egs/jsut/tts1/local/
data_prep_pre_julius.py:19-60 + data_prep_post_julius semantics).

Builds train/dev/test csvs from the JSUT corpus layout
(basic5000/transcript_utf8.txt + wav/). Durations come from forced-alignment
.lab files when present (--labdir, seconds -> frames with rounding-residual
redistribution, reference utils/data_prep_post_julius.py:23-80).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "../../../..")
)

from jatts_tpu.text import g2p_phonemes  # noqa: E402
from jatts_tpu.text.julius import cropped_n_samples, lab_to_row_updates  # noqa: E402
from jatts_tpu.utils.io import write_csv  # noqa: E402


def _wav_n_samples(wav_path, fs):
    import wave

    with wave.open(wav_path, "rb") as w:
        return int(round(w.getnframes() * fs / w.getframerate()))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--db-root", required=True)
    parser.add_argument("--outdir", default="data")
    parser.add_argument("--labdir", default=None, help="forced-alignment .lab dir")
    parser.add_argument("--hop-size", type=int, default=300)
    parser.add_argument("--fs", type=int, default=24000)
    parser.add_argument("--n-dev", type=int, default=250)
    parser.add_argument("--n-test", type=int, default=250)
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
            phonemes = g2p_phonemes(text)
            row = {
                "sample_id": utt,
                "spk": "jsut",
                "wav_path": wav_path,
                "start": "",
                "end": "",
                "original_text": text,
                "phonemes": " ".join(phonemes),
            }
            if args.labdir:
                lab = os.path.join(args.labdir, f"{utt}.lab")
                if os.path.exists(lab):
                    # shared Julius pipeline: phonemes/durations/crop all come
                    # from the alignment (reference data_prep_post_julius)
                    from jatts_tpu.text.julius import parse_lab

                    n_raw = _wav_n_samples(wav_path, args.fs)
                    with open(lab, encoding="utf-8") as f:
                        _, _, ustart, uend = parse_lab(f.read().splitlines())
                    n_samples = cropped_n_samples(ustart, uend, args.fs, n_raw)
                    upd = lab_to_row_updates(lab, n_samples, args.hop_size, args.fs)
                    if upd is not None:
                        row.update(upd)
            rows.append(row)

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
