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
from jatts_tpu.text.julius import (  # noqa: E402
    cropped_n_samples,
    lab_to_row_updates,
    parse_lab,
)
from jatts_tpu.utils.io import write_csv  # noqa: E402


def _wav_n_samples(wav_path, fs):
    import wave

    with wave.open(wav_path, "rb") as w:
        return int(round(w.getnframes() * fs / w.getframerate()))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--db-root", required=True)
    parser.add_argument("--outdir", default="data")
    parser.add_argument("--dev-per-spk", type=int, default=3)
    parser.add_argument("--test-per-spk", type=int, default=3)
    parser.add_argument(
        "--labdir", default=None,
        help="forced-alignment .lab dir (<spk>_<utt>.lab) — required for the "
        "external-duration FastSpeech2 conf; MAS confs train without it",
    )
    parser.add_argument("--hop-size", type=int, default=300)
    parser.add_argument("--fs", type=int, default=24000)
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
                row = {
                    "sample_id": f"{spk}_{utt}",
                    "spk": spk,
                    "wav_path": wav_path,
                    "start": "",
                    "end": "",
                    "original_text": text,
                    "phonemes": " ".join(g2p_phonemes(text)),
                    "ref_wav_path": "",
                }
                if args.labdir:
                    lab = os.path.join(args.labdir, f"{spk}_{utt}.lab")
                    if os.path.exists(lab):
                        # Julius alignment -> phonemes/durations/crop (same
                        # shared pipeline as egs/jsut/tts1)
                        n_raw = _wav_n_samples(wav_path, args.fs)
                        with open(lab, encoding="utf-8") as lf:
                            _, _, ustart, uend = parse_lab(lf.read().splitlines())
                        n_samples = cropped_n_samples(
                            ustart, uend, args.fs, n_raw
                        )
                        upd = lab_to_row_updates(
                            lab, n_samples, args.hop_size, args.fs
                        )
                        if upd is not None:
                            row.update(upd)
                rows.append(row)
        if not rows:
            continue
        n_held = args.test_per_spk + args.dev_per_spk
        # spkemb reference must come from the TRAIN slice: rows[0] lands in
        # the test split, so using it leaked held-out audio into training
        # features (and made "held-out" decoding condition on itself)
        ref_wav = rows[n_held]["wav_path"] if len(rows) > n_held else rows[-1]["wav_path"]
        for r in rows:
            r["ref_wav_path"] = ref_wav
        test.extend(rows[: args.test_per_spk])
        dev.extend(rows[args.test_per_spk : n_held])
        train.extend(rows[n_held:])

    os.makedirs(args.outdir, exist_ok=True)
    write_csv(train, os.path.join(args.outdir, "train.csv"))
    write_csv(dev, os.path.join(args.outdir, "dev.csv"))
    write_csv(test, os.path.join(args.outdir, "test.csv"))
    print(f"train/dev/test = {len(train)}/{len(dev)}/{len(test)}")


if __name__ == "__main__":
    main()
