#!/usr/bin/env python3
"""Hi-Fi-Captain (ja, female) tts1 data preparation (reference
egs/hificaptain_jp_female/tts1/local/data_prep_pre_julius.py:19-60):
merges train_parallel + train_non_parallel, builds train/dev/test csvs with
G2P phonemes. Durations come from the shared Julius pipeline when --labdir
is given (jatts_tpu/text/julius.py; reference utils/data_prep_post_julius.py).
"""

from __future__ import annotations

import argparse
import os
import sys
import wave

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

SETS = ["train_parallel", "train_non_parallel", "dev", "eval"]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--db-root", required=True)
    parser.add_argument("--outdir", default="data")
    parser.add_argument("--labdir", default=None, help="julius .lab dir")
    parser.add_argument("--hop-size", type=int, default=512)
    parser.add_argument("--fs", type=int, default=48000)
    args = parser.parse_args()

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
            row = {
                "sample_id": sample_id,
                "spk": "female",
                "wav_path": wav_path,
                "start": "",
                "end": "",
                "original_text": text,
                "phonemes": " ".join(g2p_phonemes(text)),
            }
            if args.labdir:
                lab = os.path.join(args.labdir, f"{sample_id}.lab")
                if os.path.exists(lab):
                    with wave.open(wav_path, "rb") as w:
                        n_raw = int(round(w.getnframes() * args.fs / w.getframerate()))
                    with open(lab, encoding="utf-8") as f:
                        lines = f.read().splitlines()
                    if lines:
                        _, _, ustart, uend = parse_lab(lines)
                        n_samples = cropped_n_samples(ustart, uend, args.fs, n_raw)
                        upd = lab_to_row_updates(lab, n_samples, args.hop_size, args.fs)
                        if upd is not None:
                            row.update(upd)
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
