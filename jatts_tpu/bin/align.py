"""Stage-0 native forced alignment: fill csv ``durations`` (+ start/end crop)
with no external aligner.

Replaces the reference's Julius sub-pipeline (utils/run_julius.sh:29-39 +
in-tree HMM models utils/julius_models/ + utils/data_prep_post_julius.py):
trains the in-framework aligner (jatts_tpu/aligner.py — AlignmentModule +
ForwardSum CTC + batched Pallas MAS Viterbi) on the corpus's (phoneme, mel)
pairs and rewrites each csv with per-token frame durations whose sum matches
the mel frame count bin/preprocess.py asserts.

Usage (tts1 stage 0, after local/data_prep.py when no --labdir is given):

    python align.py --csv data/train.csv data/dev.csv data/test.csv \\
        --config conf/fastspeech2.v1.yaml --outdir exp/aligner

Forced alignment is transductive: every csv (train+dev+test) is used for
training AND gets durations — the same contract as running Julius over every
split.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import jax as _jax

if not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.path.expanduser("~/.cache/jatts_tpu/xla"),
    )
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import argparse
import json
import logging
import os

import numpy as np
import yaml

from jatts_tpu.aligner import (
    Aligner,
    build_vocab,
    dump_durations,
    make_batches,
    normalize_mels,
    prepare_item,
    row_updates_from_durations,
    train_aligner,
)
from jatts_tpu.features.extractors import LogMelExtractor
from jatts_tpu.utils.io import read_audio, read_csv, write_csv


def main():
    parser = argparse.ArgumentParser(
        description="Native forced alignment (stage 0, replaces Julius)."
    )
    parser.add_argument("--csv", nargs="+", required=True,
                        help="csvs to align (train+dev+test; rewritten)")
    parser.add_argument("--config", required=True,
                        help="recipe yaml (for the mel/STFT settings)")
    parser.add_argument("--outdir", required=True,
                        help="aligner checkpoint/log directory")
    parser.add_argument("--steps", type=int, default=2000)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--adim", type=int, default=256)
    parser.add_argument("--elayers", type=int, default=2)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out-suffix", default="",
                        help="write <csv><suffix> instead of in-place")
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()

    logging.basicConfig(
        force=True,
        level=logging.INFO if args.verbose > 0 else logging.WARNING,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
    )
    with open(args.config) as f:
        config = yaml.load(f, Loader=yaml.SafeLoader)
    sr = int(config["sampling_rate"])
    hop = int(config["hop_size"])
    mel_ex = LogMelExtractor(
        sampling_rate=sr,
        fft_size=config["fft_size"],
        hop_size=hop,
        win_length=config.get("win_length"),
        num_mels=config["num_mels"],
        fmin=config.get("fmin"),
        fmax=config.get("fmax"),
    )

    csvs = []
    for path in args.csv:
        rows, fieldnames = read_csv(path, dict_reader=True)
        csvs.append({"path": path, "rows": rows, "fieldnames": fieldnames})
    vocab = build_vocab([c["rows"] for c in csvs])
    logging.info("vocab: %d tokens (+<sil>)", len(vocab) - 1)

    # ---- corpus -> work items (mel computed once, shared by train + dump)
    items, owners = [], []
    n_skipped = 0
    for ci, c in enumerate(csvs):
        for ri, row in enumerate(c["rows"]):
            wav, _ = read_audio(
                row["wav_path"], sr, row.get("start") or None,
                row.get("end") or None,
            )
            mel = mel_ex(wav)
            it = prepare_item(row, mel, vocab, len(wav), hop)
            if it is None:
                n_skipped += 1
                logging.warning("skipping %s (no phonemes or too short)",
                                row.get("sample_id"))
                continue
            items.append(it)
            owners.append((ci, ri))
    if not items:
        raise SystemExit("no alignable rows found")
    logging.info("prepared %d items (%d skipped)", len(items), n_skipped)
    normalize_mels(items)
    batches = make_batches(items, args.batch_size)
    logging.info("%d padded batches (%d shapes)", len(batches),
                 len({(b["xs"].shape[1], b["ys"].shape[1]) for b in batches}))

    # ---- train (transductive: on the very rows being aligned)
    model = Aligner(
        idim=len(vocab), odim=int(config["num_mels"]), adim=args.adim,
        elayers=args.elayers,
    )
    params = train_aligner(
        model, batches, steps=args.steps, lr=args.lr, seed=args.seed,
    )

    os.makedirs(args.outdir, exist_ok=True)
    from flax import serialization

    with open(os.path.join(args.outdir, "aligner.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(params))
    with open(os.path.join(args.outdir, "aligner.json"), "w") as f:
        json.dump({"vocab": vocab, "adim": args.adim, "elayers": args.elayers,
                   "num_mels": int(config["num_mels"])}, f)

    # ---- Viterbi dump -> csv updates
    durations = dump_durations(model, params, batches, items)
    for it, ds, (ci, ri) in zip(items, durations, owners):
        upd = row_updates_from_durations(it, ds, hop, sr)
        csvs[ci]["rows"][ri].update(upd)

    for c in csvs:
        fieldnames = list(c["fieldnames"])
        for col in ("start", "end", "durations"):
            if col not in fieldnames:
                fieldnames.append(col)
        out = c["path"] + args.out_suffix
        write_csv(c["rows"], out, fieldnames=fieldnames)
        logging.info("wrote %s", out)


if __name__ == "__main__":
    main()
