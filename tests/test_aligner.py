"""Native forced aligner (jatts_tpu/aligner.py + bin/align.py) — the
in-framework replacement for the reference's external Julius sub-pipeline
(reference utils/run_julius.sh:29-39, utils/data_prep_post_julius.py).

Forced alignment is transductive (train on the corpus being aligned), so the
tests train tiny aligners to convergence on synthetic corpora with KNOWN
alignments and check the recovered durations."""

import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

from jatts_tpu.aligner import (
    Aligner,
    dump_durations,
    make_batches,
    normalize_mels,
    row_updates_from_durations,
    train_aligner,
)
from jatts_tpu.utils.io import read_csv, write_audio

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SR, HOP = 24000, 300


def _synthetic_items(rng, n_utts=12, n_vocab=6, odim=20):
    """Utterances whose mel is a per-token signature + noise; truth known."""
    sigs = rng.normal(size=(n_vocab + 1, odim)).astype(np.float32) * 3.0
    items, truths = [], []
    for _ in range(n_utts):
        n_ph = int(rng.integers(4, 9))
        toks = rng.integers(1, n_vocab + 1, n_ph).astype(np.int32)
        durs = rng.integers(4, 13, n_ph)
        mel = np.concatenate(
            [np.tile(sigs[t], (d, 1)) for t, d in zip(toks, durs)]
        ) + 0.3 * rng.normal(size=(int(durs.sum()), odim)).astype(np.float32)
        items.append({
            "row": {}, "tokens": toks, "mel": mel.astype(np.float32),
            "n_frames": int(durs.sum()), "n_samples": int(durs.sum()) * HOP,
            "edge_sil": False,
        })
        truths.append(durs)
    return items, truths


def _frame_accuracy(ds, durs):
    """Fraction of frames assigned to the correct token index."""
    pred = np.repeat(np.arange(len(ds)), ds.astype(int))
    true = np.repeat(np.arange(len(durs)), durs.astype(int))
    n = min(len(pred), len(true))
    return float(np.mean(pred[:n] == true[:n]))


def test_aligner_recovers_synthetic_alignment():
    rng = np.random.default_rng(0)
    items, truths = _synthetic_items(rng)
    normalize_mels(items)
    batches = make_batches(items, batch_size=4, tok_mult=4, frame_mult=16)
    model = Aligner(idim=7, odim=20, adim=32, elayers=1)
    params = train_aligner(model, batches, steps=300, lr=2e-3, log_every=0)
    durations = dump_durations(model, params, batches, items)
    accs = []
    for it, ds, durs in zip(items, durations, truths):
        assert int(ds.sum()) == it["n_frames"]  # MAS path covers every frame
        assert (ds >= 1).all()                  # every token visited
        accs.append(_frame_accuracy(ds, durs))
    assert float(np.mean(accs)) > 0.75, accs


def test_row_updates_edge_silence_invariant():
    """Edge-sil frames become start/end; inner durations sum to the cropped
    waveform's expected frame count (what bin/preprocess.py asserts)."""
    from jatts_tpu.utils.io import read_audio

    n = 40 * HOP + 123  # deliberately not hop-aligned
    item = {
        "row": {}, "tokens": np.asarray([0, 3, 4, 0], np.int32),
        "n_frames": 1 + n // HOP, "n_samples": n, "edge_sil": True,
    }
    ds = np.asarray([5, 20, 14, 2], np.int64)  # sums to 41 = 1 + n//HOP
    upd = row_updates_from_durations(item, ds, HOP, SR)
    durs = [int(d) for d in upd["durations"].split()]
    # the crop must reproduce exactly through read_audio's int() truncation
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "x.wav")
        write_audio(p, np.zeros(n, np.float32), SR)
        wav, _ = read_audio(p, SR, upd["start"], upd["end"])
    assert sum(durs) == 1 + len(wav) // HOP
    assert len(durs) == 2  # sil stripped


@pytest.mark.slow
def test_align_cli_e2e(tmp_path):
    """bin/align.py on a tone corpus: csv gains durations + crop, preprocess
    accepts them (its sum-of-durations assert), alignment beats chance."""
    rng = np.random.default_rng(1)
    phones = ["a", "i", "u", "e", "o"]
    freqs = {p: 250.0 * (2.0 ** i) for i, p in enumerate(phones)}  # separable
    rows, truth = [], {}
    wavdir = tmp_path / "wav"
    os.makedirs(wavdir)
    for i in range(8):
        utt = f"U{i:02d}"
        n_ph = int(rng.integers(3, 7))
        ph = list(rng.choice(phones, n_ph))
        durs = rng.integers(6, 14, n_ph)
        sil_n = int(0.06 * SR)
        segs = [np.zeros(sil_n, np.float32)]
        for p, d in zip(ph, durs):
            t = np.arange(d * HOP) / SR
            segs.append(0.4 * np.sin(2 * np.pi * freqs[p] * t).astype(np.float32))
        segs.append(np.zeros(sil_n, np.float32))
        wav = np.concatenate(segs)
        write_audio(str(wavdir / f"{utt}.wav"), wav, SR)
        rows.append({
            "sample_id": utt, "spk": "syn", "wav_path": str(wavdir / f"{utt}.wav"),
            "start": "", "end": "", "original_text": "x",
            "phonemes": " ".join(ph),
        })
        truth[utt] = (ph, durs, sil_n)
    import csv as _csv

    for name, sl in (("train.csv", slice(0, 6)), ("dev.csv", slice(6, 8))):
        with open(tmp_path / name, "w", newline="") as f:
            w = _csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows[sl])
    conf = {"sampling_rate": SR, "fft_size": 2048, "hop_size": HOP,
            "num_mels": 20, "fmin": 80, "fmax": 7600, "feat_list": ["mel"]}
    with open(tmp_path / "conf.yaml", "w") as f:
        yaml.dump(conf, f)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # OVERWRITE: evict any TPU-registering sitecustomize from PYTHONPATH so
    # JAX_PLATFORMS=cpu is effective in the child (see test_run_sh_e2e.py)
    env["PYTHONPATH"] = REPO
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "jatts_tpu", "bin", "align.py"),
         "--csv", str(tmp_path / "train.csv"), str(tmp_path / "dev.csv"),
         "--config", str(tmp_path / "conf.yaml"),
         "--outdir", str(tmp_path / "exp"),
         "--steps", "300", "--batch-size", "4", "--adim", "32",
         "--elayers", "1"],
        capture_output=True, text=True, timeout=900, cwd=str(tmp_path), env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert os.path.exists(tmp_path / "exp" / "aligner.msgpack")

    accs = []
    for name in ("train.csv", "dev.csv"):
        out, _ = read_csv(str(tmp_path / name), dict_reader=True)
        for row in out:
            ph, durs, sil_n = truth[row["sample_id"]]
            got = np.asarray([int(d) for d in row["durations"].split()])
            assert len(got) == len(ph)
            assert (got >= 1).all()
            assert float(row["start"]) >= 0.0
            # crop + durations reproduce preprocess's frame-count contract
            n_crop = int(round((float(row["end"]) - float(row["start"])) * SR))
            assert got.sum() == 1 + n_crop // HOP
            accs.append(_frame_accuracy(got, durs))
    assert float(np.mean(accs)) > 0.5, accs  # chance is ~1/n_ph

    # the stage-1 CLI accepts the aligned csv (its own sum assert passes)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "jatts_tpu", "bin", "preprocess.py"),
         "--csv", str(tmp_path / "train.csv"),
         "--config", str(tmp_path / "conf.yaml"),
         "--dumpdir", str(tmp_path / "dump")],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path), env=env,
    )
    assert proc.returncode == 0, (proc.stderr or proc.stdout)[-4000:]


@pytest.mark.slow
def test_run_sh_native_align_stages_0_1(tmp_path):
    """egs/jsut/tts1/run.sh stage 0-1 WITHOUT --labdir: stage 0b trains the
    native aligner, the aligned csv feeds stage-1 preprocess (its
    sum-of-durations assert is the acceptance check)."""
    import shutil

    from tests.test_run_sh_e2e import TINY_CONF, _make_jsut_corpus

    root = str(tmp_path)
    db_root, _labdir = _make_jsut_corpus(root)
    egs = os.path.join(root, "egs", "jsut", "tts1")
    shutil.copytree(os.path.join(REPO, "egs", "jsut", "tts1"), egs)
    os.symlink(os.path.join(REPO, "jatts_tpu"), os.path.join(root, "jatts_tpu"))
    os.symlink(os.path.join(REPO, "utils"), os.path.join(root, "utils"))
    with open(os.path.join(egs, "conf", "tiny.yaml"), "w") as f:
        yaml.dump(TINY_CONF, f)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO  # OVERWRITE (see test_run_sh_e2e.py)
    proc = subprocess.run(
        ["bash", "run.sh", "--stage", "0", "--stop_stage", "1",
         "--conf", "conf/tiny.yaml", "--db_root", db_root,
         "--align_steps", "60", "--n_dev", "2", "--n_test", "2"],
        cwd=egs, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stdout[-6000:]
    rows, _ = read_csv(os.path.join(egs, "data", "train.csv"), dict_reader=True)
    assert rows and all(r.get("durations") for r in rows)
    assert os.path.exists(os.path.join(egs, "dump", "stats.h5"))
