"""JVS recipe stage-0 on a synthetic corpus layout: multi-speaker walker,
--labdir durations (shared Julius pipeline), and the spkemb-reference
train-slice rule (the reference wav must NOT come from the test split)."""

import os
import subprocess
import sys

import numpy as np

from jatts_tpu.utils.io import read_csv, write_audio

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SR = 24000


def _make_jvs(root, n_spk=2, n_utt=9):
    for s in range(n_spk):
        spk = f"jvs{s + 1:03d}"
        d = os.path.join(root, spk, "parallel100")
        os.makedirs(os.path.join(d, "wav24kHz16bit"), exist_ok=True)
        with open(os.path.join(d, "transcripts_utf8.txt"), "w",
                  encoding="utf-8") as f:
            for u in range(n_utt):
                utt = f"VOICEACTRESS100_{u + 1:03d}"
                f.write(f"{utt}:こんにちは\n")
                wav = 0.1 * np.sin(
                    np.arange(SR // 2) * 2 * np.pi * (120 + 10 * s) / SR
                ).astype(np.float32)
                write_audio(
                    os.path.join(d, "wav24kHz16bit", f"{utt}.wav"), wav, SR
                )


def _make_labs(labdir, rows):
    os.makedirs(labdir, exist_ok=True)
    for r in rows:
        with open(os.path.join(labdir, f"{r}.lab"), "w") as f:
            f.write("0.0000000 0.1000000 silB\n")
            f.write("0.1000000 0.3000000 k\n")
            f.write("0.3000000 0.5000000 silE\n")


def test_jvs_data_prep_with_labdir(tmp_path):
    root = str(tmp_path / "jvs_ver1")
    _make_jvs(root)
    labdir = str(tmp_path / "labs")
    labs = [f"jvs{s + 1:03d}_VOICEACTRESS100_{u + 1:03d}"
            for s in range(2) for u in range(9)]
    _make_labs(labdir, labs)
    outdir = str(tmp_path / "data")

    # CPU-forced hygiene for the children: overwrite PYTHONPATH (evicts any
    # TPU-registering sitecustomize) so a future jax import in the data-prep
    # chain can never initialize a TPU backend from inside the test suite
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO

    script = os.path.join(REPO, "egs", "jvs", "tts1", "local", "data_prep.py")
    subprocess.run(
        [sys.executable, script, "--db-root", root, "--outdir", outdir,
         "--labdir", labdir, "--dev-per-spk", "2", "--test-per-spk", "2"],
        check=True, cwd=REPO, env=env,
    )
    train, _ = read_csv(os.path.join(outdir, "train.csv"), dict_reader=True)
    test, _ = read_csv(os.path.join(outdir, "test.csv"), dict_reader=True)
    assert len(train) == 2 * 5 and len(test) == 2 * 2  # 9 - 2 - 2 = 5/spk
    # Julius durations present; silB/silE become the start/end crop
    for r in train:
        assert r["durations"], "no durations despite --labdir"
        assert r["phonemes"] == "k" and r["start"] and r["end"]
    # spkemb reference comes from the TRAIN slice, not the test split
    test_wavs = {r["wav_path"] for r in test}
    train_wavs = {r["wav_path"] for r in train}
    for r in train + test:
        assert r["ref_wav_path"] in train_wavs
        assert r["ref_wav_path"] not in test_wavs

    # the tts2 delegator reaches the same walker (MAS: no labdir)
    out2 = str(tmp_path / "data2")
    script2 = os.path.join(REPO, "egs", "jvs", "tts2", "local", "data_prep.py")
    subprocess.run(
        [sys.executable, script2, "--db-root", root, "--outdir", out2],
        check=True, cwd=REPO, env=env,
    )
    train2, _ = read_csv(os.path.join(out2, "train.csv"), dict_reader=True)
    assert train2 and train2[0]["phonemes"] and "durations" not in train2[0]
