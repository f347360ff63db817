"""Hi-Fi-Captain recipe data-prep E2E: synthetic 48 kHz corpus in the HFC
layout -> tts1 prep (with Julius .lab durations) and tts2 prep (silence trim
+ eval prompts), then stage-1 preprocess on the tts1 csv to check the
frames == sum(durations) contract at hop 512/48k."""

import importlib.util
import os
import sys

import numpy as np

from jatts_tpu.utils.io import read_csv, read_hdf5, write_audio


def _run(main_fn, argv):
    old = sys.argv
    sys.argv = argv
    try:
        main_fn()
    finally:
        sys.argv = old

SR, HOP = 48000, 512


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_script(path):
    # REPO-absolute so the test works from any pytest cwd
    spec = importlib.util.spec_from_file_location(
        os.path.basename(path).replace(".py", "_mod"), os.path.join(REPO, path)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _make_hfc_corpus(root, labdir=None):
    os.makedirs(os.path.join(root, "text"), exist_ok=True)
    rng = np.random.default_rng(0)
    sets = {"train_parallel": 3, "train_non_parallel": 2, "dev": 1, "eval": 1}
    k = 0
    for _set, n in sets.items():
        wavdir = os.path.join(root, "wav", _set)
        os.makedirs(wavdir, exist_ok=True)
        with open(os.path.join(root, "text", f"{_set}.txt"), "w") as f:
            for i in range(n):
                utt = f"UTT_{k:04d}"
                k += 1
                dur_s = float(rng.uniform(0.8, 1.4))
                n_samp = int(dur_s * SR)
                t = np.arange(n_samp) / SR
                wav = (0.3 * np.sin(2 * np.pi * 150 * t)).astype(np.float32)
                write_audio(os.path.join(wavdir, f"{utt}.wav"), wav, SR)
                f.write(f"{utt} ありがとう\n")
                if labdir is not None:
                    # 3-phone alignment with leading/trailing silence
                    os.makedirs(labdir, exist_ok=True)
                    a, b = 0.1, dur_s - 0.1
                    cut = np.sort(rng.uniform(a + 0.05, b - 0.05, 2))
                    with open(os.path.join(labdir, f"{utt}.lab"), "w") as lf:
                        lf.write(f"0.0000 {a:.4f} silB\n")
                        lf.write(f"{a:.4f} {cut[0]:.4f} a\n")
                        lf.write(f"{cut[0]:.4f} {cut[1]:.4f} r\n")
                        lf.write(f"{cut[1]:.4f} {b:.4f} i\n")
                        lf.write(f"{b:.4f} {dur_s:.4f} silE\n")


def test_hfc_tts1_data_prep_with_julius(tmp_path):
    root, labdir, outdir = str(tmp_path / "db"), str(tmp_path / "lab"), str(tmp_path / "data")
    _make_hfc_corpus(root, labdir=labdir)
    mod = _load_script("egs/hificaptain_jp_female/tts1/local/data_prep.py")
    _run(mod.main, ["data_prep", "--db-root", root, "--outdir", outdir,
                    "--labdir", labdir, "--hop-size", str(HOP), "--fs", str(SR)])

    rows, _ = read_csv(os.path.join(outdir, "train.csv"), dict_reader=True)
    assert len(rows) == 5  # parallel + non_parallel merged
    for row in rows:
        assert row["phonemes"] == "a r i"  # from the alignment
        ds = [int(x) for x in row["durations"].split()]
        assert len(ds) == 3 and all(d > 0 for d in ds)
        # frames == floor(crop/hop)+1 contract
        crop = float(row["end"]) - float(row["start"])
        n_samples = int(round(crop * SR))
        assert sum(ds) == n_samples // HOP + 1

    # stage 1 on the julius-cropped rows: mel frames must equal sum(durations)
    from jatts_tpu.bin.preprocess import main as preprocess_main

    conf = str(tmp_path / "conf.yaml")
    with open(conf, "w") as f:
        f.write(
            "sampling_rate: 48000\nfft_size: 2048\nhop_size: 512\n"
            "win_length: null\nnum_mels: 20\nfmin: 0\nfmax: null\n"
            "feat_list: [\"mel\", \"pitch\", \"energy\"]\nout_feat_type: mel\n"
        )
    dump = str(tmp_path / "dump")
    _run(preprocess_main, ["preprocess", "--csv", os.path.join(outdir, "train.csv"),
                           "--config", conf, "--dumpdir", dump])
    rows, _ = read_csv(os.path.join(outdir, "train.csv"), dict_reader=True)
    mel = read_hdf5(os.path.join(dump, rows[0]["sample_id"] + ".h5"), "mel")
    assert mel.shape[0] == sum(int(x) for x in rows[0]["durations"].split())


def test_hfc_tts2_data_prep_trim_and_prompt(tmp_path):
    root, outdir = str(tmp_path / "db"), str(tmp_path / "data")
    _make_hfc_corpus(root)
    mod = _load_script("egs/hificaptain_jp_female/tts2/local/data_prep.py")
    _run(mod.main, ["data_prep", "--db-root", root, "--outdir", outdir,
                    "--sampling-rate", str(SR)])

    train, _ = read_csv(os.path.join(outdir, "train.csv"), dict_reader=True)
    test, _ = read_csv(os.path.join(outdir, "test.csv"), dict_reader=True)
    assert len(train) == 5 and len(test) == 1
    for row in train:
        assert float(row["end"]) > float(row["start"]) >= 0.0
        assert row["phonemes"]
    # eval rows carry a prompt drawn from the training set
    prompt_ids = {r["sample_id"] for r in train}
    assert test[0]["prompt_sample_id"] in prompt_ids
    assert test[0]["prompt_wav_path"]
