"""End-to-end recipe test: synthetic corpus -> preprocess -> stats -> tokens
-> train (few steps) -> decode -> evaluate. Mirrors the reference run.sh
stage semantics (SURVEY.md §4)."""

import os
import sys

import numpy as np
import pytest
import yaml

from jatts_tpu.utils.io import read_csv, write_audio, write_csv


SR, HOP = 24000, 300


def _make_corpus(root, n=6):
    os.makedirs(os.path.join(root, "wav"), exist_ok=True)
    rng = np.random.default_rng(0)
    rows = []
    phones = ["a", "i", "u", "e", "o", "k", "s", "t"]
    for i in range(n):
        n_ph = int(rng.integers(4, 8))
        ph = list(rng.choice(phones, n_ph))
        durs = rng.integers(5, 15, n_ph)
        n_frames = int(durs.sum())
        t = np.arange(n_frames * HOP) / SR
        f = 120 + 30 * np.sin(2 * np.pi * 1.3 * t + i)
        wav = (0.3 * np.sin(2 * np.pi * np.cumsum(f) / SR)).astype(np.float32)
        path = os.path.join(root, "wav", f"utt{i}.wav")
        write_audio(path, wav, SR)
        rows.append(
            {
                "sample_id": f"utt{i}",
                "spk": "spk1",
                "wav_path": path,
                "start": "",
                "end": "",
                "original_text": "dummy",
                "phonemes": " ".join(ph),
                "durations": " ".join(str(d) for d in durs),
            }
        )
    csv_path = os.path.join(root, "data.csv")
    write_csv(rows, csv_path)
    return csv_path


def _run(module_main, argv):
    old = sys.argv
    sys.argv = argv
    try:
        module_main()
    finally:
        sys.argv = old


@pytest.mark.slow
def test_full_recipe(tmp_path):
    root = str(tmp_path)
    csv_path = _make_corpus(root)

    config = {
        "sampling_rate": SR,
        "fft_size": 2048,
        "hop_size": HOP,
        "win_length": None,
        "num_mels": 20,
        "fmin": 80,
        "fmax": 7600,
        "feat_list": ["mel", "pitch", "energy"],
        "out_feat_type": "mel",
        "model_type": "FastSpeech2",
        "model_params": {
            "odim": 20, "adim": 16, "aheads": 2, "elayers": 1, "eunits": 32,
            "dlayers": 1, "dunits": 32, "postnet_layers": 2, "postnet_chans": 8,
            "duration_predictor_chans": 8, "pitch_predictor_chans": 8,
            "pitch_predictor_layers": 2, "energy_predictor_chans": 8,
            "conformer_enc_kernel_size": 7, "conformer_dec_kernel_size": 7,
        },
        "trainer_type": "FastSpeech2Trainer",
        "collater_type": "FastSpeech2Collater",
        "criterions": {
            "MelLoss": {"_type": "L1Loss"},
            "DurationPredictorLoss": {},
            "PitchLoss": {},
            "EnergyLoss": {},
        },
        "batch_size": 3,
        "optimizer_type": "Adam",
        "optimizer_params": {"lr": 0.001},
        "grad_norm": 1.0,
        "scheduler": "warmuplr",
        "scheduler_params": {"warmup_steps": 4},
        "train_max_steps": 4,
        "save_interval_steps": 4,
        "eval_interval_steps": 2,
        "log_interval_steps": 2,
        "eval_max_frames": 128,
        "num_save_intermediate_results": 2,
    }
    conf_path = os.path.join(root, "conf.yaml")
    with open(conf_path, "w") as f:
        yaml.dump(config, f)

    # stage 1: preprocess
    from jatts_tpu.bin.preprocess import main as preprocess_main

    dump = os.path.join(root, "dump")
    _run(preprocess_main, [
        "preprocess", "--csv", csv_path, "--config", conf_path,
        "--dumpdir", dump, "--out-csv", csv_path,
    ])
    rows, _ = read_csv(csv_path, dict_reader=True)
    assert all(os.path.exists(r["feat_path"]) for r in rows)

    # stage 1b: stats
    from jatts_tpu.bin.compute_statistics import main as stats_main

    stats = os.path.join(root, "stats.h5")
    _run(stats_main, ["stats", "--csv", csv_path, "--config", conf_path, "--out", stats])
    assert os.path.exists(stats)

    # stage 2: token list
    from jatts_tpu.bin.generate_token_list import main as tokens_main

    tokens = os.path.join(root, "tokens.txt")
    _run(tokens_main, ["tokens", "--csv", csv_path, "--out", tokens])
    assert os.path.exists(tokens)

    # stage 3: train
    from jatts_tpu.bin.tts_train import main as train_main

    expdir = os.path.join(root, "exp")
    _run(train_main, [
        "train", "--train-csv", csv_path, "--dev-csv", csv_path,
        "--stats", stats, "--token-list", tokens, "--config", conf_path,
        "--outdir", expdir,
    ])
    from jatts_tpu.utils.checkpoint import find_latest_checkpoint

    assert find_latest_checkpoint(expdir) is not None
    # intermediate eval artifacts (generated-vs-ref mel plots)
    pred_dirs = [d for d in os.listdir(expdir) if d == "predictions"]
    assert pred_dirs, "no predictions directory from eval hook"
    pngs = []
    for root_, _, files in os.walk(os.path.join(expdir, "predictions")):
        pngs += [f for f in files if f.endswith(".png")]
    assert pngs, "no mel plots saved"

    # stage 4: decode (no vocoder configured -> mel npy outputs)
    from jatts_tpu.bin.tts_decode import main as decode_main

    outdir = os.path.join(root, "decode")
    _run(decode_main, [
        "decode", "--csv", csv_path, "--stats", stats, "--token-list", tokens,
        "--expdir", expdir, "--config", os.path.join(expdir, "config.yml"),
        "--outdir", outdir, "--max-frames", "256", "--batch-size", "3",
    ])
    mels = [f for f in os.listdir(os.path.join(outdir, "wav")) if f.endswith("_mel.npy")]
    assert len(mels) == 6

    # stage 5: evaluate metrics machinery (generated == reference smoke)
    from jatts_tpu.evaluate.dtw_based import calculate_mcd_f0
    from jatts_tpu.utils.io import read_audio

    wav, _ = read_audio(rows[0]["wav_path"], SR)
    m = calculate_mcd_f0(wav, wav, SR)
    assert m["mcd"] < 1e-3 and m["ddur"] == 0.0
